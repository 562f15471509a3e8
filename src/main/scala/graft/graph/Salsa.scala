package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SALSA (Lempel & Moran, WWW'00 "The stochastic approach for
 * link-structure analysis") — the random-walk cousin of HITS that
 * production recommenders actually run (it is the core of Twitter's
 * who-to-follow GraphJet ranking): authority scores are the stationary
 * distribution of a BACK-then-FORWARD walk on the bipartite hub/
 * authority support, which normalizes away the tightly-knit-community
 * (TKC) inflation HITS suffers.
 *
 * Authority step (one iteration, two half-joins):
 *   s(i)    = Σ_{i→j} a(j)/indeg(j)     — walk BACK from authority j
 *                                          to a uniform in-link hub
 *   a'(k)   = Σ_{i→k} s(i)/outdeg(i)    — walk FORWARD to a uniform
 *                                          out-link authority
 * The hub walk mirrors it (forward then back). Both transitions are
 * stochastic, so total mass is EXACTLY conserved: a walk at authority
 * j (a(j) > 0 ⇒ indeg(j) ≥ 1) always finds a hub i, and i always has
 * the out-edge i→j to leave by — no dangling leak, Σa = Σh = 1 at
 * every iteration up to float drift (the caller can assert it; the
 * driver query does).
 *
 * Scale shape: q76/q103's loop — each half-step is ONE edge⋈score
 * shuffle-hash equi-join + ONE hash agg; degrees are joined once from
 * a precomputed table; state is O(N) rows, re-checkpointed per
 * iteration. No normalization pass is needed (unlike HITS' L2 step)
 * because the walk is stochastic by construction.
 */
object Salsa {

  /**
   * `iters` synchronous iterations of both walks from the uniform
   * start over each walk's support. Returns (idCol, authority, hub)
   * for every node (0.0 off-support).
   */
  def run(nodes: DataFrame, idCol: String,
          edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int = 4, checkpointRounds: Boolean = true): DataFrame = {
    def ck(df: DataFrame): DataFrame =
      if (checkpointRounds) df.localCheckpoint(false) else df
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().transform(ck)
    val ind = e.groupBy("dst").agg(count(lit(1)).cast("double").as("__ind"))
      .transform(ck)
    val outd = e.groupBy("src").agg(count(lit(1)).cast("double").as("__outd"))
      .transform(ck)

    // uniform starts over each walk's support (kept in-plan, 1-row aggs)
    val nAuth = broadcast(ind.agg(count(lit(1)).cast("double").as("__n")))
    val nHub = broadcast(outd.agg(count(lit(1)).cast("double").as("__n")))
    var auth = ind.crossJoin(nAuth)
      .select(col("dst").as("id"), (lit(1.0) / col("__n")).as("v"))
      .transform(ck)
    var hub = outd.crossJoin(nHub)
      .select(col("src").as("id"), (lit(1.0) / col("__n")).as("v"))
      .transform(ck)

    for (_ <- 1 to iters) {
      // authority walk: back over in-links, forward over out-links
      val s = e
        .join(auth.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst")
        .join(ind.hint("shuffle_hash"), "dst")
        .groupBy("src").agg(sum(col("v") / col("__ind")).as("v"))
      auth = s
        .join(e.hint("shuffle_hash"), "src")
        .join(outd.hint("shuffle_hash"), "src")
        .groupBy("dst").agg(sum(col("v") / col("__outd")).as("v"))
        .withColumnRenamed("dst", "id")
        .transform(ck)
      // hub walk: forward over out-links, back over in-links
      val t = e
        .join(hub.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
        .join(outd.hint("shuffle_hash"), "src")
        .groupBy("dst").agg(sum(col("v") / col("__outd")).as("v"))
      hub = t
        .join(e.hint("shuffle_hash"), "dst")
        .join(ind.hint("shuffle_hash"), "dst")
        .groupBy("src").agg(sum(col("v") / col("__ind")).as("v"))
        .withColumnRenamed("src", "id")
        .transform(ck)
    }
    ids
      .join(auth.withColumnRenamed("v", "authority").hint("shuffle_hash"),
        Seq("id"), "left")
      .join(hub.withColumnRenamed("v", "hub").hint("shuffle_hash"),
        Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("authority"), lit(0.0)).as("authority"),
        coalesce(col("hub"), lit(0.0)).as("hub"))
  }
}
