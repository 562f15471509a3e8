package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PageRank power iteration over a directed link graph — the classic
 * link-analysis signal a crawl frontier uses to prioritize fetches
 * beyond per-URL heuristics (OPIC/PageRank-ordered crawling; Cho,
 * Garcia-Molina & Page 1998). The reference's `url_scorer.py:44-101`
 * scores each URL in isolation; at web scale the missing ingredient is
 * exactly the global link-graph signal this computes.
 *
 * Semantics (standard): with damping d over node set V (|V| = N),
 *
 *   r₀(v)    = 1/N
 *   rₜ₊₁(v) = (1−d)/N + d·( Σ_{u→v} rₜ(u)/outdeg(u)  +  Dₜ/N )
 *
 * where Dₜ = Σ over dangling nodes (outdeg 0) of rₜ(u) — the dangling
 * mass is redistributed uniformly, so Σ r = 1 is invariant at every
 * iteration (the spec asserts it).
 *
 * Scale shape: edges carry only (long, long); out-degrees are joined
 * onto the edge list ONCE before the loop (`localCheckpoint` — the
 * repo's round-loop pattern, so each iteration's lineage starts at the
 * checkpointed contributions skeleton). Each iteration is one
 * edge⋈rank equi-join on src + one hash agg on dst + one 1-row
 * dangling-mass agg crossJoined back (never collected to the driver).
 * Rank state is O(N) rows of (long, double) and is re-checkpointed per
 * iteration. Multiplying a 10^10-node graph through this loop is the
 * textbook Spark shape: every shuffle is on a 64-bit id, no driver
 * state, no collect.
 */
object PageRank {

  /**
   * Ranks after `iters` power iterations. `nodes` must contain every
   * vertex exactly once in column `idCol`; `edges` is the directed edge
   * list (srcCol, dstCol) — multi-edges count multiply, self-loops are
   * legal. Returns (idCol, pagerank) with pagerank UNROUNDED (callers
   * round for cross-engine comparison).
   */
  def run(nodes: DataFrame, idCol: String,
          edges: DataFrame, srcCol: String, dstCol: String,
          damping: Double = 0.85, iters: Int = 5,
          checkpointRounds: Boolean = true): DataFrame = {
    // checkpointRounds=false is for PlanAudit only: it leaves the full
    // per-iteration lineage visible to explain() (checkpointed plans
    // collapse to RDD scans); real runs always truncate per round.
    def ck(df: DataFrame): DataFrame =
      if (checkpointRounds) df.localCheckpoint(false) else df
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // N is a 1-row aggregate kept in-plan via crossJoin(broadcast) — not
    // a driver collect, so the node count never leaves the executors.
    val nRow = broadcast(ids.agg(count(lit(1)).cast("double").as("__n")))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("__deg"))
    // per-edge contribution skeleton: (src, dst, 1/outdeg) — computed once
    val contrib = e.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("__deg")).as("__w"))
      .transform(ck)
    // nodes with no out-edges (their whole rank is dangling mass)
    val dangling = ids.join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
      .transform(ck)

    var ranks = ids.crossJoin(nRow)
      .select(col("id"), (lit(1.0) / col("__n")).as("r"))
      .transform(ck)
    for (_ <- 1 to iters) {
      val dMass = broadcast(
        dangling.join(ranks, "id")
          .agg(coalesce(sum("r"), lit(0.0)).as("__dm")))
      val inbound = contrib
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(sum(col("r") * col("__w")).as("__in"))
        .withColumnRenamed("dst", "id")
      // shuffle-hash, not sort-merge: both sides are O(N) keyed by a
      // random 64-bit id — sorting buys nothing (the J7 convention)
      ranks = ids
        .join(inbound.hint("shuffle_hash"), Seq("id"), "left")
        .crossJoin(nRow).crossJoin(dMass)
        .select(col("id"),
          ((lit(1.0) - damping) / col("__n") +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) +
              col("__dm") / col("__n"))).as("r"))
        .transform(ck)
    }
    ranks.select(col("id").as(idCol), col("r").as("pagerank"))
  }

  /**
   * TrustRank / personalized PageRank (Gyöngyi, Garcia-Molina &
   * Pedersen, VLDB'04): the teleport is a TRUST DISTRIBUTION over a
   * seed set instead of uniform — trust flows out along links from
   * vetted seeds and decays with distance, so link-spam farms that
   * inflate plain PageRank (no path from any seed) score ≈ 0. The
   * crawl-side use is seed-anchored frontier prioritization and spam
   * demotion, the paper's motivating deployment.
   *
   *   t₀(v)    = d(v)
   *   tₜ₊₁(v) = (1−α)·d(v) + α·( Σ_{u→v} tₜ(u)/outdeg(u) + Dₜ·d(v) )
   *
   * where d is the normalized teleport vector (Σd = 1) and Dₜ the
   * dangling mass — redistributed BY d (the personalized convention:
   * a random surfer who falls off a dangling page restarts at a seed),
   * so Σt = 1 is invariant at every iteration (spec-asserted). With
   * uniform d = 1/N this reduces EXACTLY to [[run]] — the spec proves
   * the two code paths agree to the last ulp.
   *
   * Same scale shape as [[run]]: the teleport vector is O(N) rows
   * joined once into the node spine (never collected/broadcast as a
   * whole — seeds can number millions at web scale); each iteration is
   * one edge⋈rank shuffle-hash join + hash agg + 1-row dangling agg.
   *
   * `teleport`: (idCol, wCol) rows for nodes with NON-ZERO teleport
   * weight (missing ids ⇒ 0); caller guarantees Σw = 1.
   */
  def runPersonalized(nodes: DataFrame, idCol: String,
                      edges: DataFrame, srcCol: String, dstCol: String,
                      teleport: DataFrame, wCol: String,
                      damping: Double = 0.85, iters: Int = 5,
                      checkpointRounds: Boolean = true): DataFrame = {
    def ck(df: DataFrame): DataFrame =
      if (checkpointRounds) df.localCheckpoint(false) else df
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("__deg"))
    val contrib = e.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("__deg")).as("__w"))
      .transform(ck)
    val dangling = ids.join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
      .transform(ck)
    // node spine with its teleport weight materialized ONCE — every
    // iteration and the init read d from here (the J7 shuffle-hash
    // convention: O(N) random-id keys, sorting buys nothing)
    val spine = ids
      .join(teleport.select(col(idCol).cast("long").as("id"),
        col(wCol).cast("double").as("__d")).hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), coalesce(col("__d"), lit(0.0)).as("__d"))
      .transform(ck)

    var ranks = spine.select(col("id"), col("__d").as("r")).transform(ck)
    for (_ <- 1 to iters) {
      val dMass = broadcast(
        dangling.join(ranks, "id")
          .agg(coalesce(sum("r"), lit(0.0)).as("__dm")))
      val inbound = contrib
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(sum(col("r") * col("__w")).as("__in"))
        .withColumnRenamed("dst", "id")
      ranks = spine
        .join(inbound.hint("shuffle_hash"), Seq("id"), "left")
        .crossJoin(dMass)
        .select(col("id"),
          ((lit(1.0) - damping) * col("__d") +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) +
              col("__dm") * col("__d"))).as("r"))
        .transform(ck)
    }
    ranks.select(col("id").as(idCol), col("r").as("trustrank"))
  }
}
