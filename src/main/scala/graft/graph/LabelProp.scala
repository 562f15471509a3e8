package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Synchronous label propagation (Raghavan, Albert & Kumara, Phys.Rev.E
 * '07) — near-linear community detection on the RAW link graph: each
 * round every node adopts the most frequent label among its in-
 * neighbors. Communities emerge without a similarity metric, which is
 * what q104's mirror clusters (CC over content-overlap edges) can't
 * give on link structure alone — the web use is grouping link farms /
 * mutually-promoting site clusters for whole-community demotion.
 *
 * Determinism (the paper's async coin-flips are a non-starter for an
 * oracle-checked engine): SYNCHRONOUS rounds, ties broken by the
 * SMALLEST label, nodes with no in-edges keep their label. The result
 * is then a pure function of (graph, iters), identical in any engine —
 * the price is the textbook bipartite oscillation risk, bounded here
 * by the fixed iteration count (label cascades settle by min-label
 * dominance; the spec pins both clique convergence and a naive-
 * simulation differential).
 *
 * Scale shape: the q76 loop — per round ONE edge⋈label shuffle-hash
 * join + one (dst,label) hash agg + one per-dst argmax agg (max over
 * (count, −label) structs — an aggregation, not a window sort), state
 * re-checkpointed per round. Label state is O(N) (id, long) rows.
 */
object LabelProp {

  /** Labels after `iters` synchronous rounds (init: own id). Returns
    * (idCol, label). */
  def run(nodes: DataFrame, idCol: String,
          edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int = 3,
          checkpointRounds: Boolean = true): DataFrame = {
    def ck(df: DataFrame): DataFrame =
      if (checkpointRounds) df.localCheckpoint(false) else df
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).transform(ck)
    var lab = ids.select(col("id"), col("id").as("lbl")).transform(ck)
    for (_ <- 1 to iters) {
      val best = e
        .join(lab.select(col("id").as("src"), col("lbl").as("l"))
          .hint("shuffle_hash"), "src")
        .groupBy("dst", "l").agg(count(lit(1)).as("c"))
        // argmax by (count, −label): max struct = highest count, then
        // lowest label (ids are doc-scale longs — negation is safe; the
        // ANSI hash-mix rule concerns HASH arithmetic, not small ids)
        .groupBy("dst").agg(max(struct(col("c"), (-col("l")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("__new"))
      lab = ids
        .join(lab.hint("shuffle_hash"), Seq("id"))
        .join(best.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"), coalesce(col("__new"), col("lbl")).as("lbl"))
        .transform(ck)
    }
    lab.select(col("id").as(idCol), col("lbl").as("label"))
  }
}
