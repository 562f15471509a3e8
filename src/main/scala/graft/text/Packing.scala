package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing: concatenate documents in a deterministic
 * order and cut the stream every `budget` tokens — the GPT-style
 * concat-and-chunk batch layout (documents cross sequence boundaries;
 * nothing is padded or dropped). Output maps each doc to the sequence
 * its first token lands in plus its offset there, which is all a loader
 * needs to materialize the packed batches.
 *
 * Scale shape: one GLOBAL concat order would be a single-task window —
 * instead docs are split into `numGroups` independent pack groups and
 * each group packs its own token stream in parallel (sequence identity =
 * (group, seq_no)). Real pipelines pack per shard/worker exactly like
 * this; cross-group order is irrelevant to training. Per-group work is
 * one partitioned window cumsum — size `numGroups` ≈ corpus_tokens /
 * (budget · sequences_per_task) so a group's docs fit one task.
 */
object Packing {

  /**
   * Per-doc packing assignment: (…, tokens, pack_group, seq_no, offset).
   *   - tokens     = whitespace token count of the doc;
   *   - pack_group = `groupExpr` (defaults to a hash of the id — pass
   *     `pmod(col(id), n)` or similar when cross-engine portability of
   *     the grouping matters);
   *   - seq_no     = group-local index of the budget-sized sequence the
   *     doc STARTS in (= floor(tokens-before-it / budget));
   *   - offset     = the doc's first-token offset within that sequence.
   */
  def pack(docs: DataFrame, idCol: String, textCol: String, budget: Int,
           numGroups: Int, groupExpr: Option[Column] = None): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(numGroups > 0, s"numGroups=$numGroups must be positive")
    val grp = groupExpr.getOrElse(pmod(xxhash64(col(idCol)), lit(numGroups)))
    val w = Window.partitionBy(col("pack_group")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), TextOps.tokenCountWs(col(textCol)).as("tokens"),
        grp.cast("long").as("pack_group"))
      .withColumn("__before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col(idCol), col("tokens"), col("pack_group"),
        floor(col("__before") / budget).as("seq_no"),
        pmod(col("__before"), lit(budget.toLong)).as("offset"))
  }

  /** Sequence-level summary: (pack_group, seq_no, n_docs_starting) —
    * how many docs begin in each packed sequence. */
  def sequenceStats(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, numGroups: Int,
                    groupExpr: Option[Column] = None): DataFrame =
    pack(docs, idCol, textCol, budget, numGroups, groupExpr)
      .groupBy("pack_group", "seq_no")
      .agg(count(lit(1)).as("n_docs_starting"), sum("tokens").as("tokens_started"))
}
