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

  /**
   * Length-bucketed batch shaping — the padded-batch alternative to
   * concat-and-chunk: docs are grouped into power-of-two length buckets
   * (capped at `maxLen`, the model's context window) and each bucket
   * reports its padding economics. This is how a loader that does NOT
   * pack across document boundaries (SFT, contrastive pairs, rankers)
   * decides its bucket boundaries: `pad_frac` is the fraction of batch
   * tokens that would be padding if every doc in the bucket were padded
   * to the bucket cap.
   *
   * Per doc: eff = min(tokens, maxLen) (longer docs are truncated, and
   * counted in `n_truncated` / `tokens_truncated`); bucket_cap =
   * min(maxLen, 2^ceil(log2(max(eff, 1)))). log2/pow on exact powers of
   * two are exact in IEEE doubles, so the bucket boundary is
   * engine-portable with no epsilon games.
   *
   * Scale shape: a pure scalar projection + ONE hash agg to
   * O(log maxLen) rows. Nothing else moves.
   */
  def lengthBucketStats(docs: DataFrame, idCol: String, textCol: String,
                        maxLen: Int): DataFrame = {
    require(maxLen > 0, s"maxLen=$maxLen must be positive")
    val tokens = TextOps.tokenCountWs(col(textCol)).cast("long")
    val eff = least(tokens, lit(maxLen.toLong))
    val cap = least(lit(maxLen.toLong),
      pow(lit(2.0), ceil(log2(greatest(eff, lit(1L))))).cast("long"))
    docs
      .select(col(idCol), tokens.as("tokens"), eff.as("eff"),
        cap.as("bucket_cap"))
      .groupBy("bucket_cap")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("eff")).as("sum_tokens"),
        sum(col("bucket_cap") - col("eff")).as("sum_pad"),
        count(when(col("tokens") > maxLen, 1)).as("n_truncated"),
        sum(col("tokens") - col("eff")).as("tokens_truncated"))
      .withColumn("pad_frac", round(
        col("sum_pad").cast("double") /
          (col("sum_pad") + col("sum_tokens")).cast("double"), 6))
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
