package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for mixture control and split assignment — the
 * two sampling shapes a training-data pipeline needs, both seed-stable
 * and engine-portable (ranking key = md5 hex of the id string, which
 * Spark and DuckDB — and anything else — order identically; no RNG, no
 * sampleBy, rerunning on re-partitioned / appended data never reshuffles
 * previously assigned rows).
 *
 *   - [[quotaSample]]: at most `quota` rows per group (domain balancing:
 *     cap each source/host's contribution to the mixture);
 *   - [[hashSplit]]: stable train/val/test assignment by hash bucket
 *     (a doc's split never changes as the corpus grows — the property
 *     random splits lack).
 *
 * Scale: quotaSample is a per-group window rank (salting not needed: the
 * rank is capped at `quota`, and groups are domains — bounded fanout);
 * hashSplit is a pure scalar projection.
 */
object Sampling {

  /** The portable rank key: md5 hex of the id rendered as a string,
    * with the id itself as an unambiguous tie-break. */
  private def rankKey(id: Column): Column = md5(id.cast("string").cast("binary"))

  /**
   * Deterministic quota sample: the `quota` rows of each group with the
   * smallest (md5(id), id) rank. Adds `sample_rank` (1-based within
   * group). Exactly min(quota, |group|) rows survive per group.
   */
  def quotaSample(docs: DataFrame, idCol: String, groupCol: String,
                  quota: Int): DataFrame = {
    require(quota > 0, s"quota=$quota must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(rankKey(col(idCol)).asc, col(idCol).asc)
    docs.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
  }

  /** md5(id)'s first 4 hex digits mapped to [0, 1) — the shared stable
    * acceptance fraction (granularity 1/65536). */
  private def hashFrac(id: Column): Column =
    conv(substring(rankKey(id), 1, 4), 16, 10).cast("long") / 65536.0

  /**
   * Stable split assignment: train / val / test by cumulative fraction
   * of [[hashFrac]]. Adds `split`.
   */
  def hashSplit(docs: DataFrame, idCol: String,
                trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      s"invalid fractions train=$trainFrac val=$valFrac")
    val bucket = hashFrac(col(idCol))
    docs.withColumn("split",
      when(bucket < trainFrac, "train")
        .when(bucket < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /**
   * Deterministic mixture sampling: keep each row with its source's
   * acceptance rate — THE dataset-mixing primitive (sample web at 0.3,
   * books at 1.0, …). A pure scalar filter: row kept iff
   * hashFrac(id) < rate(source); sources absent from `rates` use
   * `defaultRate`. Seed-free and append-stable like every sampler here —
   * a doc's verdict never changes as the corpus grows.
   */
  def weightedMix(docs: DataFrame, idCol: String, sourceCol: String,
                  rates: Map[String, Double],
                  defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1.0),
      "acceptance rates must be in [0, 1]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, r).otherwise(acc)
    }
    docs.filter(hashFrac(col(idCol)) < rate)
  }
}
