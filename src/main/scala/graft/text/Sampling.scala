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

  /**
   * Temperature-scaled mixture sampling (the XLM-R / mC4 move): sample
   * source s with probability ∝ n_s^alpha, so low-resource sources are
   * up-weighted relative to their natural share (alpha < 1 flattens the
   * distribution; alpha = 1 is proportional; alpha = 0 is uniform across
   * sources). Rates are derived, not hand-picked: with target corpus
   * size `budget` docs, rate_s = min(1, budget·p_s / n_s) where
   * p_s = n_s^alpha / Σ_t n_t^alpha — then the same md5 acceptance
   * filter as [[weightedMix]]. Rates are ROUNDED to 6 dp before the
   * compare so the verdict never hangs on pow/summation last-ulps
   * across engines or partitionings (the q54/q60 lesson). Adds
   * `src_docs` and `rate`.
   *
   * Scale shape: one hash agg to |sources| rows, a 1-row total joined
   * back (crossJoin of a broadcast scalar), and one corpus-side join on
   * the source key — AQE broadcasts the rate table when it fits
   * (sources are domains: usually small, unbounded in principle, so no
   * forced hint). The corpus itself is scanned twice, shuffled never.
   */
  def temperatureMixture(docs: DataFrame, idCol: String, sourceCol: String,
                         alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0, s"alpha=$alpha must be >= 0")
    require(budget > 0, s"budget=$budget must be positive")
    val stats = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("src_docs"))
      .withColumn("__w", pow(col("src_docs").cast("double"), lit(alpha)))
    val total = stats.agg(sum(col("__w")).as("__tot"))
    val rates = stats.crossJoin(broadcast(total))
      .withColumn("rate", round(
        least(lit(1.0),
          lit(budget.toDouble) * col("__w") / col("__tot") /
            col("src_docs").cast("double")), 6))
      .drop("__w", "__tot")
    docs.join(rates, Seq(sourceCol))
      .filter(hashFrac(col(idCol)) < col("rate"))
  }

  /**
   * Source-level quality gate (the RefinedWeb/FineWeb move: judge the
   * HOST, not just the document — a domain whose average page quality is
   * junk is dropped wholesale, catching SEO farms whose individual pages
   * pass per-doc gates). `meanExpr` is the per-source aggregate to gate
   * on (e.g. `round(avg(quality), 4)` — round it so the verdict doesn't
   * hang on last-ulp summation order); docs of sources with
   * meanExpr < minMean are dropped. Adds `src_mean_q` and `src_docs`.
   *
   * Scale shape: the stats side is one hash agg to |sources| rows
   * (hosts ≪ docs) — AQE broadcasts the gate join; the corpus is
   * scanned once per side of the agg/join (twice total), never shuffled
   * on a non-key column.
   */
  def sourceQualityGate(docs: DataFrame, srcCol: String, meanExpr: Column,
                        minMean: Double): DataFrame = {
    val stats = docs.groupBy(col(srcCol))
      .agg(meanExpr.as("src_mean_q"), count(lit(1)).as("src_docs"))
      .filter(col("src_mean_q") >= minMean)
    docs.join(stats, Seq(srcCol))
  }

  /**
   * Deterministic training-order shuffle, sharded: every doc gets a
   * `shard` (md5-hash bucket) and a `pos` (1-based rank inside its shard
   * by (md5(id), id)) — a seed-free pseudo-random permutation of the
   * corpus materialized as `numShards` independently-ordered shards, the
   * form a training loader consumes. Reading shards 0..S-1 sequentially,
   * each in `pos` order, visits the corpus in a fixed hash-shuffled
   * order that no partitioning, append history, or engine can change.
   *
   * Scale shape: ONE hash shuffle on `shard` + a within-shard sort —
   * never a global sort; shards are uniform by construction (md5), so
   * no skew handling is needed. At 100 TB pick numShards ≫ executors so
   * each shard's sort fits in memory.
   */
  def shuffleShard(docs: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards=$numShards must be positive")
    val shard = pmod(
      conv(substring(rankKey(col(idCol)), 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong))
    val w = Window.partitionBy(col("shard"))
      .orderBy(rankKey(col(idCol)).asc, col(idCol).asc)
    docs.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
  }

  /**
   * Deterministic token-budget sampling (per-language corpus budgets):
   * within each stratum, admit docs in (md5(id), id) order until the
   * running token total would exceed `budget` — the largest prefix of
   * the hash-shuffled stratum that fits. Append-stable like every
   * sampler here: earlier-ranked docs' verdicts never change when the
   * corpus grows (a new doc can only push LATER ranks over budget).
   * Adds `tokens_before` (running total excluding the row itself).
   *
   * Scale shape: one window cumsum per stratum (strata are languages —
   * bounded fanout, parallel across strata like [[graft.text.Packing]];
   * no global sort).
   */
  def tokenBudgetSample(docs: DataFrame, idCol: String, strataCol: String,
                        tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(rankKey(col(idCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("tokens_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .filter(col("tokens_before") + col(tokensCol) <= budget)
  }
}
