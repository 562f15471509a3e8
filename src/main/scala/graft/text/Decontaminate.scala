package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: drop training documents that share a word
 * n-gram with an evaluation/benchmark set — the GPT-3 appendix-C /
 * Dolma-style overlap rule (13-grams at production scale; n is a
 * parameter because signal at a given corpus size depends on vocabulary).
 *
 * Scale shape: the benchmark side is ALWAYS small relative to the corpus
 * (an eval set, not another corpus), so its distinct gram set is
 * broadcast and the 100-TB training side is a scan + broadcast semi-join
 * probe — the training corpus never shuffles and no gram string leaves
 * its scan task. `array_distinct` before the explode keeps per-doc gram
 * duplicates out of the join, so `n_hits` counts DISTINCT shared grams.
 */
object Decontaminate {

  /** Word n-grams of `textCol`, distinct, as an array column. Docs with
    * fewer than n words yield an empty array. */
  def ngramSet(textCol: Column, n: Int): Column =
    array_distinct(TextOps.wordNgrams(TextOps.words(textCol), n))

  /** Distinct benchmark grams — the (small) broadcast side. */
  def benchGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(ngramSet(col(textCol), n)).as("gram")).distinct()

  /** Training docs sharing ≥1 n-gram with the benchmark:
    * (id, n_hits = distinct shared grams). */
  def contaminated(train: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    train
      .select(col(idCol), explode(ngramSet(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams(bench, benchTextCol, n)), Seq("gram"), "left_semi")
      .groupBy(idCol).agg(count("*").as("n_hits"))

  /** The decontaminated corpus: training docs with zero benchmark overlap. */
  def clean(train: DataFrame, idCol: String, textCol: String,
            bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    train.join(
      contaminated(train, idCol, textCol, bench, benchTextCol, n).select(idCol),
      Seq(idCol), "left_anti")

  /**
   * Graded variant of [[contaminated]]: per-doc overlap FRACTION
   * (distinct shared grams / distinct grams), the Dolma/llm-foundry
   * contamination score — a binary any-overlap rule over-drops long
   * documents that merely quote one benchmark sentence; a threshold on
   * the fraction lets policy distinguish "contains the eval set" from
   * "mentions it". Docs with fewer than n words have no grams and are
   * absent from the output (same contract as [[contaminated]]).
   * `overlap_frac` is rounded to 6 dp (cross-engine double contract).
   *
   * Scale shape: identical to [[contaminated]] — corpus-side scan +
   * broadcast probe of the (always-small) bench gram set, with the
   * semi-join widened to a marker left join so the gram denominator
   * comes from the same single pass. The corpus never shuffles on a
   * gram; the only shuffle is the per-doc count agg on the id.
   */
  def overlapFraction(train: DataFrame, idCol: String, textCol: String,
                      bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    train
      .select(col(idCol), explode(ngramSet(col(textCol), n)).as("gram"))
      .join(
        broadcast(benchGrams(bench, benchTextCol, n)
          .withColumn("__hit", lit(1L))),
        Seq("gram"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("overlap_frac", round(
        col("n_hits").cast("double") / col("n_grams").cast("double"), 6))

  /**
   * Bloom variant of [[contaminated]] for when even the distinct bench
   * gram set is too large to broadcast as strings (a multi-benchmark
   * 13-gram set at production scale): the bench side aggregates into ONE
   * Bloom filter over xxhash64(gram) (~1.2 bytes/gram at 1 % fpp vs tens
   * of string bytes), and the training scan probes the broadcast blob.
   *
   * Error direction is the SAFE one for decontamination: a Bloom false
   * positive can only OVER-flag (a clean doc dropped with probability
   * ≤ fpp per distinct gram) — the result is a superset of the exact
   * [[contaminated]] id set, never a miss (the spec asserts both the
   * superset property and exact equality on a collision-free corpus).
   * `n_hits` counts grams whose probe answered maybe — an upper bound
   * on the exact count.
   */
  def contaminatedBloom(train: DataFrame, idCol: String, textCol: String,
                        bench: DataFrame, benchTextCol: String, n: Int,
                        expectedGrams: Long = 1L << 20,
                        fpp: Double = 0.01): DataFrame = {
    import graft.functions.gf
    val bloom = benchGrams(bench, benchTextCol, n)
      .agg(gf.bloom_agg(xxhash64(col("gram")), expectedGrams, fpp).as("__bloom"))
    train
      .select(col(idCol), explode(ngramSet(col(textCol), n)).as("gram"))
      .crossJoin(broadcast(bloom))
      .filter(gf.might_contain(col("__bloom"), xxhash64(col("gram"))))
      .groupBy(idCol).agg(count("*").as("n_hits"))
  }
}
