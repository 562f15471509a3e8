package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Semantic (embedding-space) benchmark decontamination — the companion
 * to the n-gram overlap rule in [[graft.text.Decontaminate]]: flag
 * training documents whose embedding is cosine-≥ τ to ANY evaluation/
 * benchmark embedding. Catches paraphrased and lightly-edited eval
 * leakage that exact n-gram overlap misses (the SemDeDup/Phi-style
 * "embedding decontamination" step).
 *
 * Scale shape: the benchmark side is an eval set — small by definition —
 * so it collapses to ONE row holding the unit-normalized bench matrix,
 * cross-joined broadcast to the corpus scan (the same 1-row-blob shape
 * as `Decontaminate.contaminatedBloom`). The 100-TB corpus is scanned
 * once, never shuffled; each row pays |bench| fused dot-product passes
 * (unit-normalize once per side, so cosine = one `aggregate(zip_with)`
 * per bench vector — the SemDedup norm-precompute lesson). For a bench
 * set too large for one broadcast row, pre-bucket both sides with
 * [[Similarity.lshBucket]] and probe per bucket instead (the
 * [[Similarity.embeddingNearDups]] shape); at eval-set sizes (≤ 10^5
 * vectors ≈ 25 MB at dim 64) the single blob is the faster plan.
 *
 * Verdicts compare the ROUNDED max cosine (4 dp) against τ so the flag
 * can't hang on last-ulp differences between engines (the q54/q60
 * lesson); the per-pair dot is a fixed-order fold both engines evaluate
 * identically.
 */
object SemanticDecontaminate {

  private def unit(v: org.apache.spark.sql.Column) = {
    val d = transform(v, x => x.cast("double"))
    val n = Similarity.norm(d)
    when(n === 0.0, d).otherwise(transform(d, x => x / n))
  }

  /**
   * Corpus rows with max cosine vs the bench set ≥ τ (on the rounded
   * value): (idCol, max_cos). An empty bench set flags nothing.
   */
  def contaminated(corpus: DataFrame, idCol: String, vecCol: String,
                   bench: DataFrame, benchVecCol: String,
                   threshold: Double): DataFrame = {
    val benchBlob = bench
      .select(unit(col(benchVecCol)).as("__bu"))
      .agg(collect_list(col("__bu")).as("__bench")) // max below is order-free
    corpus
      .select(col(idCol), unit(col(vecCol)).as("__u"))
      .crossJoin(broadcast(benchBlob))
      .withColumn("max_cos", round(array_max(
        transform(col("__bench"), b => Similarity.dot(col("__u"), b))), 4))
      .filter(col("max_cos") >= threshold)
      .select(col(idCol), col("max_cos"))
  }

  /** The decontaminated corpus: rows below τ against every bench vector. */
  def clean(corpus: DataFrame, idCol: String, vecCol: String,
            bench: DataFrame, benchVecCol: String,
            threshold: Double): DataFrame =
    corpus.join(
      contaminated(corpus, idCol, vecCol, bench, benchVecCol, threshold)
        .select(idCol),
      Seq(idCol), "left_anti")
}
