package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Semantic deduplication over an embedding column — SemDeDup (Abbas et
 * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
 * semantic deduplication"): k-means-cluster the embeddings, then inside
 * each cluster drop all but one of every near-duplicate pair
 * (cosine ≥ tau). Pairs are only ever formed WITHIN a cluster, so the
 * all-pairs comparison the naive O(n²) dedup needs becomes k independent
 * O((n/k)²) blocks — the same bucketed shape as the MinHash-LSH and
 * embedding-LSH dedups, with k-means as the bucketer.
 *
 * Keep rule: a vector is dropped iff some LOWER-id vector in its cluster
 * has cosine ≥ tau with it — the deterministic earliest-doc-survives
 * convention every dedup in this repo uses (the paper keeps the member
 * farthest from the centroid; that rule is arbitrary under ties and
 * couples the answer to centroid noise, so we pin ids instead).
 *
 * Skew guard: a degenerate cluster (the whole corpus near one centroid)
 * would go quadratic — clusters are deterministically truncated to
 * `maxClusterSize` rows (min id kept) with the dropped-row count
 * published as an observed metric, the embeddingNearDups pattern.
 */
object SemDedup {

  private val observeId = new java.util.concurrent.atomic.AtomicLong(0L)

  /**
   * Dropped rows: (id, dup_of = smallest dominating lower id,
   * max_cos = the strongest within-cluster duplicate edge). Input is an
   * `ivfAssign`-ed frame (id, vec, centroid).
   */
  def droppedPairs(assigned: DataFrame, idCol: String, vecCol: String,
                   tau: Double, maxClusterSize: Int = 10000): DataFrame = {
    val w = Window.partitionBy("centroid").orderBy(col("id").asc)
    // double-cast + L2 norm are computed ONCE PER ROW here and cross the
    // centroid shuffle as attributes — the O(cluster²) pair stage then
    // pays a single dot-product pass per pair instead of re-running the
    // cast and both norms (5 interpreted array passes) per pair, which
    // dominated the query before (the projection-re-inlining gotcha)
    val capped = assigned
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"), col("centroid"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .withColumn("__rn", row_number().over(w))
      .observe(s"semdedup_clusters_${observeId.incrementAndGet()}",
        sum(when(col("__rn") > maxClusterSize, 1L).otherwise(0L)).as("truncated_rows"))
      .filter(col("__rn") <= maxClusterSize).drop("__rn")
    val a = capped.select(col("centroid"), col("id").as("idA"),
      col("v").as("vA"), col("nrm").as("nA"))
    val b = capped.select(col("centroid"), col("id").as("idB"),
      col("v").as("vB"), col("nrm").as("nB"))
    a.join(b, Seq("centroid"))
      .filter(col("idA") < col("idB"))
      // identical float semantics to cosine(): d = nA*nB, dot/d
      .withColumn("cos", when(col("nA") * col("nB") === 0.0, lit(0.0))
        .otherwise(Similarity.dot(col("vA"), col("vB")) / (col("nA") * col("nB"))))
      .filter(col("cos") >= tau)
      .groupBy(col("idB").as("id"))
      .agg(min("idA").as("dup_of"), max("cos").as("max_cos"))
  }

  /** Full pipeline: cluster → assign → within-cluster drop. Returns the
    * dropped rows; survivors = vectors anti-joined on it. */
  def dropped(vectors: DataFrame, idCol: String, vecCol: String,
              k: Int, tau: Double, iters: Int = 2,
              maxClusterSize: Int = 10000): DataFrame = {
    val cents = Similarity.ivfCentroids(vectors, idCol, vecCol, k, iters)
    droppedPairs(Similarity.ivfAssign(vectors, idCol, vecCol, cents),
      idCol, vecCol, tau, maxClusterSize)
  }

  /** Surviving corpus after semantic dedup (same knobs as [[dropped]] so
    * a cap-tuned dropped set always has a matching survivor set). */
  def survivors(vectors: DataFrame, idCol: String, vecCol: String,
                k: Int, tau: Double, iters: Int = 2,
                maxClusterSize: Int = 10000): DataFrame =
    vectors.join(
      dropped(vectors, idCol, vecCol, k, tau, iters, maxClusterSize)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
}
