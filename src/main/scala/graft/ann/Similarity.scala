package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.Synth

/**
 * Similarity search over an embedding column (`array<float>`): brute-force
 * cosine top-k as the exact baseline, LSH (random hyperplane) bucketing and
 * IVF (inverted-file) partition pruning as the 100-TB scale paths. Vector
 * math is `zip_with`/`aggregate` — codegen'd Catalyst, no UDFs.
 */
object Similarity {

  /** unique observe names per call — duplicates in one query throw */
  private val observeId = new java.util.concurrent.atomic.AtomicLong(0L)

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, v) => s + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, 0.0).otherwise(dot(a, b) / d)
  }

  /**
   * Brute-force exact cosine top-k of `vectors` vs one query vector
   * (a literal array). One scan + one global top-k (TakeOrderedAndProject
   * — no full sort materializes).
   */
  def topK(vectors: DataFrame, idCol: String, vecCol: String,
           query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    vectors
      .withColumn("cos", cosine(transform(col(vecCol), x => x.cast("double")), q))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic ±1 hyperplane component for (plane p, dim i). */
  private def sgn(p: Int, i: Int): Double =
    if ((Synth.mix2(0x51D00L + p, i.toLong) & 1L) == 0L) 1.0 else -1.0

  /** Hyperplane sign matrix (planes × dim) — the same constants feed
    * [[lshBucket]] and the driver's DuckDB oracle SQL, so the oracle
    * independently recomputes projections/buckets from raw embeddings. */
  def planeSigns(planes: Int, dim: Int): IndexedSeq[IndexedSeq[Double]] =
    (0 until planes).map(p => (0 until dim).map(i => sgn(p, i)))

  /** Random-hyperplane LSH bucket id: `planes` sign bits packed to a long. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, array((0 until dim).map(i => lit(sgn(p, i))): _*),
          (x, s) => x.cast("double") * s),
        lit(0.0d), (a, v) => a + v)
      when(proj > 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /**
   * LSH-bucketed ANN: probe only vectors sharing the query's bucket
   * (plus optionally neighboring buckets via fewer planes). Recall < 1 by
   * construction; the bucket equi-filter prunes the scan to ~n/2^planes.
   */
  def annLsh(vectors: DataFrame, idCol: String, vecCol: String,
             query: Seq[Float], k: Int, planes: Int = 8): DataFrame = {
    val dim = query.length
    val qBucket = {
      // compute the query's bucket driver-side with the same planes
      var b = 0L
      for (p <- 0 until planes) {
        var proj = 0.0
        for (i <- 0 until dim) proj += query(i) * sgn(p, i)
        if (proj > 0.0) b |= (1L << p)
      }
      b
    }
    val q = array(query.map(v => lit(v.toDouble)): _*)
    vectors
      .withColumn("bucket", lshBucket(col(vecCol), planes, dim))
      .filter(col("bucket") === qBucket)
      .withColumn("cos", cosine(transform(col(vecCol), x => x.cast("double")), q))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * IVF index: assign every vector to its nearest centroid (bucketed
   * write at real scale → partition pruning on probe). Centroids are the
   * first `nCentroids` vectors by id — deterministic; k-means iterations
   * would refine but aren't needed to exercise the plumbing.
   */
  /** Driver-side cosine between two dense vectors — the same fold order
    * as the column [[cosine]], so the two are bit-identical (q145's MMR
    * re-rank relies on it). */
  def cosineScalar(a: Seq[Double], b: Seq[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else d / den
  }

  /**
   * IVF centroids: seeded with the first `nCentroids` vectors by id, then
   * refined by `iters` Lloyd (k-means) rounds — each round one distributed
   * assign + one hash aggregate of element-wise sums; only the k centroid
   * vectors ever reach the driver. Deterministic (seed order + exact
   * arithmetic on the same partition-invariant sums).
   */
  def ivfCentroids(vectors: DataFrame, idCol: String, vecCol: String,
                   nCentroids: Int, iters: Int = 2): Seq[(Long, Seq[Double])] = {
    var cents: Seq[(Long, Seq[Double])] =
      vectors.orderBy(col(idCol).asc).limit(nCentroids)
        .select(col(idCol), col(vecCol)).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))).toSeq
    val dim = if (cents.isEmpty) 0 else cents.head._2.length
    for (_ <- 0 until iters) {
      val assigned = assignTo(vectors, vecCol, cents)
      val sums = assigned.groupBy("centroid")
        .agg(count("*").as("n"),
          (0 until dim).map(i =>
            sum(element_at(col(vecCol), i + 1).cast("double")).as(s"c$i")): _*)
        .collect()
      val refined = sums.map { r =>
        val n = r.getLong(1).toDouble
        (r.getLong(0), (0 until dim).map(i => r.getDouble(2 + i) / n): Seq[Double])
      }.toSeq.sortBy(_._1)
      // keep empty clusters' previous centers so k stays fixed
      val byId = refined.toMap
      cents = cents.map { case (cid, v) => (cid, byId.getOrElse(cid, v)) }
    }
    cents
  }

  /** Nearest-centroid assignment against a driver-held centroid list.
    * Ranking: `argmax_c cos(v, c) = argmax_c dot(v, ĉ)` — the row's own
    * norm is a constant positive factor across centroids, so centroids
    * are unit-normalized ONCE driver-side and each candidate costs a
    * single fused array pass (multiply-cast-accumulate), not the 4
    * passes (transform + dot + 2 norms) a full cosine evaluates.
    * Centroids enter the plan as TWO literal array nodes (`typedlit`),
    * not k×dim scalar literals. */
  private def assignTo(vectors: DataFrame, vecCol: String,
                       cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val unit = cents.map { case (_, cv) =>
      val n = math.sqrt(cv.map(x => x * x).sum)
      if (n == 0.0) cv else cv.map(_ / n)
    }
    val cvecs = typedlit(unit)             // array<array<double>>
    val cids = typedlit(cents.map(_._1))   // array<bigint>
    vectors.withColumn("centroid",
      array_max(zip_with(cvecs, cids, (cv, cid) => struct(
        aggregate(zip_with(col(vecCol), cv, (x, c) => x.cast("double") * c),
          lit(0.0d), (s, v) => s + v).as("cos"),
        cid.as("cid")))).getField("cid"))
  }

  /** IVF index: assign every vector to its nearest centroid (bucketed
    * write at real scale → partition pruning on probe). */
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                centroids: Seq[(Long, Seq[Double])]): DataFrame =
    assignTo(vectors, vecCol, centroids)

  /**
   * IVF probe: search only the `nProbe` centroids nearest the query.
   * Probe selection ranks the actual centroid vectors driver-side —
   * deterministic across runs/partitionings (never an arbitrary member
   * row per centroid).
   */
  /** The `nProbe` centroid ids nearest a query (driver-side ranking of
    * the k centroid vectors — deterministic, ties broken on cid). */
  def probeCentroids(query: Seq[Double], centroids: Seq[(Long, Seq[Double])],
                     nProbe: Int): Seq[Long] =
    centroids
      .map { case (cid, cv) => (cid, cosineScalar(query, cv)) }
      .sortBy { case (cid, c) => (-c, cid) }
      .take(nProbe).map(_._1)

  def annIvf(assigned: DataFrame, idCol: String, vecCol: String,
             query: Seq[Float], k: Int, nProbe: Int,
             centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    val qd = query.map(_.toDouble)
    val probeCids = probeCentroids(qd, centroids, nProbe)
    val q = array(qd.map(lit): _*)
    assigned
      .filter(col("centroid").isin(probeCids: _*))
      .withColumn("cos", cosine(transform(col(vecCol), x => x.cast("double")), q))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Persisted IVF index: the [[ivfAssign]] table written
   * parquet-partitioned by centroid (the Iceberg partition-transform
   * stand-in, same pattern as the bucketed page store). A probe's
   * `centroid IN (probeCids)` filter then prunes partitions at planning
   * time — [[annIvf]] over an opened index reads only the nProbe
   * centroid directories of the on-disk corpus, so a 10^10-vector index
   * costs nProbe/k of a scan per query and nothing stays pinned in
   * executor memory.
   */
  def writeIndex(assigned: DataFrame, dir: String): Unit =
    assigned.write.mode("overwrite").partitionBy("centroid").parquet(dir)

  /** Reopen a [[writeIndex]] directory; feed straight to [[annIvf]]. */
  def openIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Embedding-cosine near-dup pairs via LSH buckets (no cross-join).
    * Skew guard: a degenerate bucket (an all-similar corpus slice hashing
    * to one bucket) would go quadratic within the bucket — buckets are
    * deterministically truncated to `maxBucketSize` rows (min id kept)
    * and the dropped-row count is published as the
    * `embedding_neardup_buckets.truncated_rows` observed metric (same
    * pattern as the fuzzy-dedup block cap). */
  def embeddingNearDups(vectors: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 10,
                        dim: Int = 64, maxBucketSize: Int = 10000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("id").asc)
    // cast + norm once per row, crossing the bucket shuffle — the pair
    // stage pays one dot-product pass per pair (see SemDedup.droppedPairs)
    val bucketed = vectors
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
      .withColumn("nrm", norm(col("v")))
      .withColumn("__rn", row_number().over(w))
      .observe(s"embedding_neardup_buckets_${observeId.incrementAndGet()}",
        sum(when(col("__rn") > maxBucketSize, 1L).otherwise(0L)).as("truncated_rows"))
      .filter(col("__rn") <= maxBucketSize).drop("__rn")
    val a = bucketed.select(col("id").as("idA"), col("v").as("vA"),
      col("nrm").as("nA"), col("bucket"))
    val b = bucketed.select(col("id").as("idB"), col("v").as("vB"),
      col("nrm").as("nB"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("idA") < col("idB"))
      .withColumn("cos", when(col("nA") * col("nB") === 0.0, lit(0.0))
        .otherwise(dot(col("vA"), col("vB")) / (col("nA") * col("nB"))))
      .filter(col("cos") >= threshold)
      .select("idA", "idB", "cos").distinct()
  }
}
