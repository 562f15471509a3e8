package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.synth.Synth

/**
 * Similarity search over an embedding column (`array<float>`): brute-force
 * cosine top-k as the exact baseline, LSH (random hyperplane) bucketing and
 * IVF (inverted-file) partition pruning as the 100-TB scale paths. Vector
 * math is `zip_with`/`aggregate` — codegen'd Catalyst, no UDFs.
 */
object Similarity {

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
  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
                nCentroids: Int): DataFrame = {
    val cents = vectors.orderBy(col(idCol).asc).limit(nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .collect()
    val centArr = array(cents.map { r =>
      struct(lit(r.getLong(0)).as("cid"),
        array(r.getSeq[Float](1).map(v => lit(v.toDouble)): _*).as("cvec"))
    }.toIndexedSeq: _*)
    vectors.withColumn("centroid",
      array_max(transform(centArr, c => struct(
        cosine(transform(col(vecCol), x => x.cast("double")), c.getField("cvec")).as("cos"),
        c.getField("cid").as("cid")))).getField("cid"))
  }

  /** IVF probe: search only the `nProbe` centroids nearest the query. */
  def annIvf(assigned: DataFrame, idCol: String, vecCol: String,
             query: Seq[Float], k: Int, nProbe: Int = 2): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val probeCids = assigned
      .select(col("centroid"), col(vecCol))
      .dropDuplicates("centroid")
      .withColumn("cos", cosine(transform(col(vecCol), x => x.cast("double")), q))
      .orderBy(col("cos").desc).limit(nProbe)
      .select("centroid").collect().map(_.getLong(0))
    assigned
      .filter(col("centroid").isin(probeCids.toIndexedSeq: _*))
      .withColumn("cos", cosine(transform(col(vecCol), x => x.cast("double")), q))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs via LSH buckets (no cross-join). */
  def embeddingNearDups(vectors: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.95, planes: Int = 10,
                        dim: Int = 64): DataFrame = {
    val bucketed = vectors
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dim))
    val a = bucketed.select(col("id").as("idA"), col("v").as("vA"), col("bucket"))
    val b = bucketed.select(col("id").as("idB"), col("v").as("vB"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("idA") < col("idB"))
      .withColumn("cos", cosine(transform(col("vA"), x => x.cast("double")),
        transform(col("vB"), x => x.cast("double"))))
      .filter(col("cos") >= threshold)
      .select("idA", "idB", "cos").distinct()
  }
}
