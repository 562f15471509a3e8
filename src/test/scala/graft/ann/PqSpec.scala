package graft.ann

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Product-quantization properties on a hand-built corpus:
 *  - codebook shape + deterministic training;
 *  - zero quantization error ⇒ ADC distance ≡ exact distance (vectors
 *    that sit exactly on centroid combinations reconstruct losslessly,
 *    so the asymmetric estimate collapses to the true distance);
 *  - full-width candidates + exact re-rank ⇒ recall 1.0 (the re-rank
 *    path is exact; PQ only prunes);
 *  - ADC never *under*-ranks an exact duplicate of the query: the
 *    code-identical row scores the minimal ADC distance.
 */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8
  private val m = 2
  private val k = 4

  // 8 vectors built from 4 distinct subvector patterns per subspace —
  // with k=4 per subspace, Lloyd converges to exactly those patterns
  // (each cell's mean IS the pattern), giving zero quantization error.
  private val pats = Seq(
    Seq(0f, 0f, 0f, 0f), Seq(10f, 0f, 0f, 0f),
    Seq(0f, 10f, 0f, 0f), Seq(0f, 0f, 10f, 0f))
  private val vecs = (0 until 8).map { i =>
    (i.toLong, (pats(i % 4) ++ pats((i / 4) % 4)).toArray)
  }

  private lazy val df = vecs.toDF("vec_id", "embedding")
  private lazy val cb = Pq.train(df, "vec_id", "embedding", dim, m, k, iters = 3)

  test("codebook shape and code range") {
    assert(cb.m == m && cb.k == k && cb.dsub == dim / m)
    val codes = Pq.encode(df, "vec_id", "embedding", cb)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.length == m && cs.forall(c => c >= 0 && c < k)))
  }

  test("zero quantization error: ADC distance == exact squared L2") {
    val q = vecs(3)._2.map(_.toDouble).toSeq
    val lut = Pq.lutFor(q, cb)
    val got = Pq.encode(df, "vec_id", "embedding", cb)
      .select(col("vec_id"), Pq.adcDist(col("codes"), lut).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, v) =>
      val exact = v.map(_.toDouble).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(got(id) - exact) < 1e-9, s"id=$id adc=${got(id)} exact=$exact")
    }
  }

  test("exact duplicate of the query ADC-ranks first; full-width rerank recall = 1") {
    val q = vecs(5)._2.map(_.toDouble).toSeq
    val lut = Pq.lutFor(q, cb)
    val ranked = Pq.encode(df, "vec_id", "embedding", cb)
      .select(col("vec_id"), Pq.adcDist(col("codes"), lut).as("adc"))
      .orderBy(col("adc").asc, col("vec_id").asc).collect()
    assert(ranked.head.getLong(0) == 5L ||
      ranked.head.getDouble(1) == ranked.find(_.getLong(0) == 5L).get.getDouble(1))
    // full-width candidates re-ranked exactly = the brute-force order
    val brute = vecs.map { case (id, v) =>
      (id, v.map(_.toDouble).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(3).map(_._1).toSet
    val rerank = ranked.map(_.getLong(0)).toSeq // all 8 candidates
      .map(id => id -> vecs(id.toInt)._2.map(_.toDouble).zip(q)
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      .sortBy { case (id, d) => (d, id) }.take(3).map(_._1).toSet
    assert(rerank == brute)
  }

  test("training is deterministic") {
    val cb2 = Pq.train(df.repartition(3), "vec_id", "embedding", dim, m, k, iters = 3)
    assert(cb2.cents == cb.cents)
  }
}
