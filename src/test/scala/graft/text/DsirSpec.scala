package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ann.SemanticDecontaminate

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // driver-side mirror of Dsir.bucket: first 8 md5 hex digits mod B
  private def refBucket(gram: String, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % b
  }

  private def refGrams(text: String): Seq[String] = {
    val w = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    w ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
  }

  test("grams = unigrams + bigrams; bucket matches the md5 reference") {
    val df = Seq((1L, "The cat sat"), (2L, "x"), (3L, "")).toDF("id", "text")
    val got = df.select($"id", Dsir.grams($"text").as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("the", "cat", "sat", "the cat", "cat sat"))
    assert(got(2L) == Seq("x"))
    assert(got(3L).isEmpty)
    val b = df.filter($"id" === 1)
      .select(explode(Dsir.grams($"text")).as("g"))
      .select($"g", Dsir.bucket($"g", 64).as("b"))
      .as[(String, Long)].collect()
    b.foreach { case (g, bk) =>
      assert(bk == refBucket(g, 64) && bk >= 0 && bk < 64, s"gram $g")
    }
  }

  /** Driver-side reference of the whole DSIR weight computation. */
  private def refWeights(raw: Seq[(Long, String)], target: Seq[String],
                         buckets: Int): Map[Long, (Long, Double)] = {
    val rawB = raw.map { case (id, t) =>
      id -> refGrams(t).map(refBucket(_, buckets))
    }
    val rc = rawB.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tc = target.flatMap(refGrams).map(refBucket(_, buckets))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = rc.values.sum.toDouble
    val tt = tc.values.sum.toDouble
    def lam(b: Long): Double =
      math.log((tc.getOrElse(b, 0L) + 1.0) / (tt + buckets)) -
        math.log((rc(b) + 1.0) / (rt + buckets))
    rawB.collect { case (id, bs) if bs.nonEmpty =>
      // group per bucket like the engine (sum of cnt·λ, one term/bucket)
      val perBucket = bs.groupBy(identity).view.mapValues(_.size).toMap
      id -> (bs.size.toLong,
        perBucket.map { case (b, c) => c * lam(b) }.sum)
    }.toMap
  }

  test("importanceWeights matches the driver-side reference and ranks target-like docs first") {
    val targetTexts = Seq(
      "alpha beta gamma delta alpha beta",
      "beta gamma alpha delta beta gamma",
      "gamma alpha beta delta gamma alpha")
    val raw = Seq(
      (1L, "alpha beta gamma delta alpha"), // target-like
      (2L, "zebra quux wombat xylophone zebra quux"), // off-target
      (3L, "beta gamma delta alpha beta"), // target-like
      (4L, "wombat xylophone quux zebra wombat"), // off-target
      (5L, "")) // gram-less: excluded
    val rawDf = raw.toDF("doc_id", "text")
    val targetDf = targetTexts.toDF("text")
    val got = Dsir.importanceWeights(rawDf, "doc_id", "text", targetDf, "text",
        buckets = 128)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = refWeights(raw, targetTexts, 128)
    assert(got.keySet == Set(1L, 2L, 3L, 4L) && want.keySet == got.keySet)
    for (id <- got.keySet) {
      assert(got(id)._1 == want(id)._1, s"n_grams doc $id")
      assert(math.abs(got(id)._2 - want(id)._2) < 1e-9,
        s"logw doc $id: ${got(id)._2} vs ${want(id)._2}")
    }
    // the point of DSIR: target-vocabulary docs outweigh off-target ones
    assert(Seq(1L, 3L).map(got(_)._2).min > Seq(2L, 4L).map(got(_)._2).max)
  }

  test("select is deterministic Gumbel-top-k with id tie-break") {
    val w = (1L to 50L).map(i => (i, 10L, i * 0.001)).toDF("doc_id", "n_grams", "logw")
    val a = Dsir.select(w, "doc_id", 10).select("doc_id", "score")
      .as[(Long, Double)].collect().toSeq
    val b = Dsir.select(w.repartition(7), "doc_id", 10).select("doc_id", "score")
      .as[(Long, Double)].collect().toSeq
    assert(a.size == 10 && a == b) // partitioning-independent
    // score really is logw + gumbel(id), rounded
    val g = w.select($"doc_id", round($"logw" + Dsir.gumbel($"doc_id"), 4).as("s"))
      .as[(Long, Double)].collect().toMap
    a.foreach { case (id, s) => assert(s == g(id)) }
    assert(a.map(_._2).sorted.reverse == a.map(_._2)) // descending
  }

  test("semantic decontamination flags planted copies, spares the rest; empty bench flags nothing") {
    val bench = Seq((100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),   // scaled copy of bench 100 → cos 1
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),   // orthogonal
      (3L, Seq(0.9f, 0.437f, 0.0f, 0.0f)), // cos≈0.899 to bench 100 → below τ
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f))    // zero vector → cos 0
    ).toDF("vec_id", "embedding")
    val flagged = SemanticDecontaminate.contaminated(
        corpus, "vec_id", "embedding", bench, "embedding", 0.95)
      .as[(Long, Double)].collect().toMap
    assert(flagged.keySet == Set(1L) && flagged(1L) == 1.0)
    val clean = SemanticDecontaminate.clean(
        corpus, "vec_id", "embedding", bench, "embedding", 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L, 4L))
    val none = SemanticDecontaminate.contaminated(
      corpus, "vec_id", "embedding", bench.limit(0), "embedding", 0.95)
    assert(none.count() == 0)
  }
}
