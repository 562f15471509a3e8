package graft.text

import graft.SparkTestBase
import graft.synth.Synth
import org.apache.spark.sql.functions._

class QualityLrSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Seq("table", "scan", "join", "row", "batch", "query",
    "data", "spark", "fast", "slow")

  /** deterministic corpus: ~half the docs use `fast` more than `slow`. */
  private def corpus(n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val words = (0 until 40).map { j =>
        vocab(math.floorMod(Synth.mix2(i.toLong, j.toLong), 8).toInt)
      }
      val tilt = if (i % 2 == 0) Seq("fast", "fast", "fast") else Seq("slow", "slow", "slow")
      (i.toLong, (words ++ tilt).mkString(" "))
    }

  /** plain-Scala reference GD: same features, same update rule. */
  private def naiveTrain(docs: Seq[(Long, String)], dim: Int, iters: Int)
      : Array[Double] = {
    def bucket(w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }
    val feats = docs.map { case (_, t) =>
      val ws = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val c = Array.fill(dim)(0.0)
      ws.foreach(w => c(bucket(w)) += 1.0)
      val x = c.map(_ / ws.length) :+ 1.0
      val y = if (ws.count(_ == "fast") > ws.count(_ == "slow")) 1.0 else 0.0
      (x, y)
    }
    var w = Array.fill(dim + 1)(0.0)
    for (_ <- 1 to iters) {
      val g = Array.fill(dim + 1)(0.0)
      feats.foreach { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-x.zip(w).map { case (a, b) => a * b }.sum))
        x.indices.foreach(d => g(d) += (p - y) * x(d))
      }
      w = w.zipWithIndex.map { case (wi, d) => wi - g(d) / feats.length }
    }
    w
  }

  test("train matches a plain-Scala reference to FP-noise precision") {
    val docs = corpus(200)
    val feats = QualityLr.features(docs.toDF("doc_id", "text"), "doc_id", "text", dim = 8)
    val got = QualityLr.train(feats, dim = 8, iters = 5, eta = 1.0)
    val want = naiveTrain(docs, dim = 8, iters = 5)
    got.zip(want).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"weight drift: $a vs $b")
    }
  }

  test("the planted rule is actually learned (train accuracy)") {
    val docs = corpus(300).toDF("doc_id", "text")
    val feats = QualityLr.features(docs, "doc_id", "text", dim = 16)
      .localCheckpoint(false)
    val w = QualityLr.train(feats, dim = 16, iters = 40, eta = 4.0)
    val scored = QualityLr.score(feats, "doc_id", w)
    val acc = scored.agg(avg((col("predicted") === col("label")).cast("double")))
      .as[Double].head()
    assert(acc >= 0.85, s"train accuracy only $acc")
    // and the probabilities separate the classes
    // mean p gap: modest in absolute terms after 40 full-batch rounds
    // (tf features are small), but decisively the right sign/side
    val gap = scored.groupBy("label").agg(avg("p").as("mp"))
      .orderBy("label").as[(Int, Double)].collect()
    assert(gap(1)._2 - gap(0)._2 > 0.05,
      s"class separation too weak: ${gap.toSeq}")
  }
}
