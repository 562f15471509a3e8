package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.dedup.NearDup
import graft.synth.Synth

/** Property-style invariants (seeded enumeration, SURVEY.md §5.4) for the
  * text/chunk/near-dup kernels. */
class TextPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def randText(seed: Long, nWords: Int): String =
    (0 until nWords).map { j =>
      val h = Synth.mix2(seed, j.toLong)
      (0 until 3 + (h & 3).toInt).map(s =>
        ('a' + math.floorMod(h >> (5 * s), 26).toInt).toChar).mkString
    }.mkString(" ")

  test("chunker: chunks cover all tokens in order; sizes bounded; stride respected") {
    val texts = (1L to 30L).map(i => (i, randText(i, 1 + (Synth.mix(i) & 1023).toInt)))
    val df = texts.toDF("id", "text")
    val chunked = Chunker.chunk(df, "text", chunkTokens = 100, overlap = 0.10)
      .select($"id", $"chunk_idx", $"chunk_start", $"chunk_text", $"chunk_tokens")
      .as[(Long, Int, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.foreach { case (id, text) =>
      val words = text.trim.split("\\s+").toSeq
      val chunks = chunked(id)
      assert(chunks.head._3 == 0)
      chunks.foreach { case (_, _, start, ctext, ctok) =>
        assert(ctok <= 100 && ctok >= 1)
        val expect = words.slice(start, start + 100)
        assert(ctext.split(" ").toSeq == expect, s"id=$id start=$start")
      }
      // strides are exactly 90 apart and the last chunk reaches the end
      val starts = chunks.map(_._3).toSeq
      assert(starts == starts.indices.map(_ * 90))
      assert(starts.last + chunks.last._5 == words.length)
    }
  }

  test("jaccard: symmetric, bounded, reflexive") {
    val pairs = (1L to 20L).map(i => (randText(i, 30), randText(i + 100, 30)))
    val df = pairs.toDF("a", "b")
      .select(
        NearDup.jaccard($"a", $"b").as("jab"),
        NearDup.jaccard($"b", $"a").as("jba"),
        NearDup.jaccard($"a", $"a").as("jaa"))
      .as[(Double, Double, Double)].collect()
    df.foreach { case (jab, jba, jaa) =>
      assert(jab == jba)
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jaa == 1.0)
    }
  }

  test("minhash signature: deterministic and length-stable") {
    val df = (1L to 10L).map(i => (i, randText(i, 50))).toDF("id", "text")
    val s1 = df.select($"id", NearDup.minhashSignature($"text", 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val s2 = df.select($"id", NearDup.minhashSignature($"text", 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(s1 == s2)
    assert(s1.values.forall(_.length == 16))
  }

  test("simhash: permuting word order changes hash little; disjoint texts differ") {
    val base = randText(7L, 60)
    val shuffled = base.split(" ").reverse.mkString(" ")
    val other = randText(99L, 60)
    val r = Seq((base, shuffled, other)).toDF("a", "b", "c")
      .select(
        NearDup.hamming64(NearDup.simhash64($"a"), NearDup.simhash64($"b")).as("hPerm"),
        NearDup.hamming64(NearDup.simhash64($"a"), NearDup.simhash64($"c")).as("hDiff"))
      .as[(Int, Int)].head()
    assert(r._1 == 0)      // bag-of-words: order-invariant by construction
    assert(r._2 > 10)      // unrelated vocab → far apart
  }
}
