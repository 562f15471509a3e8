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

  test("winnowing: substring guarantee, normalization invariance, disjoint texts") {
    val t = 8 + 4 - 1 // guarantee threshold w + k - 1
    val sharedRun = "q9z7x2k8v4w"
    assert(sharedRun.length == t)
    val docs = Seq(
      (1L, s"alpha bravo $sharedRun charlie delta"),
      (2L, s"echo foxtrot golf $sharedRun hotel"),
      (3L, "india juliet kilo lima mike november"),
      (4L, "INDIA,  juliet?? kilo (lima) MIKE november!!")) // 3 reformatted
    val fps = docs.toDF("id", "text")
      .select($"id", NearDup.winnowFingerprints($"text").as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1).intersect(fps(2)).nonEmpty) // >= (w+k-1)-char run detected
    assert(fps(1).intersect(fps(3)).isEmpty)  // no shared 8-char substring
    assert(fps(3) == fps(4))                  // same normalized char stream
    assert(fps(1).toSet.size == fps(1).size && fps(1) == fps(1).sorted)
  }

  test("winnowing: texts shorter than k fingerprint the whole stream") {
    val fps = Seq((1L, "ab!"), (2L, "AB"), (3L, ""))
      .toDF("id", "text")
      .select($"id", NearDup.winnowFingerprints($"text").as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1) == fps(2)) // both normalize to "ab"
    assert(fps(1).length == 1 && fps(3).length == 1)
  }

  test("winnowing kernel == column-expression specification (differential)") {
    // seeded random corpora over mixed alphabets (incl. unicode, empty,
    // shorter-than-k, all-punct) across several (k, w) shapes
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("abc", "abcdefghij0123456789 .,!?", "a b\nc\td",
      "αβγ déjà vu ABC 123", "!!!???...", "")
    val texts = (0 until 60).map { i =>
      val a = alphabets(i % alphabets.length)
      if (a.isEmpty) "" else (0 until rnd.nextInt(300)).map(_ => a(rnd.nextInt(a.length))).mkString
    } ++ Seq("", "x", "ab", "exactly8", "The Quick BROWN fox!! 99")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for ((k, w) <- Seq((8, 4), (5, 3), (2, 1), (4, 9))) {
      val fast = df.select($"id", NearDup.winnowFingerprints($"text", k, w).as("f"))
        .as[(Long, Seq[Long])].collect().toMap
      val spec = df.select($"id", NearDup.winnowFingerprintsCols($"text", k, w).as("f"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(fast == spec, s"k=$k w=$w")
    }
  }

  test("winnowPairs: planted near-dup found; df-cap drops boilerplate-only pairs") {
    val base = randText(7L, 60)
    val nearDup = base + " extra tail words appended"
    val boiler = " copyright acme corp all rights reserved"
    val docs = (1L to 20L).map(i => (i, randText(i * 31, 40) + boiler)) ++
      Seq((100L, base + boiler), (101L, nearDup + boiler))
    val df = docs.toDF("doc_id", "text")
    // low threshold: unrelated docs pair through shared boilerplate grams
    val loose = NearDup.winnowPairs(df, "doc_id", "text", minFrac = 0.1)
      .as[(Long, Long, Long, Double)].collect()
    assert(loose.exists(p => p._1 == 100L && p._2 == 101L && p._4 >= 0.5))
    assert(loose.exists(p => p._1 < 100L && p._2 < 100L)) // boilerplate pairs
    // capping fingerprint document-frequency removes the boilerplate
    // buckets entirely: only the genuine near-dup family remains
    val capped = NearDup.winnowPairs(df, "doc_id", "text", minFrac = 0.1,
        maxDocFreq = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(capped.exists(p => p._1 == 100L && p._2 == 101L))
    assert(capped.forall(p => p._1 >= 100L))
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
