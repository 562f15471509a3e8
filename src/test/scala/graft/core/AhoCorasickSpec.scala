package graft.core

import graft.SparkTestBase
import graft.functions.gf
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class AhoCorasickSpec extends SparkTestBase {
  import spark.implicits._

  private def hits(dict: Seq[String], text: String): Long =
    new AhoCorasick(dict).countText(UTF8String.fromString(text))

  /** Brute-force position count — the oracle semantics. */
  private def brute(dict: Seq[String], text: String): Long = {
    val words = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    dict.map { e =>
      val ws = e.split(" ").toSeq
      (0 to words.length - ws.length)
        .count(i => words.slice(i, i + ws.length) == ws).toLong
    }.sum
  }

  test("hand cases: words, phrases, overlaps, punctuation-tokenized input") {
    val dict = Seq("slow", "fast merge", "table table")
    assert(hits(dict, "slow start slow end") == 2)
    assert(hits(dict, "FAST, merge!") == 1) // tokenization strips punct/case
    // overlapping phrase positions both count
    assert(hits(dict, "table table table") == 2)
    assert(hits(dict, "nothing here") == 0)
    assert(hits(dict, "") == 0)
    // word boundaries: 'slower' does not match entry 'slow'
    assert(hits(dict, "slower fastmerge") == 0)
    // entries sharing suffixes via fail links: "a" inside "b a b"
    assert(hits(Seq("a", "b a"), "b a b a") == 4) // a@2, a@4, "b a"@1, "b a"@3
  }

  test("entry validation: uppercase / punctuation entries rejected") {
    intercept[IllegalArgumentException](new AhoCorasick(Seq("Bad")))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("two  spaces")))
    intercept[IllegalArgumentException](new AhoCorasick(Seq.empty))
  }

  test("differential: automaton ≡ brute-force position count on random word salads") {
    val vocab = Array("a", "ab", "b", "ba", "aa", "slow", "table")
    val dict = Seq("a", "ab b", "table table", "a a a", "ba")
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(30)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      assert(hits(dict, text) == brute(dict, text), s"text='$text'")
    }
  }

  test("column expression under codegen, one pass over the corpus") {
    val df = Seq("slow table table day", "no match", "fast merge fast merge")
      .toDF("text")
    val got = df.select(gf.dict_hits($"text",
      Seq("slow", "table table", "fast merge")).as("h")).as[Long].collect()
    assert(got.toSeq == Seq(2L, 0L, 2L))
  }
}
