package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TextExtractorSpec extends AnyFunSuite {
  import TextExtractor.extractText

  test("strips tags, emits newlines at block boundaries") {
    val html = "<html><body><h1>Title</h1><p>Hello <b>world</b>.</p><div>Next</div></body></html>"
    assert(extractText(html) == "Title\nHello world.\nNext")
  }

  test("drops script/style/template wholesale, case-insensitive") {
    val html = "<p>keep</p><SCRIPT>var x = '<p>no</p>';</SCRIPT><style>p{color:red}</style><p>tail</p>"
    assert(extractText(html) == "keep\ntail")
  }

  test("drops comments") {
    assert(extractText("a<!-- <p>gone</p> -->b") == "ab")
  }

  test("decodes entities") {
    assert(extractText("Tom &amp; Jerry &lt;3 &#65;&#x42;&nbsp;end") == "Tom & Jerry <3 AB end")
    assert(extractText("bad &unknown; stays") == "bad &unknown; stays")
  }

  test("whitespace normalization: collapse spaces and newlines, trim") {
    val html = "  <p>a   b\t c</p>\n\n\n<p>   d  </p>  "
    assert(extractText(html) == "a b c\nd")
  }

  test("facility card html round-trips the extractable fields") {
    val html =
      """<div class="facility-card"><h2>Life Care Center of Burlington</h2>
        |<span class="address">601 Cross St., Burlington, KS 66839</span>
        |<a href="tel:6203642117">(620) 364-2117</a></div>""".stripMargin
    val t = extractText(html)
    assert(t == "Life Care Center of Burlington\n601 Cross St., Burlington, KS 66839\n(620) 364-2117")
  }

  test("unterminated constructs do not throw") {
    assert(extractText("<p>open") == "open")
    assert(extractText("<script>never closed") == "")
    assert(extractText("a <!-- never closed") == "a")
    assert(extractText("tail & amp") == "tail & amp")
  }

  test("null-safe and empty") {
    assert(extractText(null) == null)
    assert(extractText("") == "")
  }

  test("deflate_ratio: deterministic, ordered by redundancy, empty → 1.0") {
    import org.apache.spark.unsafe.types.UTF8String
    def r(s: String): Double =
      TextExtractor.deflateRatio(UTF8String.fromString(s))
    val boiler = ("menu home about contact " * 80).trim
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders across a meadow where seventeen geese argue about lunch " +
      "while a tired shepherd counts clouds instead of sheep all afternoon"
    // high-entropy noise: printable-ASCII stream from the hash mixer
    // (hex strings are only 16 symbols and compress BELOW short prose)
    val noise = (0 until 3200).map { i =>
      (33 + math.floorMod(graft.synth.Synth.mix(i.toLong), 94L)).toChar
    }.mkString
    assert(r(boiler) == r(boiler), "must be deterministic")
    assert(r(boiler) < r(prose) && r(prose) < r(noise),
      s"ordering violated: boiler=${r(boiler)} prose=${r(prose)} noise=${r(noise)}")
    assert(r("") == 1.0)
    assert(r(boiler) < 0.2 && r(noise) > 0.5)
  }
}
