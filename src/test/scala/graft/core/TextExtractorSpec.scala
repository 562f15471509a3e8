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
}
