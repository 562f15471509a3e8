package graft

import org.apache.spark.sql.functions._
import graft.core.{CssSelector, HtmlDom}
import graft.functions.gf
import graft.synth.{PageSynth, Synth, SynthConfig}

/** Real CSS engine (C25): DOM parse, selector semantics, the Column
  * expressions, and a differential check against the independent
  * html_probe regex cascade on the synth corpus. */
class CssSelectorSpec extends SparkTestBase {

  private val doc = HtmlDom.parse(
    """<!DOCTYPE html><html><head><title>T</title>
      |<style>.x { color: red }</style><script>var a = "<div>";</script></head>
      |<body>
      |<!-- comment <div class="ghost"> -->
      |<div id="main" class="card big">
      |  <h2 itemprop="name">Sunrise &amp; Sons</h2>
      |  <p class="address"><span itemprop="streetAddress">12 Oak St</span>,
      |    <span itemprop="addressLocality">Mobile</span></p>
      |  <ul class="services"><li>nursing<li>rehab</li><li>memory care</li></ul>
      |  <a href="tel:2055551234" class="phone-link">Call (205) 555-1234</a>
      |</div>
      |<div class="card"><h2>Other</h2><img src=x.png><br/>
      |  <table><tr><td>A1</td><td>B1<tr><td>A2</td><td>B2</td></tr></table>
      |</div>
      |</body></html>""".stripMargin)

  private def texts(sel: String): Seq[String] =
    CssSelector.compile(sel).select(doc).map(_.text).toSeq

  test("DOM: sloppy html recovers — implied li/tr/td closes, void and self-closing tags") {
    assert(texts(".services li") == Seq("nursing", "rehab", "memory care"))
    assert(texts("table tr").size == 2) // <tr> implies close of the open row
    assert(texts("td") == Seq("A1", "B1", "A2", "B2"))
    assert(texts("img").size == 1 && texts("br").size == 1) // attached, childless
    assert(texts("script").size == 1 && texts("script").head == "") // raw text skipped
    assert(texts(".ghost").isEmpty) // commented-out markup is not in the DOM
    assert(texts("h2").head == "Sunrise & Sons") // entity decoded
  }

  test("selectors: compounds, attributes, combinators, pseudo-classes, groups") {
    assert(texts("#main").size == 1)
    assert(texts("div.card").size == 2 && texts("div.big").size == 1)
    assert(texts("[itemprop='streetAddress']") == Seq("12 Oak St"))
    assert(texts("[itemprop]").size == 3)
    assert(texts("a[href^='tel:']") == Seq("Call (205) 555-1234"))
    assert(texts("a[href^=tel]").size == 1)          // bare value
    assert(texts("[href$='1234']").size == 1 && texts("[href*='555']").size == 1)
    assert(texts("[class~='big']").size == 1)        // word match
    assert(texts("div h2").size == 2)                // descendant
    assert(texts("div > h2").size == 2 && texts("body > h2").isEmpty) // child
    assert(texts("ul > li:first-child") == Seq("nursing"))
    assert(texts("li:last-child") == Seq("memory care"))
    assert(texts("td:nth-child(2)") == Seq("B1", "B2"))
    assert(texts("li + li") == Seq("rehab", "memory care")) // adjacent sibling
    assert(texts("li ~ li") == Seq("rehab", "memory care")) // general sibling
    assert(texts("h2, .phone-link").size == 3)       // group, document order
    assert(texts("*").size > 10)
    // case rules: tag names case-insensitive (HTML), classes sensitive
    assert(texts("DIV.card").size == 2 && texts(".CARD").isEmpty)
  }

  test("unsupported selector syntax throws at compile, never silently non-matches") {
    intercept[IllegalArgumentException](CssSelector.compile("div:hover"))
    intercept[IllegalArgumentException](CssSelector.compile("td:nth-child(2n+1)"))
    intercept[IllegalArgumentException](CssSelector.compile("[href!='x']"))
    intercept[IllegalArgumentException](CssSelector.compile("  "))
  }

  test("css_select_all / css_extract Column expressions survive codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, """<div class="c"><p>a</p><p>b</p></div><p>top</p>"""),
      (2L, """<div class="c"><span class="z">only</span></div>"""))
      .toDF("id", "html")
    val sel = df.select($"id", gf.css_select_all($"html", ".c p").as("hits"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sel(1L) == Seq("a", "b") && sel(2L) == Seq.empty)
    val ex = df.select($"id",
      gf.css_extract($"html", "div.c", "p", ".z").as("recs"))
      .selectExpr("id", "inline(recs)")
      .as[(Long, Option[String], Option[String])].collect()
    assert(ex.toSet == Set((1L, Some("a"), None), (2L, None, Some("only"))))
  }

  test("differential: css schema extraction ≡ html_probe microdata on the synth corpus") {
    import spark.implicits._
    val cfg = SynthConfig(nPages = 300L, nHosts = 4)
    val pages = PageSynth.pages(spark, cfg).toDF()
    // the reference standard-schema selectors, run by the real engine
    val css = pages.select(col("url"),
      explode(gf.css_extract(col("html").cast("string"),
        ".facility-card",
        "h1, h2, h3, .facility-name",
        "[itemprop='streetAddress']",
        "[itemprop='addressLocality']",
        "[itemprop='addressRegion']",
        "[itemprop='postalCode']",
        ".services li")).as("r"))
      .select(col("url"), col("r.f0").as("name"), col("r.f1").as("street"),
        col("r.f2").as("city"), col("r.f3").as("state"), col("r.f4").as("zip"))
    // independent implementation: the one-pass regex probe
    val probe = pages.select(col("url"), gf.html_probe(col("html")).as("p"))
      .filter(col("p.mdName").isNotNull)
      .select(col("url"), col("p.mdName").as("name"), col("p.mdStreet").as("street"),
        col("p.mdCity").as("city"), col("p.mdState").as("state"),
        col("p.mdZip").as("zip"))
    val cssRows = css.as[(String, String, String, String, String, String)].collect().toSet
    val probeRows = probe.as[(String, String, String, String, String, String)].collect().toSet
    assert(cssRows.nonEmpty && cssRows == probeRows)
    // list-field extraction matches the card's two services
    val svc = pages.limit(50).select(col("url"),
      gf.css_select_all(col("html").cast("string"), ".facility-card .services li").as("s"))
      .filter(size(col("s")) > 0).as[(String, Seq[String])].collect()
    assert(svc.nonEmpty && svc.forall(_._2.length == 2))
  }

  test("css_attr_all: attribute values in document order, missing-attr matches skipped") {
    import spark.implicits._
    val html =
      """<html><head>
        |<link rel="canonical" href="https://h.com/x">
        |<meta property="og:url" content="https://h.com/x">
        |<meta property="og:title" content="T">
        |</head><body>
        |<a href="/one">1</a><a name="no-href">2</a><a href="/two">3</a>
        |<img src="/i1.png"><img alt="no src">
        |</body></html>""".stripMargin
    val df = Seq(html).toDF("html")
    def attrs(sel: String, a: String): Seq[String] =
      df.select(gf.css_attr_all(col("html"), sel, a).as("v"))
        .as[Seq[String]].head()
    assert(attrs("link[rel=canonical]", "href") == Seq("https://h.com/x"))
    assert(attrs("meta[property=\"og:url\"]", "content") == Seq("https://h.com/x"))
    assert(attrs("a", "href") == Seq("/one", "/two")) // no-href anchor skipped
    assert(attrs("img", "src") == Seq("/i1.png"))
    assert(attrs("meta", "content") == Seq("https://h.com/x", "T"))
    // filter pushes through codegen
    val n = Seq(html, "<p>none</p>").toDF("html")
      .filter(size(gf.css_attr_all(col("html"), "a", "href")) > 0).count()
    assert(n == 1)
  }
}
