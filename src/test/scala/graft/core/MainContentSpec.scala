package graft.core

import graft.SparkTestBase
import graft.functions.gf
import org.apache.spark.sql.functions._

class MainContentSpec extends SparkTestBase {
  import spark.implicits._

  private val page =
    """<html><head><title>T</title><style>p{color:red}</style>
      |<script>var x = 1;</script></head><body>
      |<nav><a href="/a">Home</a> <a href="/b">Products</a> <a href="/c">About</a></nav>
      |<div class="menu"><a href="/1">one link</a> <a href="/2">two link</a>
      |  <a href="/3">three link</a> <a href="/4">four link</a> <a href="/5">five link</a></div>
      |<article>
      |<h1>The actual story headline goes here today</h1>
      |<p>This is the first real paragraph of body content with plenty of
      |words to clear the minimum word threshold easily.</p>
      |<p>And a second substantial paragraph, also long enough to count as
      |content under the density rules, with a single <a href="/ref">reference
      |link</a> inside it that must not disqualify the block.</p>
      |<p>Tiny.</p>
      |</article>
      |<aside>Related: stuff you did not ask for at all</aside>
      |<footer>&copy; 2026 Example Corp — all rights reserved</footer>
      |</body></html>""".stripMargin

  test("keeps body paragraphs, drops nav/footer/aside/link-farm/short blocks") {
    val out = MainContent.extract(page, minWords = 6, maxLinkDensity = 0.33)
    val blocks = out.split("\n").toSeq
    assert(blocks.size == 3, s"got $blocks")
    assert(blocks(0).startsWith("The actual story headline"))
    assert(blocks(1).startsWith("This is the first real paragraph"))
    assert(blocks(2).startsWith("And a second substantial paragraph"))
    assert(!out.contains("Products") && !out.contains("Example Corp") &&
      !out.contains("Related:") && !out.contains("Tiny") &&
      !out.contains("five link"))
  }

  test("link density: a link-farm div outside <nav> is dropped by density, not structure") {
    val farm = """<body><div><a href="/1">aa bb</a> <a href="/2">cc dd</a>
      |<a href="/3">ee ff</a> <a href="/4">gg hh</a></div>
      |<p>plain body prose with eight genuine words here</p></body>""".stripMargin
    val bs = MainContent.blocks(farm, minWords = 4, maxLinkDensity = 0.33)
    val byText = bs.map(b => b.text.take(10) -> b).toMap
    assert(!byText("aa bb cc d").content && byText("aa bb cc d").linkDensity > 0.9)
    assert(byText("plain body").content && byText("plain body").linkDensity == 0.0)
  }

  test("expression parity: binary and string inputs give the core result") {
    val want = MainContent.extract(page, 6, 0.33)
    val df = Seq(page).toDF("html")
      .select(gf.main_content($"html", 6, 0.33).as("s"),
        gf.main_content($"html".cast("binary"), 6, 0.33).as("b"))
    val (s, b) = df.as[(String, String)].head()
    assert(s == want && b == want)
  }

  test("synthetic corpus pages: nav chrome and footer stripped, card text kept") {
    val cfg = graft.synth.SynthConfig(nPages = 50L, nHosts = 3)
    val rows = graft.synth.PageSynth.pages(spark, cfg).toDF()
      .select($"url", gf.main_content($"html", 3, 0.33).as("c"),
        gf.extract_text($"html").as("t"))
      .as[(String, String, String)].collect()
    assert(rows.forall { case (_, c, _) => !c.contains("Example Health") },
      "footer must never survive")
    // content is never longer than the full text, and usually shorter
    assert(rows.forall { case (_, c, t) => c.length <= t.length })
    assert(rows.count { case (_, c, _) => c.nonEmpty } > rows.length / 2,
      "most pages carry some main content")
  }
}
