package graft.core

import graft.SparkTestBase
import graft.functions.gf
import org.apache.spark.sql.functions._

class MarkdownSpec extends SparkTestBase {
  import spark.implicits._

  test("headings, paragraphs, inline emphasis and links") {
    val html =
      """<html><head><title>T</title><script>var x=1;</script></head><body>
        |<h1>Main &amp; Title</h1>
        |<p>Hello <b>bold</b> and <em>soft</em> text with a
        |   <a href="/next">next page</a> link.</p>
        |<h3>Sub</h3>
        |<p>Inline <code>f(x)</code> call.</p>
        |</body></html>""".stripMargin
    assert(Markdown.render(html) ==
      """# Main & Title
        |
        |Hello **bold** and *soft* text with a [next page](/next) link.
        |
        |### Sub
        |
        |Inline `f(x)` call.""".stripMargin)
  }

  test("lists: unordered, ordered, nested") {
    val html =
      """<body><ul><li>alpha</li><li>beta <b>strong</b></li>
        |<li>gamma<ul><li>inner one</li><li>inner two</li></ul></li></ul>
        |<ol><li>first</li><li>second</li></ol></body>""".stripMargin
    assert(Markdown.render(html) ==
      """- alpha
        |- beta **strong**
        |- gamma
        |  - inner one
        |  - inner two
        |
        |1. first
        |2. second""".stripMargin)
  }

  test("tables render as pipe tables with a header separator") {
    val html =
      """<table><tr><th>Name</th><th>Beds</th></tr>
        |<tr><td>Oak Manor</td><td>120</td></tr>
        |<tr><td>Pine View</td><td>80</td></tr></table>""".stripMargin
    assert(Markdown.render(html) ==
      "| Name | Beds |\n| --- | --- |\n| Oak Manor | 120 |\n| Pine View | 80 |")
  }

  test("blockquote, fenced pre, hr, br, img") {
    val html =
      """<body><blockquote><p>quoted line</p></blockquote>
        |<pre>  raw   spaces
        |kept</pre>
        |<hr>
        |<p>line one<br>line two</p>
        |<p><img src="/i.png" alt="a pic"></p></body>""".stripMargin
    assert(Markdown.render(html) ==
      "> quoted line\n\n```\n  raw   spaces\nkept\n```\n\n---\n\n" +
      "line one\nline two\n\n![a pic](/i.png)")
  }

  test("fit=true drops nav/header/footer/aside/form chrome") {
    val html =
      """<body><nav><a href="/a">Home</a></nav><header>Top</header>
        |<p>Body text stays.</p>
        |<aside>related</aside><footer>(c) corp</footer></body>""".stripMargin
    assert(Markdown.render(html, fit = true) == "Body text stays.")
    val raw = Markdown.render(html)
    assert(raw.contains("[Home](/a)") && raw.contains("Top") &&
      raw.contains("(c) corp"))
  }

  test("anchor without href renders bare text; empty anchor falls back to href") {
    assert(Markdown.render("<p><a>plain</a> and <a href=\"/x\"></a></p>") ==
      "plain and [/x](/x)")
  }

  test("script/style/head never leak; div containers flush paragraphs") {
    val html = "<head><title>T</title></head><div>one<p>two</p>three</div>"
    assert(Markdown.render(html) == "one\n\ntwo\n\nthree")
  }

  test("expression over the synthetic corpus: codegen ≡ interpreted, binary ≡ string") {
    val cfg = graft.synth.SynthConfig(nPages = 64L, nHosts = 3)
    val df = graft.synth.PageSynth.pages(spark, cfg).toDF()
    val viaBinary = df.select($"url",
        gf.html_to_markdown($"html").as("md"),
        gf.html_to_markdown($"html", fit = true).as("fit"))
      .orderBy("url").collect()
    val viaString = df.select($"url",
        gf.html_to_markdown(decode($"html", "UTF-8")).as("md"),
        gf.html_to_markdown(decode($"html", "UTF-8"), fit = true).as("fit"))
      .orderBy("url").collect()
    assert(viaBinary.length == 64)
    assert(viaBinary.toSeq == viaString.toSeq)
    // every page has nav links in raw md but not in fit md
    val r = viaBinary.head
    assert(r.getString(1).contains("](«") || r.getString(1).contains("]("))
    viaBinary.foreach { row =>
      val (md, fit) = (row.getString(1), row.getString(2))
      assert(md.nonEmpty && fit.length <= md.length)
      assert(!md.contains("var tracking")) // script dropped
      assert(!md.toLowerCase.contains("<body>")) // no raw tags survive
    }
    // fit drops the nav chrome: partner links only live in <nav>
    assert(viaBinary.forall(!_.getString(2).contains("[partner]")))
  }
}
