package graft

import graft.sources.Sitemap
import org.apache.spark.sql.functions._

class SitemapRecursionSpec extends SparkTestBase {
  import spark.implicits._

  private def urlset(urls: String*): String =
    "<urlset>" + urls.map(u => s"<url><loc>$u</loc></url>").mkString + "</urlset>"
  private def index(sitemaps: String*): String =
    "<sitemapindex>" + sitemaps.map(u => s"<sitemap><loc>$u</loc></sitemap>").mkString + "</sitemapindex>"

  test("two-level tree resolves to page locs; pages at the index level also kept") {
    val entry = Seq(
      ("h1", "https://h1/sitemap.xml", index("https://h1/a.xml", "https://h1/b.xml")),
      ("h2", "https://h2/sitemap.xml", urlset("https://h2/p1", "https://h2/p2"))
    ).toDF("host", "url", "xml")
    val store = Seq(
      ("https://h1/a.xml", urlset("https://h1/p1", "https://h1/p2")),
      ("https://h1/b.xml", urlset("https://h1/p3"))
    ).toDF("url", "xml")
    val got = Sitemap.resolveIndexes(entry, store, maxDepth = 3)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("h1", "https://h1/p1"), ("h1", "https://h1/p2"), ("h1", "https://h1/p3"),
      ("h2", "https://h2/p1"), ("h2", "https://h2/p2")))
  }

  test("cycles are cut and missing children are skipped, not fatal") {
    val entry = Seq(
      ("h", "https://h/root.xml",
        index("https://h/root.xml", "https://h/a.xml", "https://h/gone.xml"))
    ).toDF("host", "url", "xml")
    val store = Seq(
      // a.xml is itself an index pointing BACK at root (cycle) and at a leaf
      ("https://h/a.xml", index("https://h/root.xml", "https://h/leaf.xml")),
      ("https://h/leaf.xml", urlset("https://h/p1"))
      // gone.xml was never fetched
    ).toDF("url", "xml")
    val got = Sitemap.resolveIndexes(entry, store, maxDepth = 5)
      .as[(String, String)].collect().toSet
    assert(got == Set(("h", "https://h/p1")))
  }

  test("depth cap stops descent") {
    val entry = Seq(("h", "https://h/l0.xml", index("https://h/l1.xml")))
      .toDF("host", "url", "xml")
    val store = Seq(
      ("https://h/l1.xml", index("https://h/l2.xml")),
      ("https://h/l2.xml", urlset("https://h/deep"))
    ).toDF("url", "xml")
    assert(Sitemap.resolveIndexes(entry, store, maxDepth = 2).isEmpty)
    assert(Sitemap.resolveIndexes(entry, store, maxDepth = 3)
      .as[(String, String)].collect().toSeq == Seq(("h", "https://h/deep")))
  }
}
