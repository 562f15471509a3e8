package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FeedsSpec extends SparkTestBase {
  import spark.implicits._

  private val items = Seq(
    Feeds.FeedItem("https://h.example.com/a", "Plain title", "2026-01-02"),
    Feeds.FeedItem("https://h.example.com/b", "Fish & <chips> meal", "2026-01-03"),
    Feeds.FeedItem("https://h.example.com/c", "line one\nline two", "2026-01-04"))

  test("rss round trip: entity-escaped titles decode back byte-identically") {
    val xml = Feeds.serializeRss("https://h.example.com/feed.xml", items)
    assert(xml.contains("Fish &amp; &lt;chips&gt; meal")) // really escaped
    val out = Feeds.entries(
        Seq(("https://h.example.com/feed.xml", xml)).toDF("feed_url", "xml"))
      .orderBy("entry_url").collect()
    assert(out.length == 3)
    assert(out.forall(_.getString(1) == "rss"))
    assert(out.map(r => (r.getString(2), r.getString(3), r.getString(4))).toSeq ==
      items.map(i => (i.url, i.title, i.published)))
  }

  test("atom round trip: CDATA titles unwrap verbatim, link href parsed") {
    val xml = Feeds.serializeAtom("https://h.example.com/feed.xml", items)
    assert(xml.contains("<![CDATA[Fish & <chips> meal]]>")) // raw inside CDATA
    val out = Feeds.entries(
        Seq(("https://h.example.com/feed.xml", xml)).toDF("feed_url", "xml"))
      .orderBy("entry_url").collect()
    assert(out.forall(_.getString(1) == "atom"))
    assert(out.map(r => (r.getString(2), r.getString(3), r.getString(4))).toSeq ==
      items.map(i => (i.url, i.title, i.published)))
  }

  test("third-party entity forms decode: &quot; &apos; &#34; &#39;") {
    // hand-built RSS (not our serializer): real-world feeds escape
    // quotes too — ADVICE round 3 widened the decoded subset
    val xml =
      """<?xml version="1.0"?><rss><channel>
        |<item><link>https://x.example.com/1</link>
        |<title>He said &quot;hi&quot; &amp; left</title>
        |<pubDate>2026-01-05</pubDate></item>
        |<item><link>https://x.example.com/2</link>
        |<title>it&apos;s &#39;quoted&#39; &#34;twice&#34;</title>
        |<pubDate>2026-01-06</pubDate></item>
        |</channel></rss>""".stripMargin
    val out = Feeds.entries(
        Seq(("https://x.example.com/feed.xml", xml)).toDF("feed_url", "xml"))
      .orderBy("entry_url").collect()
    assert(out(0).getString(3) == "He said \"hi\" & left")
    assert(out(1).getString(3) == "it's 'quoted' \"twice\"")
  }

  test("mixed corpus: format auto-detected per blob; one row per entry") {
    val rss = Feeds.serializeRss("https://r.example.com/feed.xml", items.take(2))
    val atom = Feeds.serializeAtom("https://a.example.com/feed.xml", items.drop(2))
    val out = Feeds.entries(Seq(
        ("https://r.example.com/feed.xml", rss),
        ("https://a.example.com/feed.xml", atom)).toDF("feed_url", "xml"))
      .groupBy("fmt").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("rss" -> 2L, "atom" -> 1L))
  }

  test("synthesize: even srcN -> rss, odd srcN -> atom, items from the grouped rows") {
    val grouped = Seq(
        ("src2", Seq(Feeds.FeedItem("https://u/1", "t1", "d1"))),
        ("src3", Seq(Feeds.FeedItem("https://u/2", "t2", "d2"))))
      .toDF("source", "items")
    val feeds = Feeds.synthesize(grouped).orderBy("feed_url").collect()
    assert(feeds.map(_.getString(0)).toSeq == Seq(
      "https://src2.example.com/feed.xml", "https://src3.example.com/feed.xml"))
    assert(feeds(0).getString(1).startsWith("<?xml") &&
      feeds(0).getString(1).contains("<rss"))
    assert(feeds(1).getString(1).contains("<feed xmlns"))
    val parsed = Feeds.entries(Feeds.synthesize(grouped)).orderBy("entry_url").collect()
    assert(parsed.map(r => (r.getString(2), r.getString(3), r.getString(4))).toSeq ==
      Seq(("https://u/1", "t1", "d1"), ("https://u/2", "t2", "d2")))
  }

  test("tolerant parse: malformed item yields empty fields, not a failure") {
    val xml = "<rss><channel><item><title>only a title</title></item></channel></rss>"
    val out = Feeds.entries(Seq(("f", xml)).toDF("feed_url", "xml")).collect()
    assert(out.length == 1)
    assert(out(0).getString(2) == "" && out(0).getString(3) == "only a title" &&
      out(0).getString(4) == "")
  }
}
