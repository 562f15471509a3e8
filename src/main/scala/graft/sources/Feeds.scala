package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * RSS 2.0 / Atom 1.0 feed source (SURVEY.md §2.1 family; reference
 * analog: the sitemap/navigation discovery path in
 * /root/reference/navigation.py:68-135 — feeds are the push-shaped
 * sibling of sitemaps for new-URL discovery, the input every recrawl
 * scheduler polls).
 *
 * Two halves, mirroring [[Warc]]'s source/sink split:
 *
 *  - '''Serializers''' ([[serializeRss]]/[[serializeAtom]], driven by
 *    [[synthesize]]): deterministic real-XML feed construction used as
 *    test/synthesis scaffolding — entity-escaped titles in RSS, CDATA
 *    titles in Atom, so the parser's unescape paths are exercised by
 *    the round trip.
 *  - '''Parser''' ([[entries]]): the actual operator — tolerant,
 *    pure-column (regexp + explode, no XML engine, the [[Sitemap]]
 *    approach) extraction of one row per `<item>`/`<entry>`. Format is
 *    auto-detected per blob. Timestamps are returned verbatim (format
 *    normalization is a downstream concern; real feeds mix RFC-822 and
 *    ISO-8601 anyway).
 *
 * Scale shape: parsing is embarrassingly parallel per feed blob (zero
 * shuffle); discovered entry urls feed the frontier through the same
 * seen anti-join every other discovery source uses. q95 proves the
 * serialize→parse round trip row-exactly against a DuckDB
 * reconstruction from the source table.
 */
object Feeds {

  case class FeedItem(url: String, title: String, published: String)
  case class FeedGroup(source: String, items: Seq[FeedItem])

  /** XML entity escaping — `&` first, then angle brackets. */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def serializeRss(feedUrl: String, items: Seq[FeedItem]): String = {
    val sb = new java.lang.StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<rss version=\"2.0\"><channel>\n")
      .append("<title>").append(escape(feedUrl)).append("</title>")
      .append("<link>").append(feedUrl).append("</link>\n")
    items.foreach { it =>
      sb.append("<item><title>").append(escape(it.title))
        .append("</title><link>").append(it.url)
        .append("</link><pubDate>").append(it.published)
        .append("</pubDate><guid>").append(it.url).append("</guid></item>\n")
    }
    sb.append("</channel></rss>\n").toString
  }

  def serializeAtom(feedUrl: String, items: Seq[FeedItem]): String = {
    val sb = new java.lang.StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<feed xmlns=\"http://www.w3.org/2005/Atom\">\n")
      .append("<title>").append(escape(feedUrl)).append("</title>")
      .append("<id>").append(feedUrl).append("</id>\n")
    items.foreach { it =>
      sb.append("<entry><title><![CDATA[").append(it.title)
        .append("]]></title><link href=\"").append(it.url)
        .append("\"/><id>").append(it.url)
        .append("</id><updated>").append(it.published)
        .append("</updated></entry>\n")
    }
    sb.append("</feed>\n").toString
  }

  /** Rows (source, items: array<struct<url,title,published>>) → one
    * real feed XML blob per source: (feed_url, xml). Even-numbered
    * `srcN` sources serialize as RSS 2.0, odd as Atom 1.0, so one
    * corpus exercises both parse paths. Items must arrive pre-sorted
    * (determinism is the caller's `sort_array`). */
  def synthesize(grouped: DataFrame): DataFrame = {
    val spark = grouped.sparkSession
    import spark.implicits._
    grouped.select(col("source"), col("items")).as[FeedGroup].map { g =>
      val num = g.source.replaceAll("[^0-9]", "").toInt
      val feedUrl = s"https://${g.source}.example.com/feed.xml"
      val xml =
        if (num % 2 == 0) serializeRss(feedUrl, g.items)
        else serializeAtom(feedUrl, g.items)
      (feedUrl, xml)
    }.toDF("feed_url", "xml")
  }

  /** CDATA unwrap + entity decode for a captured `<title>` body —
    * `&amp;` decoded LAST (else `&amp;lt;` over-decodes). Decoded
    * entity subset: the five XML named entities (`&lt; &gt; &quot;
    * &apos; &amp;`) plus the decimal quote forms `&#34;`/`&#39;`.
    * Arbitrary numeric character references pass through verbatim —
    * a documented bound of the tolerant-source contract, not a parse
    * failure. */
  private def decodeTitle(t: org.apache.spark.sql.Column) = {
    val named = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#34;" -> "\"", "&apos;" -> "'", "&#39;" -> "'")
    val unwrapped = when(t.startsWith("<![CDATA[") && t.endsWith("]]>"),
      t.substr(lit(10), length(t) - 12)).otherwise(
      regexp_replace(named.foldLeft(t) { case (e, (from, to)) =>
        regexp_replace(e, from, to)
      }, "&amp;", "&"))
    unwrapped
  }

  /**
   * THE feed operator: rows (feed_url, xml) → one row per feed entry:
   * (feed_url, fmt, entry_url, title, published). RSS `<item>` and Atom
   * `<entry>` blobs are auto-detected; titles are CDATA-unwrapped /
   * entity-decoded; `published` is the verbatim `<pubDate>`/`<updated>`
   * text. Malformed blocks yield empty-string fields rather than
   * failing the scan (tolerant-source contract, like [[Warc]]'s
   * resyncing parser).
   */
  def entries(feeds: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val xml = col(xmlCol)
    val isAtom = xml.contains("<feed")
    val blocks = when(isAtom,
        regexp_extract_all(xml, lit("(?s)<entry>(.*?)</entry>"), lit(1)))
      .otherwise(
        regexp_extract_all(xml, lit("(?s)<item>(.*?)</item>"), lit(1)))
    val e = col("__entry")
    feeds
      .select(col("feed_url"),
        when(isAtom, "atom").otherwise("rss").as("fmt"),
        explode(blocks).as("__entry"))
      .select(col("feed_url"), col("fmt"),
        when(col("fmt") === "atom",
            regexp_extract(e, "<link[^>]*href=\"([^\"]*)\"", 1))
          .otherwise(regexp_extract(e, "(?s)<link>\\s*(.*?)\\s*</link>", 1))
          .as("entry_url"),
        decodeTitle(regexp_extract(e, "(?s)<title>(.*?)</title>", 1)).as("title"),
        when(col("fmt") === "atom",
            regexp_extract(e, "<updated>([^<]*)</updated>", 1))
          .otherwise(regexp_extract(e, "<pubDate>([^<]*)</pubDate>", 1))
          .as("published"))
  }
}
