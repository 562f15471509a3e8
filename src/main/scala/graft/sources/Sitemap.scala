package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sitemap / robots.txt parsing (SURVEY.md S4/S5) over raw-document columns
 * — pure regexp + explode, no XML engine needed for the <urlset> /
 * <sitemapindex> fragment shapes the reference consumes
 * (/root/reference/navigation.py:68-135).
 */
object Sitemap {

  /** <loc> entries of a sitemap XML blob → one row per url. Input: rows
    * with (host, xml). */
  def explodeLocs(sitemaps: DataFrame, xmlCol: String = "xml"): DataFrame =
    sitemaps.select(col("*"),
        explode(regexp_extract_all(col(xmlCol), lit("<loc>\\s*([^<\\s]+)\\s*</loc>"), lit(1)))
          .as("loc"))
      .drop(xmlCol)

  /** True when the sitemap blob is an index of further sitemaps. */
  def isSitemapIndex(xml: Column): Column = xml.contains("<sitemapindex")

  /** Classify sitemap urls the way navigation.py:117-131 does: facility
    * detail pages vs listing pages vs other. */
  def classifyLoc(loc: Column): Column =
    when(lower(loc).rlike("(/locations?/|/facilit(y|ies)/|/communit(y|ies)/)[^/]+/?$"), "facility")
      .when(lower(loc).rlike("/(locations?|facilities|communities|directory)/?$"), "listing")
      .otherwise("other")

  /** robots.txt text → (host, disallow array, crawl_delay, sitemaps array).
    * Input rows: (host, robots_txt). Only the directives the crawl uses. */
  def parseRobots(robots: DataFrame, txtCol: String = "robots_txt"): DataFrame = {
    val txt = col(txtCol)
    robots.select(
      col("host"),
      regexp_extract_all(txt, lit("(?i)Disallow:\\s*(\\S+)"), lit(1)).as("disallow"),
      coalesce(
        when(regexp_extract(txt, "(?i)Crawl-delay:\\s*([0-9.]+)", 1) === "", lit(null))
          .otherwise(regexp_extract(txt, "(?i)Crawl-delay:\\s*([0-9.]+)", 1)).cast("double"),
        lit(1.0)).as("crawlDelay"),
      regexp_extract_all(txt, lit("(?i)Sitemap:\\s*(\\S+)"), lit(1)).as("sitemaps"))
  }
}
