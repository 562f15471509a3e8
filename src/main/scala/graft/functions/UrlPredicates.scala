package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL classification predicates (SURVEY.md F1/F3/F4/F5, C27) — the
 * reference's link-analysis heuristics as boolean column expressions.
 */
object UrlPredicates {

  /** F1: same-domain filter (healthcare_scraper.py:220-222,
    * navigation.py:375-377): host equality, www-insensitive. */
  def sameDomain(url: Column, domain: Column): Column = {
    val h = regexp_replace(gf.url_host(url), "^www\\.", "")
    val d = regexp_replace(lower(domain), "^www\\.", "")
    h === d
  }

  /** F5: facility-related URL patterns (navigation.py:348-351,
    * config.py:29-34): path mentions a facility-ish section. */
  def isFacilityRelated(url: Column): Column =
    lower(gf.url_path(url)).rlike(
      "/(locations?|facilit(y|ies)|communit(y|ies)|centers?|campus(es)?|" +
      "residences?|senior-living|assisted-living|skilled-nursing|memory-care|" +
      "rehabilitation|properties|our-homes?|find)(/|$)")

  /** F4: facility-*detail* URL: a named item under a facility section
    * (navigation.py:353-368's 7 regex shapes collapsed). */
  def isFacilityDetail(url: Column): Column =
    lower(gf.url_path(url)).rlike(
      "(/locations?|/facilit(y|ies)|/communit(y|ies)|/centers?|/properties|/residences?)/[^/]+/?$")

  /** F3: facility-URL heuristic (healthcare_scraper.py:201-218): keyword
    * membership + exclusion + path-segment indicators. */
  def isFacilityUrl(url: Column): Column = {
    val path = lower(gf.url_path(url))
    val keyword = isFacilityRelated(url)
    val excluded = path.rlike(
      "/(careers?|jobs?|news|blog|about|contact|privacy|terms|search|login)(/|$)")
    val segmentIndicator = exists(split(path, "/"),
      s => s.rlike("^(location|facility|community|center)s?$"))
    (keyword || segmentIndicator) && !excluded
  }

  /** The reference's FACILITY_URL_PATTERNS keyword list
    * (config.py:29-34) — matched against link text and href. */
  val facilityKeywords: Seq[String] = Seq(
    "locations", "facilities", "centers", "communities", "properties",
    "find-a-location", "our-locations", "care-centers", "nursing-homes",
    "assisted-living", "memory-care", "senior-living",
    "directory", "find-care", "location-finder", "facility-locator")

  /** F3 full form (healthcare_scraper.py:187-198): a link is
    * facility-related if a facility keyword appears in its ANCHOR TEXT or
    * the url qualifies by path — the text half needs the multi-column
    * link Generator (gf.extract_links) upstream. */
  def isFacilityLink(url: Column, anchorText: Column): Column = {
    val t = lower(coalesce(anchorText, lit("")))
    facilityKeywords.map(k => t.contains(k)).reduce(_ || _) || isFacilityUrl(url)
  }

  /** C27: address from a Google-Maps-style href's q= parameter
    * (extractors.py:312-321): decode '+' and %20 to spaces. */
  def mapsUrlAddress(href: Column): Column = {
    val q = regexp_extract(href, "[?&]q=([^&#]+)", 1)
    val decoded = trim(regexp_replace(regexp_replace(q, "\\+|%20", " "), "%2C", ","))
    when(decoded === "", lit(null)).otherwise(decoded)
  }
}
