package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Crawl-trap detection: find URL TEMPLATES that generate unbounded URL
 * spaces over (nearly) duplicate content — calendar pages, session-id
 * echoes, faceted-search cross products, infinite pagination. The
 * reference caps these blindly with `max_pages_per_site` /
 * `max_depth` (crawl_config.py); at archive scale the budget should
 * instead be withdrawn from the *template* that is provably a trap,
 * not from the whole site.
 *
 * Signal (the shape used by production crawlers): group fetched URLs by
 * (host, template) where template collapses volatile path pieces
 * (digit runs → `{n}`); a template with MANY urls whose bodies hash to
 * FEW distinct fingerprints is a trap — the crawler is paying fetches
 * for content it already has.
 *
 * 100 TB shape: one hash aggregation over (host, template) with two
 * distinct counts (Catalyst plans the multi-distinct via a 2× Expand +
 * partial agg — map-side combine still applies); no joins, no windows.
 * The flagged-template table is tiny (traps are rare) and feeds the
 * frontier as a drop predicate: candidates anti-join it on
 * (host, template) — unhinted, AQE broadcasts it when it fits (the
 * DupClusters rule).
 */
object TrapDetect {

  /** Collapse volatile path pieces: digit runs become `{n}`. Kept
    * RE2-portable and byte-identical to the oracle's regexp_replace. */
  def template(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(url, "[0-9]+", "{n}")

  /**
   * Per-(host, template) trap report over fetched pages.
   *
   * @param pages  columns: url (string), host (string), fingerprint
   *               (any equality-comparable content hash)
   * @param minUrls       only templates with at least this many distinct
   *                      urls can be traps (small templates are noise)
   * @param maxContentRatio  flag when distinct-content/distinct-url ≤ this
   */
  def detect(pages: DataFrame, minUrls: Long = 50L,
      maxContentRatio: Double = 0.3): DataFrame =
    pages
      .select(col("host"), template(col("url")).as("template"),
        col("url"), col("fingerprint"))
      .groupBy("host", "template")
      .agg(count_distinct(col("url")).as("n_urls"),
        count_distinct(col("fingerprint")).as("n_contents"))
      .withColumn("content_ratio",
        round(col("n_contents").cast("double") / col("n_urls"), 6))
      .filter(col("n_urls") >= minUrls &&
        col("content_ratio") <= maxContentRatio)

  /** Drop frontier candidates whose (host, template) is a flagged trap.
    * `traps` is the tiny [[detect]] output — unhinted anti-join, AQE
    * picks broadcast when it fits. */
  def filterTrapped(candidates: DataFrame, traps: DataFrame): DataFrame = {
    val t = traps.select(col("host").as("__trap_host"),
      col("template").as("__trap_tmpl"))
    candidates.join(t,
      candidates("host") === col("__trap_host") &&
        template(candidates("url")) === col("__trap_tmpl"),
      "left_anti")
  }
}
