package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.CrawlConfig
import graft.functions.{gf, UrlScoring}

/**
 * One BFS crawl round as a pure DataFrame→DataFrame computation
 * (reference loop: /root/reference/navigation.py:256-281 — fetch frontier,
 * extract links, next = discovered − visited). Everything is declarative
 * Catalyst; the only shuffles per round are
 *   (a) the salted per-host politeness rank,
 *   (b) the fetch join against the page store,
 *   (c) the seen anti-join.
 */
object CrawlRound {

  /** fetched/deferred split + discovered links + order rows for one round. */
  final case class RoundResult(
      order: DataFrame,        // CrawlOrderRow columns
      fetched: DataFrame,      // budgeted frontier rows joined with page columns
      deferred: DataFrame,     // frontier rows beyond this round's politeness budget
      discovered: DataFrame)   // new frontier candidates (already robots-filtered,
                               // NOT yet deduped against seen)

  /**
   * Two-phase salted per-host politeness rank (SURVEY.md W2 / §4 skew kill):
   * phase 1 ranks within (host, salt) so one hot host spreads over
   * `saltBuckets` tasks; phase 2 re-ranks the ≤ B·S survivors per host.
   * Total order: score desc, canonUrl asc (deterministic under any
   * parallelism — SURVEY.md §7.4 risk 1).
   */
  def politenessRank(frontier: DataFrame, cfg: CrawlConfig): DataFrame = {
    val ord = Seq(col("score").desc, col("canonUrl").asc)
    val salted = Window.partitionBy(col("host"), pmod(col("urlHash"), lit(cfg.saltBuckets)))
      .orderBy(ord: _*)
    val perHost = Window.partitionBy(col("host")).orderBy(ord: _*)
    frontier
      .withColumn("saltRank", row_number().over(salted))
      .filter(col("saltRank") <= cfg.perHostBudget)   // phase 1: local prune
      .drop("saltRank")
      .withColumn("hostRank", row_number().over(perHost)) // phase 2: ≤ B·S rows/host
  }

  /** Frontier columns derived from a canonical url + depth. */
  def frontierCols(canon: Column, depth: Column): Seq[(String, Column)] = {
    val host = gf.url_host(canon)
    val base = concat(lit("https://"), host, lit("/"))
    Seq(
      "canonUrl" -> canon,
      "urlHash" -> xxhash64(canon),
      "host" -> host,
      "depth" -> depth,
      "score" -> UrlScoring.urlScore(canon, base))
  }

  /** Seed urls → round-0 frontier. */
  def seedFrontier(seeds: DataFrame, urlCol: String = "url"): DataFrame = {
    val canon = gf.canonicalize_url(col(urlCol))
    frontierCols(canon, lit(0)).foldLeft(seeds.withColumn("url", col(urlCol)))(
      (df, kv) => df.withColumn(kv._1, kv._2))
      .dropDuplicates("urlHash")
  }

  /**
   * Extract link candidates from fetched pages: href regex → resolve →
   * canonicalize → score; non-web schemes dropped; robots disallow
   * prefixes enforced via broadcast join (SURVEY.md C26/C2/C3/J5).
   */
  def discoverLinks(fetched: DataFrame, robots: DataFrame, cfg: CrawlConfig): DataFrame = {
    val htmlStr = col("html").cast("string")
    val hrefs = fetched
      .filter(col("fetchOk"))
      .select(col("canonUrl").as("baseUrl"), col("depth"),
        explode(regexp_extract_all(htmlStr, lit("href=[\"']([^\"']+)[\"']"), lit(1))).as("href"))
      .filter(!col("href").rlike("^(mailto:|tel:|javascript:)"))
    val canon = gf.canonicalize_url(gf.resolve_url(col("baseUrl"), col("href")))
    val linked = frontierCols(canon, col("depth") + 1)
      .foldLeft(hrefs.withColumn("url", col("href")))(
        (df, kv) => df.withColumn(kv._1, kv._2))
      .filter(col("depth") <= cfg.maxDepth && col("score") >= cfg.minScore)
      .select("url", "canonUrl", "urlHash", "host", "depth", "score")
    // robots: drop urls whose path starts with a disallowed prefix (J5)
    linked.join(broadcast(robots.select(col("host"), col("disallow"))), Seq("host"), "left")
      .filter(col("disallow").isNull ||
        !exists(col("disallow"), d => startswith(gf.url_path(col("canonUrl")), d)))
      .drop("disallow")
  }

  /**
   * Deduplicate frontier candidates by urlHash, keeping min depth and the
   * lexicographically smallest original form — deterministic under any
   * partitioning (never `first()`, SURVEY.md SO3).
   */
  def dedupeCandidates(cands: DataFrame): DataFrame =
    cands.groupBy("urlHash")
      .agg(min("url").as("url"), min("canonUrl").as("canonUrl"),
        min("host").as("host"), min("depth").as("depth"), min("score").as("score"))
      .select("url", "canonUrl", "urlHash", "host", "depth", "score")

  /**
   * Run one round. `pages` must carry (urlHash, url, html, text, lang) with
   * urlHash = xxhash64(canonicalize(url)) precomputed. `ck` materializes
   * shared intermediates (localCheckpoint in the driver loop) so the
   * politeness rank and fetch join are computed exactly once per round —
   * every returned frame derives from a materialized parent.
   */
  def run(round: Int, frontier: DataFrame, pages: DataFrame, robots: DataFrame,
          cfg: CrawlConfig, ck: DataFrame => DataFrame = identity): RoundResult = {
    val ranked = ck(politenessRank(frontier, cfg))
    val budgeted = ranked.filter(col("hostRank") <= cfg.perHostBudget)
    val deferred = ranked.filter(col("hostRank") > cfg.perHostBudget)
      .drop("hostRank")

    // fetch = equi join on the 64-bit identity; shuffle-hash beats
    // sort-merge on hash keys (SURVEY.md J7)
    val fetched = ck(budgeted.join(
        pages.hint("shuffle_hash").select(col("urlHash"),
          col("html"), col("text"), col("lang"), col("warc_ts")),
        Seq("urlHash"), "left")
      .withColumn("fetchOk", col("html").isNotNull))

    val order = fetched.select(
      lit(round).as("round"), col("host"), col("hostRank"),
      col("canonUrl"), col("urlHash"), col("score"), col("fetchOk"))

    val discovered = ck(dedupeCandidates(discoverLinks(fetched, robots, cfg)))
    RoundResult(order, fetched, deferred, discovered)
  }
}
