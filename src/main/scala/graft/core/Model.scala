package graft.core

import java.sql.Timestamp

/**
 * Core data model (SURVEY.md §1.1). The page-store row shape is
 * authoritative from BASELINE.json `input_hint`:
 *   (url string, warc_ts timestamp, html binary, text string, lang string).
 */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/**
 * One frontier row. The reference keeps `List[Tuple[str, float]]` + a
 * visited `set` in RAM (/root/reference/url_scorer.py:160-161); here the
 * frontier IS a table, partitionable by `host` / `urlHash`.
 */
final case class FrontierEntry(
    url: String,        // original discovered form
    canonUrl: String,   // RFC 3986 canonical form
    urlHash: Long,      // xxhash64(canonUrl) — URL identity (north rule)
    host: String,
    depth: Int,         // BFS depth = round discovered
    score: Double)      // reference URLScorer semantics (url_scorer.py:44-101)

/** Crawl-order output row: the sequence fixture tests assert on. */
final case class CrawlOrderRow(
    round: Int,
    host: String,
    hostRank: Int,      // politeness rank within (host, round), 1-based
    canonUrl: String,
    urlHash: Long,
    score: Double,
    fetchOk: Boolean)   // false = frontier url missing from page store (T8 dead-letter)

/**
 * The extracted facility record — reference `FacilityInfo`
 * (/root/reference/healthcare_scraper.py:29-71), trimmed to the fields the
 * deterministic (non-LLM) cascade can populate.
 */
final case class Facility(
    name: String,
    facilityType: String,
    address: String,
    city: String,
    state: String,
    zipCode: String,
    phone: String,
    email: String,
    website: String,
    beds: String,
    servicesOffered: Seq[String],
    sourceUrl: String)

/** Corporate chain seed row (/root/reference/csv_processor.py:19-55). */
final case class Chain(
    corporationName: String,
    primaryUrl: String,
    secondaryUrls: Seq[String],
    facilityTypes: Seq[String],
    priority: Int,
    estimatedFacilities: String,
    lastUpdated: String)

/**
 * Crawl configuration — the reference's politeness/depth knobs
 * (/root/reference/config.py:62-70, /root/reference/crawl_config.py:9-21).
 */
final case class CrawlConfig(
    maxDepth: Int = 4,             // config.py:63
    perHostBudget: Int = 30,       // models 30 req/min (crawl_config.py:15)
    maxPagesPerSite: Int = 500,    // config.py:67
    minScore: Double = -100.0,     // url_scorer.py:141-150 threshold
    saltBuckets: Int = 16,         // skew salt S for the two-phase host rank
    bloomBuckets: Int = 32,        // partitioned seen-bloom bucket count
    bloomFpp: Double = 0.01,
    keepPayload: Boolean = true,   // false: html/text dropped from round state
                                   // after link discovery (drain-only crawls)
    maxPageNo: Int = 50,           // W7 pagination-chain cap (navigation.py:451)
    probeSeeds: Boolean = false,   // seed probe facility-listing urls per
                                   // domain (healthcare_scraper.py:140-151)
    roundSeconds: Double = 0.0,    // >0: a round models one live politeness
                                   // window of this many seconds, so robots
                                   // crawl-delay d caps a host at
                                   // ceil(roundSeconds/d) fetches per round
                                   // (T3, crawl_config.py:15). 0 = drain
                                   // mode (offline store, no pacing).
    pageBuckets: Int = 0,          // >0: page store is bucket-partitioned by
                                   // pmod(urlHash, n) → runtime file skipping
                                   // on the fetch join (PageStore)
    compactEvery: Int = 0)         // >0: after every n-th committed round the
                                   // FrontierStore compacts seen/order deltas
                                   // into base snapshots and gc's superseded
                                   // dirs (bounded files on months-long
                                   // crawls). 0 = never (caller-managed)
