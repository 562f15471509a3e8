package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.functions._
import graft.expr._

/**
 * graft functions — the engine's public Column API (mirrors
 * org.apache.spark.sql.functions style). Custom Catalyst expressions are
 * exposed here; everything else composes Spark builtins so Catalyst
 * optimizes/pushes/codegens it all.
 */
object gf {

  // ---- custom expressions (SURVEY.md §2.10) ----
  def canonicalize_url(url: Column): Column = column(CanonicalizeUrl(expression(url)))
  def resolve_url(base: Column, href: Column): Column =
    column(ResolveUrl(expression(base), expression(href)))
  def extract_text(html: Column): Column = column(ExtractText(expression(html)))
  def char_overlap_sim(a: Column, b: Column): Column =
    column(CharOverlapSim(expression(a), expression(b)))

  /** zlib compression ratio of the text (redundancy/gibberish signal —
    * see [[graft.expr.DeflateRatio]]). */
  def deflate_ratio(text: Column): Column = column(DeflateRatio(expression(text)))

  /** Registrable domain (eTLD+1) per the PSL algorithm — NULL when the
    * host is itself a public suffix (see [[graft.expr.RegistrableDomain]]). */
  def registrable_domain(host: Column): Column =
    column(RegistrableDomain(expression(host)))

  /** One-pass facility-field probe over raw HTML (struct of all
    * page-level extraction layers — see [[graft.expr.HtmlFacilityProbe]]). */
  def html_probe(html: Column): Column = column(HtmlFacilityProbe(expression(html)))

  /** Boilerplate removal: main content only, by block text/link density
    * (see [[graft.expr.MainContentExtract]]). */
  def main_content(html: Column, minWords: Int = 10, maxLinkDensity: Double = 0.33): Column =
    column(MainContentExtract(expression(html), minWords, maxLinkDensity))

  /** HTML → Markdown (the reference's crawl4ai `result.markdown` page
    * representation — see [[graft.expr.HtmlToMarkdown]]). `fit = true`
    * prunes nav/header/footer chrome first (fit_markdown). */
  def html_to_markdown(html: Column, fit: Boolean = false): Column =
    column(HtmlToMarkdown(expression(html), fit))

  /** Unicode normalization (default NFC — the cross-engine-verifiable
    * form; see [[graft.expr.UnicodeNormalize]]). Normalize BEFORE any
    * fingerprint/dedup hash. */
  def unicode_normalize(text: Column, form: String = "NFC"): Column =
    column(UnicodeNormalize(expression(text), form))

  /** Charset label of raw fetched bytes (BOM → meta → UTF-8 check →
    * windows-1252; see [[graft.expr.SniffCharset]]). */
  def sniff_charset(bytes: Column): Column = column(SniffCharset(expression(bytes)))

  /** Sniff + BOM-strip + decode raw page bytes to text (see
    * [[graft.expr.SniffDecode]]). */
  def sniff_decode(bytes: Column): Column = column(SniffDecode(expression(bytes)))

  /** MIME label of raw payload bytes (magic numbers → markup probe →
    * NUL scan; see [[graft.expr.SniffMime]]). */
  def sniff_mime(bytes: Column): Column = column(SniffMime(expression(bytes)))

  /** Total Aho-Corasick dictionary hits over the token stream (one pass
    * for any dictionary size; see [[graft.expr.DictHits]]). Entries are
    * lowercase words/phrases. */
  def dict_hits(text: Column, dict: Seq[String]): Column =
    column(DictHits(expression(text), dict))

  /** RFC 9309 robots verdict for one path under one robots.txt:
    * struct(allowed, rule, crawl_delay) — group selection, `*`/`$`
    * patterns, longest-match / allow-wins-tie precedence (see
    * [[graft.core.RobotsRules]] / [[graft.expr.RobotsDecision]]). */
  def robots_decision(robotsTxt: Column, agent: Column, path: Column): Column =
    column(RobotsDecision(expression(robotsTxt), expression(agent),
      expression(path)))

  /** HyperLogLog sketch of pre-hashed LONG values (standard error ≈
    * 1.04/√2^p; see [[graft.expr.HllAgg]]). Returns a binary blob. */
  def hll_agg(hashedValues: Column, p: Int = 12): Column =
    column(HllAgg(expression(hashedValues), p).toAggregateExpression())

  /** Register-max merge of same-precision HLL blobs — incremental
    * carried distinct-count state, ≡ full rebuild byte-identically. */
  def hll_merge_agg(sketches: Column): Column =
    column(HllMergeAgg(expression(sketches)).toAggregateExpression())

  /** Cardinality estimate of an HLL blob. */
  def hll_estimate(sketch: Column): Column =
    column(HllEstimate(expression(sketch)))

  /** t-digest quantile sketch of DOUBLE values (rank error O(1/δ);
    * see [[graft.expr.TDigestAgg]]). Returns a binary blob. */
  def tdigest_agg(values: Column, delta: Double = 100.0): Column =
    column(TDigestAgg(expression(values), delta).toAggregateExpression())

  /** Fold same-δ digest blobs — two-level / incremental quantile state
    * (rank-error bound preserved; bytes are merge-order-dependent). */
  def tdigest_merge_agg(digests: Column): Column =
    column(TDigestMergeAgg(expression(digests)).toAggregateExpression())

  /** Interpolated quantile estimate from a digest blob. */
  def tdigest_quantile(sketch: Column, q: Column): Column =
    column(TDigestQuantile(expression(sketch), expression(q)))

  /** Total observation count of a digest blob. */
  def tdigest_weight(sketch: Column): Column =
    column(TDigestWeight(expression(sketch)))

  /** Count-min point-frequency sketch of pre-hashed LONG keys with LONG
    * weights (estimate ≥ true, ≤ true + (e/w)·N w.p. ≥ 1 − e^−d; see
    * [[graft.expr.CountMinAgg]]). Returns a binary blob. */
  def count_min_agg(hashedKeys: Column, weight: Column,
                    depth: Int = 4, width: Int = 256): Column =
    column(CountMinAgg(expression(hashedKeys), expression(weight),
      depth, width).toAggregateExpression())

  /** Vector-add fold of same-shape count-min blobs — incremental /
    * two-level frequency state, ≡ one-shot build byte-identically. */
  def count_min_merge_agg(sketches: Column): Column =
    column(CountMinMergeAgg(expression(sketches)).toAggregateExpression())

  /** Point-frequency estimate of a pre-hashed key from a sketch blob. */
  def count_min_query(sketch: Column, hashedKey: Column): Column =
    column(CountMinQuery(expression(sketch), expression(hashedKey)))

  /** Total added weight N of a count-min blob. */
  def count_min_total(sketch: Column): Column =
    column(CountMinTotal(expression(sketch)))

  /** KMV / theta set sketch of pre-hashed LONG keys — the k smallest
    * distinct hash values; exact below k (see [[graft.expr.KmvAgg]]).
    * Unlike HLL, supports set operations: jaccard / union / intersect
    * estimates between two sketches. Returns a binary blob. */
  def kmv_agg(hashedKeys: Column, k: Int = 1024): Column =
    column(KmvAgg(expression(hashedKeys), k).toAggregateExpression())

  /** k-smallest-of-union fold of same-k KMV blobs — incremental /
    * two-level distinct state, ≡ one-shot build byte-identically. */
  def kmv_merge_agg(sketches: Column): Column =
    column(KmvMergeAgg(expression(sketches)).toAggregateExpression())

  /** Distinct-count estimate of a KMV blob (exact below k). */
  def kmv_distinct(sketch: Column): Column =
    column(KmvDistinct(expression(sketch)))

  /** Stored-value count of a KMV blob (< k ⇔ exact regime). */
  def kmv_size(sketch: Column): Column =
    column(KmvSize(expression(sketch)))

  /** Jaccard estimate between two same-k KMV blobs (Beyer et al.). */
  def kmv_jaccard(a: Column, b: Column): Column =
    column(KmvJaccard(expression(a), expression(b)))

  /** Union-distinct estimate between two same-k KMV blobs. */
  def kmv_union_distinct(a: Column, b: Column): Column =
    column(KmvUnionDistinct(expression(a), expression(b)))

  /** Intersection-distinct estimate between two same-k KMV blobs. */
  def kmv_intersect_distinct(a: Column, b: Column): Column =
    column(KmvIntersectDistinct(expression(a), expression(b)))

  /** Content-defined (FastCDC) chunks of the text's UTF-8 bytes —
    * array<struct<start,len,hash>> (see [[graft.expr.CdcChunks]]). */
  def cdc_chunks(text: Column, min: Int = 64, avg: Int = 256,
                 max: Int = 1024): Column =
    column(CdcChunks(expression(text), min, avg, max))

  /** Multi-column link Generator: a row per `<a href>` anchor —
    * (href, anchor_text, rel) in one html pass (SURVEY.md C26 + the
    * anchor-text half of F3). Use in select() like explode(). */
  def extract_links(html: Column): Column = column(ExtractLinks(expression(html)))

  /** Form Generator over the real DOM: a row per `<form>` —
    * (action, method, form_text, fields name/type/required) — the
    * search-endpoint discovery input (see [[graft.expr.ExtractForms]];
    * reference navigation.py:184-220). Use in select() like explode(). */
  def extract_forms(html: Column): Column = column(ExtractForms(expression(html)))

  /** Real CSS-selector query: text of every match, document order
    * (SURVEY.md C25 — see [[graft.expr.CssSelectAll]]). Selector must be
    * a literal. */
  def css_select_all(html: Column, selector: String): Column =
    column(CssSelectAll(expression(html), expression(lit(selector))))

  /** Attribute values of every selector match, document order — the
    * attribute half of a scraping schema (see [[graft.expr.CssAttrAll]]).
    * Selector and attribute must be literals. */
  def css_attr_all(html: Column, selector: String, attr: String): Column =
    column(CssAttrAll(expression(html), expression(lit(selector)),
      expression(lit(attr))))

  /** Schema-driven CSS extraction: one struct per baseSelector match,
    * one field (f0..fn) per field selector's first match in that scope
    * (see [[graft.expr.CssExtract]]). Selectors must be literals. */
  def css_extract(html: Column, baseSelector: String, fieldSelectors: String*): Column =
    column(CssExtract(
      expression(html) +: (baseSelector +: fieldSelectors).map(s => expression(lit(s)))))

  /** Structured `<table>` extraction through the real DOM: one struct
    * per cell (table, row, col, is_header, cell) — see
    * [[graft.expr.HtmlTableCells]]. */
  def html_table_cells(html: Column): Column =
    column(HtmlTableCells(expression(html)))

  /** DustBuster rewrite rule for a url alias pair: strip longest common
    * prefix then suffix → struct(alpha, beta) (see
    * [[graft.expr.DustRule]]). */
  def dust_rule(a: Column, b: Column): Column =
    column(DustRule(expression(a), expression(b)))

  /** Reference URLScorer score (url_scorer.py:44-115) as one codegen'd
    * expression node; base nullable (null → depth 0). */
  def url_score(url: Column, base: Column): Column =
    column(UrlScore(expression(url), expression(base)))

  /** Partitioned-Bloom seen-set aggregate (SURVEY.md §2.10): builds a
    * serialized BloomFilter over LONG inputs. */
  def bloom_agg(values: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    column(BloomFilterAgg(expression(values), expression(lit(expectedItems)), fpp)
      .toAggregateExpression())

  /** OR-merge serialized BloomFilters of identical shape (incremental
    * seen-bloom state — see [[graft.expr.BloomMergeAgg]]). */
  def bloom_merge_agg(blooms: Column): Column =
    column(BloomMergeAgg(expression(blooms)).toAggregateExpression())

  /** Mergeable SpaceSaving frequent-items sketch: array of
    * (item, est, err, total) sorted by est desc — see
    * [[graft.expr.SpaceSavingAgg]] for bounds and the 100 TB shape. */
  def space_saving_agg(item: Column, weight: Column, capacity: Int): Column =
    column(SpaceSavingAgg(expression(item), expression(weight),
      expression(lit(capacity))).toAggregateExpression())

  /** Test a LONG against a serialized BloomFilter column. */
  def might_contain(bloom: Column, value: Column): Column =
    column(MightContainLong(expression(bloom), expression(value)))

  /** Counting-Bloom (deletable seen pre-filter) aggregate over LONGs —
    * see [[graft.expr.CountingBloomAgg]] / [[graft.core.CountingBloom]]. */
  def cbloom_agg(values: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    column(CountingBloomAgg(expression(values), expression(lit(expectedItems)), fpp)
      .toAggregateExpression())

  /** Vector-ADD merge of same-shape serialized counting filters. */
  def cbloom_merge_agg(cbfs: Column): Column =
    column(CountingBloomMergeAgg(expression(cbfs)).toAggregateExpression())

  /** Retire a deletion batch (a counting filter over deleted keys) from
    * counting-filter state: element-wise subtraction. */
  def cbloom_subtract(state: Column, delta: Column): Column =
    column(CbloomSubtract(expression(state), expression(delta)))

  /** Test a LONG against a serialized counting filter. */
  def cbloom_might_contain(cbf: Column, value: Column): Column =
    column(CbloomMightContain(expression(cbf), expression(value)))

  /** Cuckoo-filter (compact deletable seen pre-filter) aggregate over
    * LONGs — see [[graft.expr.CuckooAgg]] / [[graft.core.CuckooFilter]]
    * for the answer-identity merge contract. */
  def cuckoo_agg(values: Column, expectedItems: Long): Column =
    column(CuckooAgg(expression(values), expression(lit(expectedItems)))
      .toAggregateExpression())

  /** Multiset-union merge of same-shape serialized cuckoo filters. */
  def cuckoo_merge_agg(ckfs: Column): Column =
    column(CuckooMergeAgg(expression(ckfs)).toAggregateExpression())

  /** Retire a deletion batch (a cuckoo filter over deleted keys) from
    * cuckoo state: remove one fingerprint copy per delta entry. */
  def cuckoo_subtract(state: Column, delta: Column): Column =
    column(CuckooSubtract(expression(state), expression(delta)))

  /** Test a LONG against a serialized cuckoo filter. */
  def cuckoo_might_contain(ckf: Column, value: Column): Column =
    column(CuckooMightContain(expression(ckf), expression(value)))

  /** URL identity per north rule: xxhash64 of canonical form. */
  def url_id(url: Column): Column = xxhash64(canonicalize_url(url))

  /** Host of a URL (lowercased, default-port-stripped). */
  def url_host(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Path component ("" when absent), mirroring Python urlparse().path. */
  def url_path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Query string ("" when absent). */
  def url_query(url: Column): Column = regexp_extract(url, "\\?([^#]*)", 1)

  /** Non-empty path-segment count. */
  def path_segments(url: Column): Column =
    size(filter(split(url_path(url), "/"), s => s =!= ""))

  /** Register SQL names for the custom expressions (used by spark.sql paths
    * and by .explain readability). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("canonicalize_url",
      es => CanonicalizeUrl(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("resolve_url",
      es => ResolveUrl(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("extract_text",
      es => ExtractText(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("char_overlap_sim",
      es => CharOverlapSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("html_to_markdown",
      es => HtmlToMarkdown(es.head, fit = false), "scala_udf")
    reg.createOrReplaceTempFunction("unicode_normalize",
      es => UnicodeNormalize(es.head, "NFC"), "scala_udf")
    reg.createOrReplaceTempFunction("sniff_charset",
      es => SniffCharset(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("sniff_decode",
      es => SniffDecode(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("sniff_mime",
      es => SniffMime(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hll_estimate",
      es => HllEstimate(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("deflate_ratio",
      es => DeflateRatio(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("main_content",
      es => MainContentExtract(es.head, 10, 0.33), "scala_udf")
    reg.createOrReplaceTempFunction("html_table_cells",
      es => HtmlTableCells(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("robots_decision",
      es => RobotsDecision(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("registrable_domain",
      es => RegistrableDomain(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("tdigest_quantile",
      es => TDigestQuantile(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("tdigest_weight",
      es => TDigestWeight(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("count_min_query",
      es => CountMinQuery(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("count_min_total",
      es => CountMinTotal(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_distinct",
      es => KmvDistinct(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_size",
      es => KmvSize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_jaccard",
      es => KmvJaccard(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_union_distinct",
      es => KmvUnionDistinct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("kmv_intersect_distinct",
      es => KmvIntersectDistinct(es(0), es(1)), "scala_udf")
  }
}
