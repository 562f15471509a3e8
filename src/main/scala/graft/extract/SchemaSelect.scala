package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.gf

/**
 * Per-page extraction-schema selection — the W4 argmax that actually
 * drives the reference's extraction
 * (/root/reference/schema_based_extractor.py:302-327):
 *   1. URL glob match (first schema in library order whose pattern
 *      fnmatches the lowercased url) wins outright;
 *   2. else HTML-compatibility score (:334-366): +1 per base-selector
 *      class/id token present in the html, +0.5 per field-selector class
 *      token present, normalized by the check count; best schema wins
 *      (ties → earlier schema), subject to score > 0.3;
 *   3. else no schema (null).
 * All as pure column expressions — the argmax is an array_max over
 * (score, -index) structs, never a UDF.
 */
object SchemaSelect {

  /** One schema spec: the selection-relevant parts of the reference's
    * ExtractionSchema (schema_based_extractor.py:24-33). */
  final case class SchemaSpec(name: String, sitePatterns: Seq[String],
                              baseSelector: String, fieldSelectors: Seq[String]) {
    /** base-selector (kind, token) checks: kind 'c' = class substring,
      * 'i' = id=" substring, 'n' = no-token selector (counts toward the
      * denominator only) — schema_based_extractor.py:341-354. */
    lazy val baseChecks: Seq[(Char, String)] = baseSelector.split(", ").toSeq.map { sel =>
      if (sel.contains(".")) ('c', sel.split("\\.")(1).split(" ")(0))
      else if (sel.contains("#")) ('i', sel.split("#")(1).split(" ")(0))
      else ('n', "")
    }
    /** field-selector class tokens, 0.5 weight each
      * (schema_based_extractor.py:356-364). */
    lazy val fieldTokens: Seq[String] = fieldSelectors.flatMap { sel =>
      if (sel.contains("."))
        "\\.([a-zA-Z0-9_-]+)".r.findAllMatchIn(sel).map(_.group(1)).toSeq
      else Seq.empty
    }
    lazy val totalChecks: Int = math.max(baseChecks.length + fieldTokens.length, 1)
  }

  /** The reference's shipped schema library, selection-relevant parts
    * transcribed from schema_based_extractor.py:43-300 (5 schemas). */
  val library: Seq[SchemaSpec] = Seq(
    SchemaSpec("standard_facility_listing",
      Seq("*facility*", "*location*", "*community*", "*center*"),
      ".facility-card, .location-card, .community-card, .center-card",
      Seq("h1, h2, h3, .facility-name, .location-name, .community-name",
        ".address, .location, .street-address, [itemprop='streetAddress']",
        ".city, [itemprop='addressLocality']",
        ".state, [itemprop='addressRegion']",
        ".zip, .postal-code, [itemprop='postalCode']",
        ".phone, .telephone, [itemprop='telephone'], a[href^='tel:']",
        "a[href*='http'], .website-link, .facility-link",
        ".facility-type, .care-type, .service-type",
        ".services li, .amenities li, .care-services li")),
    SchemaSpec("table_facility_listing",
      Seq("*table*", "*directory*", "*list*"),
      "table tr, .facility-table tr, .location-table tr",
      Seq("td:first-child, .facility-name, .name-column",
        "td:nth-child(2), .address-column",
        "td:nth-child(3), .phone-column, a[href^='tel:']",
        "td:nth-child(4), .type-column")),
    SchemaSpec("individual_facility_detail",
      Seq("*facility/*", "*location/*", "*community/*"),
      "body, .facility-details, .location-details",
      Seq("h1, .facility-name, .page-title",
        ".address, .contact-info .address, [itemprop='streetAddress']",
        ".city, [itemprop='addressLocality']",
        ".state, [itemprop='addressRegion']",
        ".zip, [itemprop='postalCode']",
        ".phone, [itemprop='telephone'], a[href^='tel:']",
        ".email, a[href^='mailto:']",
        ".administrator, .director, .manager",
        ".beds, .capacity, .bed-count",
        ".services li, .amenities li, .features li",
        ".description, .about, .overview")),
    SchemaSpec("sunrise_senior_living",
      Seq("*sunriseseniorliving.com*"),
      ".community-card, .location-result",
      Seq(".community-name, h3", ".address-line-1", ".address-line-2",
        ".phone-number, a[href^='tel:']", ".care-types li, .services li")),
    SchemaSpec("lcca_state_listing",
      Seq("*lcca.com/locations/*"),
      ".facCard",
      Seq(".facName h2", ".facAddress", "span[itemprop='addressLocality']",
        "span[itemprop='addressRegion']", "span[itemprop='postalCode']",
        "a[href^='tel:']", "a.btnMainCTA", ".serviceType li:first-child",
        ".serviceType li")))

  /** fnmatch glob → anchored Java regex (case handled by lowercasing both
    * sides, fnmatch semantics: * = any run, ? = any char). */
  def globToRegex(glob: String): String =
    glob.toLowerCase.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    }

  /** HTML-compatibility score for one schema
    * (schema_based_extractor.py:334-366). */
  def compatibilityScore(html: Column, spec: SchemaSpec): Column = {
    val base = spec.baseChecks.collect {
      case ('c', t) => when(html.contains(t), 1.0).otherwise(0.0)
      case ('i', t) => when(html.contains("id=\"" + t + "\""), 1.0).otherwise(0.0)
    }
    val fields = spec.fieldTokens.map(t => when(html.contains(t), 0.5).otherwise(0.0))
    val hits = (base ++ fields).reduceOption(_ + _).getOrElse(lit(0.0))
    hits / spec.totalChecks.toDouble
  }

  /**
   * Add (schema_name, schema_score, schema_via) to pages. `via` is
   * "url" (glob match — score null), "html" (compatibility argmax over
   * threshold) or null (no schema).
   */
  def withSchemaChoice(pages: DataFrame, urlCol: String, htmlCol: String,
                       specs: Seq[SchemaSpec] = library,
                       threshold: Double = 0.3): DataFrame = {
    val url = lower(col(urlCol))
    val html = col(htmlCol).cast("string")
    val byUrl = coalesce(specs.map { s =>
      val m = s.sitePatterns.map(p => url.rlike("^" + globToRegex(p) + "$"))
        .reduce(_ || _)
      when(m, s.name)
    } :+ lit(null).cast("string"): _*)
    // argmax over (score, -index): max score, ties → earlier schema
    val best = array_max(array(specs.zipWithIndex.map { case (s, i) =>
      struct(compatibilityScore(html, s).as("s"), lit(-i).as("ni"), lit(s.name).as("n"))
    }: _*))
    pages
      .withColumn("__byUrl", byUrl)
      .withColumn("__best", best)
      .withColumn("schema_name", coalesce(col("__byUrl"),
        when(col("__best.s") > threshold, col("__best.n"))))
      .withColumn("schema_score",
        when(col("__byUrl").isNull && col("__best.s") > threshold,
          round(col("__best.s"), 6)))
      .withColumn("schema_via", when(col("__byUrl").isNotNull, "url")
        .when(col("schema_name").isNotNull, "html"))
      .drop("__byUrl", "__best")
  }
}

/**
 * W3: extraction-target top-N selection
 * (/root/reference/hybrid_extractor.py:173-199, caps
 * crawl_config.py:33-34): targets ordered by (confidence desc,
 * expected_count desc) with a deterministic url tie-break, capped at
 * maxTargets.
 */
object Targets {
  def topTargets(targets: DataFrame, maxTargets: Int,
                 urlCol: String = "url"): DataFrame =
    targets.orderBy(col("confidence").desc, col("expected_count").desc,
      col(urlCol).asc).limit(maxTargets)
}

/**
 * T5: per-domain schema cache with TTL — a chosen schema is reused for
 * every page of the domain for `ttlHours` (168 h,
 * /root/reference/crawler_manager.py:135-153, crawl_config.py:79-83).
 * Cache state is a table (host, schema_name, cached_at), applied as a
 * broadcast join — never driver-side dict state.
 */
object SchemaCache {

  import org.apache.spark.sql.SparkSession

  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, java.sql.Timestamp)]
      .toDF("host", "schema_name", "cached_at")
  }

  /** Entries still inside their TTL at `asOf`. */
  def validAt(cache: DataFrame, asOf: String, ttlHours: Int = 168): DataFrame =
    cache.filter(col("cached_at") >=
      lit(asOf).cast("timestamp") - expr(s"INTERVAL $ttlHours HOURS"))

  /**
   * Select a schema per page, honoring the cache: hosts with a live cache
   * entry reuse it (schema_via = "cache", no html scoring); other hosts
   * run the full [[SchemaSelect.withSchemaChoice]] argmax. Returns
   * (pages with schema columns, updated cache) — the updated cache keeps
   * live entries and adds one deterministic entry per newly-chosen host
   * (the min-url page's choice).
   */
  def select(pages: DataFrame, cache: DataFrame, asOf: String,
             urlCol: String = "url", htmlCol: String = "html",
             ttlHours: Int = 168): (DataFrame, DataFrame) = {
    val live = validAt(cache, asOf, ttlHours)
    val withHost = pages.withColumn("__host", gf.url_host(col(urlCol)))
    val joined = withHost.join(
      broadcast(live.select(col("host").as("__host"), col("schema_name").as("__cached"))),
      Seq("__host"), "left")

    val cachedPart = joined.filter(col("__cached").isNotNull)
      .withColumn("schema_name", col("__cached"))
      .withColumn("schema_score", lit(null).cast("double"))
      .withColumn("schema_via", lit("cache"))
    val freshPart = SchemaSelect.withSchemaChoice(
      joined.filter(col("__cached").isNull), urlCol, htmlCol)

    val chosen = cachedPart.unionByName(freshPart)
      .drop("__cached")

    // one deterministic new entry per newly-chosen host: min-url page
    val w = Window.partitionBy("__host").orderBy(col(urlCol).asc)
    val newEntries = freshPart.filter(col("schema_name").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__host").as("host"), col("schema_name"),
        lit(asOf).cast("timestamp").as("cached_at"))
    (chosen.drop("__host"), live.unionByName(newEntries))
  }
}
