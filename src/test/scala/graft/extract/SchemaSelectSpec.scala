package graft.extract

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * W4/T5: schema-selection argmax parity with the reference's
 * get_best_schema logic (fixture computed by the transcribed reference
 * algorithm in tools/gen_fixtures.py — schema_based_extractor.py:302-366),
 * plus the per-domain TTL schema cache (crawler_manager.py:135-153).
 */
class SchemaSelectSpec extends SparkTestBase {
  import spark.implicits._

  test("schema choice matches the reference selection fixture (url glob, html score, threshold)") {
    val fx = spark.read.option("multiLine", true)
      .json(getClass.getResource("/fixtures/schema_select.json").getPath)
    val ours = SchemaSelect.withSchemaChoice(
      fx.select(col("url"), col("html"),
        col("schema_name").as("expName"), col("schema_score").as("expScore"),
        col("schema_via").as("expVia")),
      "url", "html")
    val bad = ours.filter(
      !(col("schema_name") <=> col("expName")) ||
      !(col("schema_via") <=> col("expVia")) ||
      !(abs(coalesce(col("schema_score"), lit(0.0)) - coalesce(col("expScore"), lit(0.0))) < 1e-9))
      .select("url", "schema_name", "expName", "schema_score", "expScore",
        "schema_via", "expVia").collect()
    assert(bad.isEmpty, s"mismatches:\n${bad.mkString("\n")}")
  }

  test("schema cache: live entry reused without rescoring, expired entry recomputed") {
    val cardHtml =
      """<div class="facCard"><div class="facName"><h2>A</h2></div>
        |<div class="facAddress">1 Main</div><ul class="serviceType"><li>SNF</li></ul></div>""".stripMargin
    val pages = Seq(
      ("https://a.example.com/page-1", cardHtml),
      ("https://a.example.com/page-2", "<html><body>nothing here</body></html>"),
      ("https://b.example.com/page-1", cardHtml))
      .toDF("url", "html")

    // first pass: no cache → both hosts scored; a.example.com's entry
    // comes from its min-url page (page-1 → lcca_state_listing)
    val (chosen1, cache1) = SchemaCache.select(pages, SchemaCache.empty(spark), "2025-07-01 00:00:00")
    assert(chosen1.filter(col("schema_via") === "cache").count() == 0)
    val entries = cache1.select("host", "schema_name").as[(String, String)].collect().toMap
    assert(entries == Map("a.example.com" -> "lcca_state_listing",
      "b.example.com" -> "lcca_state_listing"))

    // second pass inside TTL: every page of a cached host reuses the
    // cached schema — including page-2 whose html scores below threshold
    val (chosen2, cache2) = SchemaCache.select(pages, cache1, "2025-07-03 00:00:00")
    assert(chosen2.filter(col("schema_via") === "cache").count() == 3)
    assert(chosen2.filter(col("url") === "https://a.example.com/page-2")
      .select("schema_name").as[String].head() == "lcca_state_listing")
    assert(cache2.count() == 2) // unchanged, still the original cached_at
    assert(cache2.select(max("cached_at")).as[java.sql.Timestamp].head().toString
      .startsWith("2025-07-01"))

    // third pass after the 168 h TTL: entries expired → full rescore,
    // page-2 is back to no-schema
    val (chosen3, cache3) = SchemaCache.select(pages, cache2, "2025-07-09 00:00:01")
    assert(chosen3.filter(col("schema_via") === "cache").count() == 0)
    assert(chosen3.filter(col("url") === "https://a.example.com/page-2")
      .select("schema_name").as[String].head() == null)
    assert(cache3.select(min("cached_at")).as[java.sql.Timestamp].head().toString
      .startsWith("2025-07-09"))
  }
}
