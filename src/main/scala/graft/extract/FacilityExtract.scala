package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.gf

/**
 * Page → facility-record extraction as ONE projection pass implementing the
 * reference's cheap→expensive cascade (schema-CSS → JSON-LD → regex
 * fallback, /root/reference/schema_based_extractor.py:385-441) with
 * `coalesce` per field — Catalyst evaluates branches lazily left-to-right
 * per row, so the "cascade" costs one scan instead of the reference's
 * three re-fetches (SURVEY.md §3.2 Spark shape).
 */
object FacilityExtract {

  /** JSON-LD schema for the LocalBusiness objects the reference parses
    * (extractors.py:29-75). */
  val jsonLdSchema: StructType = StructType(Seq(
    StructField("@type", StringType),
    StructField("name", StringType),
    StructField("telephone", StringType),
    StructField("address", StructType(Seq(
      StructField("@type", StringType),
      StructField("streetAddress", StringType),
      StructField("addressLocality", StringType),
      StructField("addressRegion", StringType),
      StructField("postalCode", StringType))))))

  /**
   * Input: fetched pages with (canonUrl, html binary, text string).
   * Output: one row per page that yields a valid facility record.
   *
   * Plan shape matters here: the page-level layers come from ONE
   * single-pass probe (gf.html_probe), and the JSON-LD parse + text
   * regexes each run exactly once per page. Both layers sit behind a
   * one-element `explode(array(...))` Generate: the record-validity
   * filter references generator output, which Catalyst will NOT push
   * below a Generate — without the barrier, PushPredicateThroughNonJoin
   * substitutes the alias trees into the pushed-down condition and the
   * probe/from_json re-evaluate ~40× per row (the round-1 q33 52 s
   * defect was this shape with per-field regexes).
   */
  def extract(pages: DataFrame): DataFrame = {
    val text = col("text")

    // stage 1: one html scan → struct of all page-level layers
    // (explode(array(x)) = identity Generate, the predicate-pushdown barrier)
    val probed = pages.select(col("canonUrl"), col("text"),
      explode(array(gf.html_probe(col("html")))).as("probe"))

    // stage 2: JSON-LD parse (once) + text-side regex layer, same barrier
    val withLayers = probed.select(
      col("canonUrl"),
      col("probe"),
      explode(array(struct(
        from_json(col("probe.jsonld"), jsonLdSchema).as("ld"),
        FieldExtract.phone(text).as("rxPhone"),
        FieldExtract.email(text).as("rxEmail"),
        FieldExtract.address(text).as("rxAddress"),
        FieldExtract.beds(text).as("rxBeds"),
        FieldExtract.extractOrNull(text, FieldExtract.cityStateZipPattern, 0).as("rxCsz"),
        FieldExtract.addressLines(text).as("rxLines"), // C9 line-split fallback
        FieldExtract.titleClean(col("probe.title")).as("titleName")))).as("L"))

    // stage 3: cascade coalescing over materialized generator attributes
    val name = coalesce(col("probe.mdName"), col("L.ld.name"), col("L.titleName"))
    val phoneRaw = coalesce(col("probe.mdTel"), col("L.ld.telephone"), col("L.rxPhone"))
    val addr = coalesce(col("probe.mdStreet"), col("L.ld.address.streetAddress"),
      col("L.rxAddress"), col("L.rxLines.street"))
    val city = coalesce(col("probe.mdCity"), col("L.ld.address.addressLocality"),
      FieldExtract.cityOf(col("L.rxCsz")), col("L.rxLines.city"))
    val state = FieldExtract.stateNormalize(
      coalesce(col("probe.mdState"), col("L.ld.address.addressRegion"),
        FieldExtract.stateOf(col("L.rxCsz")), col("L.rxLines.state")))
    val zip = coalesce(col("probe.mdZip"), col("L.ld.address.postalCode"),
      FieldExtract.zipOf(col("L.rxCsz")), col("L.rxLines.zip"))

    withLayers
      .select(col("canonUrl").as("sourceUrl"),
        name.as("name"),
        FieldExtract.phoneNormalize(phoneRaw).as("phone"),
        addr.as("address"), city.as("city"), state.as("state"), zip.as("zipCode"),
        col("L.rxEmail").as("email"), col("L.rxBeds").as("beds"),
        // L2: blocks cap — at most 50 list items per page feed the
        // services array (hybrid_extractor.py:399 blocks[:50])
        FieldExtract.cleanArray(slice(col("probe.liItems"), 1, 50)).as("servicesOffered"),
        when(col("probe.mdName").isNotNull, "css_schema")
          .when(col("L.ld.name").isNotNull, "json_ld").otherwise("regex").as("method"))
      .filter(FieldExtract.validFacility(col("name"), col("address"),
        col("city"), col("state"), col("zipCode")))
  }
}
