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
   */
  def extract(pages: DataFrame): DataFrame = {
    val html = col("html").cast("string")
    val text = col("text")

    val withLayers = pages
      // layer 1: microdata/CSS-schema selectors compiled to anchored regex
      .withColumn("mdName", FieldExtract.itemprop(html, "name"))
      .withColumn("mdStreet", FieldExtract.itemprop(html, "streetAddress"))
      .withColumn("mdCity", FieldExtract.itemprop(html, "addressLocality"))
      .withColumn("mdState", FieldExtract.itemprop(html, "addressRegion"))
      .withColumn("mdZip", FieldExtract.itemprop(html, "postalCode"))
      .withColumn("mdTel", FieldExtract.telHref(html))
      // layer 2: JSON-LD block
      .withColumn("ld", from_json(
        FieldExtract.extractOrNull(html,
          "(?s)<script type=\"application/ld\\+json\">(.*?)</script>"),
        jsonLdSchema))
      // layer 3: regex over extracted text (the reference's fallback)
      .withColumn("rxPhone", FieldExtract.phone(text))
      .withColumn("rxEmail", FieldExtract.email(text))
      .withColumn("rxAddress", FieldExtract.address(text))
      .withColumn("rxBeds", FieldExtract.beds(text))
      .withColumn("rxCsz", FieldExtract.extractOrNull(text, FieldExtract.cityStateZipPattern, 0))
      .withColumn("titleName", FieldExtract.titleClean(
        FieldExtract.extractOrNull(html, "(?s)<title>(.*?)</title>")))

    val name = coalesce(col("mdName"), col("ld.name"), col("titleName"))
    val phoneRaw = coalesce(col("mdTel"), col("ld.telephone"), col("rxPhone"))
    val addr = coalesce(col("mdStreet"), col("ld.address.streetAddress"), col("rxAddress"))
    val city = coalesce(col("mdCity"), col("ld.address.addressLocality"),
      FieldExtract.cityOf(col("rxCsz")))
    val state = FieldExtract.stateNormalize(
      coalesce(col("mdState"), col("ld.address.addressRegion"),
        FieldExtract.stateOf(col("rxCsz"))))
    val zip = coalesce(col("mdZip"), col("ld.address.postalCode"),
      FieldExtract.zipOf(col("rxCsz")))

    withLayers
      .withColumn("name", name)
      .withColumn("phone", FieldExtract.phoneNormalize(phoneRaw))
      .withColumn("address", addr)
      .withColumn("city", city)
      .withColumn("state", state)
      .withColumn("zipCode", zip)
      .withColumn("email", col("rxEmail"))
      .withColumn("beds", col("rxBeds"))
      .withColumn("servicesOffered", FieldExtract.cleanArray(
        regexp_extract_all(html, lit("(?s)<li>([^<]+)</li>"), lit(1))))
      .withColumn("method", when(col("mdName").isNotNull, "css_schema")
        .when(col("ld.name").isNotNull, "json_ld").otherwise("regex"))
      .filter(FieldExtract.validFacility(col("name"), col("address"),
        col("city"), col("state"), col("zipCode")))
      .select(col("canonUrl").as("sourceUrl"), col("name"), col("phone"),
        col("address"), col("city"), col("state"), col("zipCode"),
        col("email"), col("beds"), col("servicesOffered"), col("method"))
  }
}
