package graft.extract

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.UrlPredicates

class ValidationSpec extends SparkTestBase {
  import spark.implicits._

  private val facilities = Seq(
    // (sourceUrl, name, phone, address, city, zipCode, email)
    ("u1", "Care A", "(620) 364-2117", "601 Cross St., Burlington, KS 66839", "Burlington", "66839", "info@lcca.com"),
    ("u2", "Care B", "123", "Main Street", "X", "1", "bad-email"),
    ("u3", "Care C", "16203642117", "700 Oak Ave", "Y", "10001", "a@gmail.com"),
    ("u4", "Care D", null, null, null, null, "noreply@test.com"))
    .toDF("sourceUrl", "name", "phone", "address", "city", "zipCode", "email")

  private lazy val validated = Validation.withValidation(facilities).cache()

  test("phone/address/email confidences follow the reference's format rules") {
    val m = validated.select("sourceUrl", "phoneConfidence", "addressConfidence", "emailConfidence")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("u1") == ((0.95, 1.0, 0.9)))       // full valid row
    assert(m("u2")._1 == 0.3)                    // 3-digit phone
    assert(m("u2")._2 < 0.5)                     // no street number prefix? "Main Street" has no number
    assert(m("u2")._3 == 0.1)                    // bad email
    assert(m("u3")._1 == 0.95)                   // 11-digit starting 1 → valid national
    assert(m("u3")._3 == 0.7)                    // generic provider
    assert(m("u4")._1 == 0.0 && m("u4")._2 == 0.0)
  }

  test("confidence filter, summary, field stats, flag histogram") {
    assert(Validation.confidenceFilter(validated, 0.6).count() == 2) // u1 (.95), u3 (.7833)
    val s = Validation.summary(validated).collect()(0)
    assert(s.getAs[Long]("total_facilities") == 4)
    assert(s.getAs[Long]("valid_facilities") == 2) // u1, u3 (phone .95, addr ≥ .5)
    assert(s.getAs[Long]("high_confidence") + s.getAs[Long]("medium_confidence") +
      s.getAs[Long]("low_confidence") == 4)
    val fs = Validation.fieldStats(validated)
      .select("field_name", "valid").as[(String, Long)].collect().toMap
    assert(fs("phone") == 2 && fs("email") == 3) // u4's noreply is format-valid (F12 flags it)
    val flags = Validation.flagDistribution(validated)
      .as[(String, Long)].collect().toMap
    assert(flags("email_false_positive") == 1)   // u4 noreply@test.com
    assert(flags("low_phone_confidence") == 2)   // u2, u4
  }

  test("url predicates: same-domain, facility-related/detail/url, maps address") {
    val df = Seq(
      "https://www.lcca.com/locations/ks/burlington/",
      "https://lcca.com/locations/",
      "https://lcca.com/careers/locations-team",
      "https://other.com/about/").toDF("url")
    val out = df.select($"url",
      UrlPredicates.sameDomain($"url", lit("lcca.com")).as("sd"),
      UrlPredicates.isFacilityRelated($"url").as("rel"),
      UrlPredicates.isFacilityDetail($"url").as("det"),
      UrlPredicates.isFacilityUrl($"url").as("fac"))
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out("https://www.lcca.com/locations/ks/burlington/")._1)          // www-insensitive
    assert(out("https://lcca.com/locations/") == ((true, true, false, true)))
    assert(!out("https://lcca.com/careers/locations-team")._4)               // excluded
    assert(out("https://other.com/about/") == ((false, false, false, false)))
    // detail: named item directly under a facility section
    assert(Seq("https://lcca.com/locations/burlington").toDF("url")
      .select(UrlPredicates.isFacilityDetail($"url")).as[Boolean].head())

    val addr = Seq("https://maps.google.com/maps?q=601+Cross+St%2C+Burlington&z=15")
      .toDF("href").select(UrlPredicates.mapsUrlAddress($"href")).as[String].head()
    assert(addr == "601 Cross St, Burlington")
  }
}
