package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Offline validation layer (SURVEY.md A6/F7/J6) — the deterministic format
 * halves of the reference's FreeValidationSystem
 * (/root/reference/free_validation.py). The network validators (Nominatim
 * geocoding :257-303, HTTP website checks :382-427) are out of scope in a
 * zero-egress engine; their format-rule halves are reproduced as pure
 * column expressions, and the batch "zip facilities with reports"
 * (main_best_practices.py:106) becomes columns ON the facility row — a
 * keyed join, never a positional zip.
 */
object Validation {

  /** Phone format validation (free_validation.py:56-139 shape, NANP rules
    * instead of the phonenumbers lib): valid 10-digit (area code not
    * 0/1) → 0.95; possible (10/11 digits) → 0.7; else 0.3; empty → 0.0. */
  def phoneConfidence(phone: Column): Column = {
    val d0 = regexp_replace(coalesce(phone, lit("")), "[^0-9]", "")
    val d = when(length(d0) === 11 && d0.startsWith("1"), substring(d0, 2, 10)).otherwise(d0)
    when(coalesce(phone, lit("")) === "", 0.0)
      .when(length(d) === 10 && !substring(d, 1, 1).isin("0", "1"), 0.95)
      .when(length(d).isin(10, 11), 0.7)
      .otherwise(0.3)
  }
  def phoneIsValid(phone: Column): Column = phoneConfidence(phone) >= 0.95

  /** Address format validation (free_validation.py:220-255): required
    * street-number + street-name weighted 0.7, optional city/state/zip
    * weighted 0.3. */
  def addressConfidence(address: Column): Column = {
    val a = coalesce(address, lit(""))
    val streetNumber = a.rlike("^\\d+")
    val streetName = a.rlike("(?i)\\d+\\s+[A-Za-z0-9\\s]+(?:Street|St|Avenue|Ave|Road|Rd|Drive|Dr|Boulevard|Blvd|Lane|Ln|Way|Circle|Cir|Court|Ct|Place|Pl)")
    val city = a.rlike("[A-Za-z\\s]+,\\s*[A-Z]{2}")
    val state = a.rlike("\\b[A-Z]{2}\\b")
    val zip = a.rlike("\\b\\d{5}(?:-\\d{4})?\\b")
    val req = (when(streetNumber, 1).otherwise(0) + when(streetName, 1).otherwise(0))
      .cast("double") / 2.0
    val opt = (when(city, 1).otherwise(0) + when(state, 1).otherwise(0) +
      when(zip, 1).otherwise(0)).cast("double") / 3.0
    when(a === "", 0.0).otherwise(req * 0.7 + opt * 0.3)
  }
  def addressIsValid(address: Column): Column =
    coalesce(address, lit("")).rlike("^\\d+") &&
      coalesce(address, lit("")).rlike("(?i)\\d+\\s+[A-Za-z0-9\\s]+(?:Street|St|Avenue|Ave|Road|Rd|Drive|Dr|Boulevard|Blvd|Lane|Ln|Way|Circle|Cir|Court|Ct|Place|Pl)")

  /** Email format validation (free_validation.py:438-497): RFC-lite regex;
    * generic providers → 0.7, else 0.9; invalid → 0.1; empty → 0.0. */
  val genericEmailDomains: Seq[String] =
    Seq("gmail.com", "yahoo.com", "hotmail.com", "outlook.com")
  def emailConfidence(email: Column): Column = {
    val e = coalesce(email, lit(""))
    val ok = e.rlike("^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$")
    val domain = lower(element_at(split(e, "@"), -1))
    when(e === "", 0.0)
      .when(ok && domain.isin(genericEmailDomains: _*), 0.7)
      .when(ok, 0.9)
      .otherwise(0.1)
  }

  /** F12: email false-positive filter (extractors.py:199-203). */
  def emailNotFalsePositive(email: Column): Column =
    !coalesce(email, lit("")).rlike("(?i)example|test|noreply|no-reply")

  /**
   * Per-facility validation columns + overall confidence (mean of present
   * fields) + validity flag — the FacilityValidationReport row shape.
   */
  def withValidation(facilities: DataFrame): DataFrame = {
    val pc = phoneConfidence(col("phone"))
    val ac = addressConfidence(col("address"))
    val ec = emailConfidence(col("email"))
    facilities
      .withColumn("phoneConfidence", pc)
      .withColumn("addressConfidence", ac)
      .withColumn("emailConfidence", ec)
      .withColumn("overallConfidence", round((pc + ac + ec) / 3.0, 4))
      .withColumn("isLikelyValid", pc >= 0.7 && ac >= 0.5)
      .withColumn("flags", filter(array(
        when(pc < 0.7, "low_phone_confidence"),
        when(ac < 0.5, "bad_address_format"),
        when(ec === 0.1, "bad_email_format"),
        when(!emailNotFalsePositive(col("email")), "email_false_positive")),
        f => f.isNotNull))
  }

  /** F7: confidence threshold filter (schema_based_extractor.py:626-631,
    * main_best_practices.py:104-112). */
  def confidenceFilter(validated: DataFrame, minConfidence: Double = 0.6): DataFrame =
    validated.filter(col("overallConfidence") > minConfidence)

  /** A6: validation summary — rate, avg confidence, buckets
    * (free_validation.py:646-699), one aggregate pass. */
  def summary(validated: DataFrame): DataFrame =
    validated.agg(
      count("*").as("total_facilities"),
      sum(when(col("isLikelyValid"), 1L).otherwise(0L)).as("valid_facilities"),
      round(avg("overallConfidence"), 4).as("average_confidence"),
      sum(when(col("overallConfidence") > 0.8, 1L).otherwise(0L)).as("high_confidence"),
      sum(when(col("overallConfidence") > 0.5 && col("overallConfidence") <= 0.8, 1L)
        .otherwise(0L)).as("medium_confidence"),
      sum(when(col("overallConfidence") <= 0.5, 1L).otherwise(0L)).as("low_confidence"))

  /** A6: per-field stats (total, valid, validation rate, avg confidence).
    * ONE aggregate pass — conditional aggregates per field, then a
    * `stack` unpivot — instead of one scan of the (expensive-to-produce)
    * validated frame per field. */
  def fieldStats(validated: DataFrame): DataFrame = {
    val fields = Seq(
      ("phone", col("phoneConfidence"), phoneIsValid(col("phone"))),
      ("address", col("addressConfidence"), addressIsValid(col("address"))),
      ("email", col("emailConfidence"), emailConfidence(col("email")) >= 0.7))
    val aggs = fields.flatMap { case (name, conf, valid) => Seq(
      count("*").as(s"${name}_total"),
      sum(when(valid, 1L).otherwise(0L)).as(s"${name}_valid"),
      round(avg(conf), 4).as(s"${name}_avg"))
    }
    val stackExpr = s"stack(${fields.size}, " + fields.map { case (n, _, _) =>
      s"'$n', ${n}_total, ${n}_valid, ${n}_avg" }.mkString(", ") +
      ") as (field_name, total, valid, avg_confidence)"
    validated.agg(aggs.head, aggs.tail: _*)
      .select(expr(stackExpr))
      .withColumn("validation_rate",
        round(col("valid").cast("double") / col("total"), 4))
  }

  /** A6: flag histogram. */
  def flagDistribution(validated: DataFrame): DataFrame =
    validated.select(explode(col("flags")).as("flag"))
      .groupBy("flag").agg(count("*").as("cnt")).orderBy("flag")
}
