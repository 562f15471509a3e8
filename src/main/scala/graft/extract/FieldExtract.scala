package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.gf

/**
 * Field-level extraction as pure Catalyst column expressions — the
 * reference's regex layer (/root/reference/config.py:117-125 patterns,
 * applied at healthcare_scraper.py:379-450 and
 * schema_based_extractor.py:513-577) plus the reduced CSS-selector classes
 * the shipped schemas actually use (SURVEY.md C25: itemprop spans,
 * tel:/mailto: anchors, class-anchored blocks), compiled to
 * `regexp_extract` trees. Whole-stage-codegen'd; no UDFs.
 */
object FieldExtract {

  // ---- reference regex patterns (config.py:117-125 semantics) ----
  val phonePattern = "(\\(?\\d{3}\\)?[-.\\s]?\\d{3}[-.\\s]?\\d{4})"
  val zipPattern = "(\\d{5}(?:-\\d{4})?)"
  val emailPattern = "([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,})"
  val bedsPattern = "(\\d+)\\s*(?:beds?|bed)"
  val addressPattern = "(\\d+\\s+[A-Za-z0-9\\s,.-]+?(?:Street|St|Avenue|Ave|Road|Rd|Drive|Dr|Lane|Ln|Boulevard|Blvd|Way|Circle|Cir|Court|Ct|Place|Pl))\\b"

  /** empty regexp_extract result → null (reference returns None on miss). */
  def extractOrNull(c: Column, pattern: String, group: Int = 1): Column = {
    val e = regexp_extract(c, pattern, group)
    when(e === "", lit(null)).otherwise(e)
  }

  def phone(text: Column): Column = extractOrNull(text, phonePattern)
  def email(text: Column): Column = extractOrNull(text, emailPattern)
  def zip(text: Column): Column = extractOrNull(text, zipPattern)
  def beds(text: Column): Column = extractOrNull(text, bedsPattern)
  def address(text: Column): Column = extractOrNull(text, addressPattern)

  /** itemprop microdata span, the selector class the shipped CSS schemas
    * target (schema_based_extractor.py:49-298, e.g.
    * span[itemprop='addressLocality']). */
  def itemprop(html: Column, prop: String): Column =
    extractOrNull(html, s"""itemprop="$prop"[^>]*>([^<]+)<""")

  /** a[href^='tel:'] → digits (schema_based_extractor selector class). */
  def telHref(html: Column): Column =
    extractOrNull(html, """href="tel:([0-9+]+)"""")

  /** Phone normalize + format (extractors.py:323-334): strip non-digits,
    * 10 digits → (XXX) XXX-XXXX, 11 digits starting 1 → drop the 1. */
  def phoneNormalize(raw: Column): Column = {
    val d0 = regexp_replace(raw, "[^0-9]", "")
    val d = when(length(d0) === 11 && d0.startsWith("1"), substring(d0, 2, 10)).otherwise(d0)
    when(length(d) === 10, concat(
      lit("("), substring(d, 1, 3), lit(") "),
      substring(d, 4, 3), lit("-"), substring(d, 7, 4)))
      .otherwise(raw)
  }

  /** Phone validity (extractors.py:336-339): 10 digits not starting 0, or
    * 11 starting 1. */
  def phoneValid(raw: Column): Column = {
    val d = regexp_replace(raw, "[^0-9]", "")
    (length(d) === 10 && !d.startsWith("0")) || (length(d) === 11 && d.startsWith("1"))
  }

  /** Full state name → 2-letter code (config.py:128-142 map); already-code
    * input passes through uppercased (extractors.py:341-350). */
  val stateMap: Map[String, String] = Map(
    "alabama" -> "AL", "alaska" -> "AK", "arizona" -> "AZ", "arkansas" -> "AR",
    "california" -> "CA", "colorado" -> "CO", "connecticut" -> "CT", "delaware" -> "DE",
    "florida" -> "FL", "georgia" -> "GA", "hawaii" -> "HI", "idaho" -> "ID",
    "illinois" -> "IL", "indiana" -> "IN", "iowa" -> "IA", "kansas" -> "KS",
    "kentucky" -> "KY", "louisiana" -> "LA", "maine" -> "ME", "maryland" -> "MD",
    "massachusetts" -> "MA", "michigan" -> "MI", "minnesota" -> "MN", "mississippi" -> "MS",
    "missouri" -> "MO", "montana" -> "MT", "nebraska" -> "NE", "nevada" -> "NV",
    "new hampshire" -> "NH", "new jersey" -> "NJ", "new mexico" -> "NM", "new york" -> "NY",
    "north carolina" -> "NC", "north dakota" -> "ND", "ohio" -> "OH", "oklahoma" -> "OK",
    "oregon" -> "OR", "pennsylvania" -> "PA", "rhode island" -> "RI", "south carolina" -> "SC",
    "south dakota" -> "SD", "tennessee" -> "TN", "texas" -> "TX", "utah" -> "UT",
    "vermont" -> "VT", "virginia" -> "VA", "washington" -> "WA", "west virginia" -> "WV",
    "wisconsin" -> "WI", "wyoming" -> "WY")

  private lazy val stateMapCol: Column =
    map(stateMap.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)

  def stateNormalize(s: Column): Column =
    coalesce(element_at(stateMapCol, lower(trim(s))), upper(trim(s)))

  /** city_state_zip split (schema_based_extractor.py:707-713):
    * "City, ST 12345[-6789]" → (city, state, zip). */
  val cityStateZipPattern = "([^,]+),\\s*([A-Z]{2})\\s*(\\d{5}(?:-\\d{4})?)"
  def cityOf(csz: Column): Column = trim(extractOrNull(csz, cityStateZipPattern, 1))
  def stateOf(csz: Column): Column = extractOrNull(csz, cityStateZipPattern, 2)
  def zipOf(csz: Column): Column = extractOrNull(csz, cityStateZipPattern, 3)

  /** C9 line-split address fallback (extractors.py:249-283): the first
    * zip-bearing line yields zip + city/state (comma split, else
    * trailing "City ST" split); street = first line starting with
    * digits. Returns struct(street, city, state, zip) — pure column
    * expressions over the text lines. */
  def addressLines(text: Column): Column = {
    val lines = filter(transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
      l => l =!= "")
    val zipLine = try_element_at(filter(lines, l => l.rlike(zipPattern)), lit(1)) // ANSI: empty → null, not error
    val zipC = extractOrNull(zipLine, zipPattern)
    val noZip = trim(replace(zipLine, zipC, lit("")))
    val parts = transform(split(noZip, ","), p => trim(p))
    val cityState = filter(split(element_at(parts, 1), "\\s+"), s => s =!= "")
    val city = when(size(parts) >= 2, element_at(parts, -2))
      .when(size(parts) === 1 && size(cityState) >= 2,
        concat_ws(" ", slice(cityState, lit(1), greatest(size(cityState) - 1, lit(1)))))
    val state = when(size(parts) >= 2, stateNormalize(element_at(parts, -1)))
      .when(size(parts) === 1 && size(cityState) >= 2,
        stateNormalize(element_at(cityState, -1)))
    val street = try_element_at(filter(lines, l => l.rlike("^\\d+")), lit(1))
    struct(street.as("street"), city.as("city"), state.as("state"), zipC.as("zip"))
  }

  /** Title cleanup (extractors.py:578-580): strip "| Site" / "- Site" tails. */
  def titleClean(title: Column): Column =
    trim(regexp_replace(title, "\\s*[|-].*$", ""))

  /** Key normalization for dedup signatures (deduplicator.py:27-44):
    * lowercase + strip non-word/space. */
  def normKey(s: Column): Column =
    lower(regexp_replace(coalesce(s, lit("")), "[^\\w\\s]", ""))

  /** Array cleanup (extractors.py:417-420): distinct, drop length ≤ 2. */
  def cleanArray(arr: Column): Column =
    array_distinct(filter(arr, x => length(x) > 2))

  /** Record-validity filter (schema_based_extractor.py:731-750): name ≥ 3
    * chars, not a generic word, and at least one location field present. */
  val genericNames: Seq[String] = Seq("home", "about", "contact", "services",
    "locations", "facilities", "search", "menu", "login")
  def validFacility(name: Column, address: Column, city: Column,
                    state: Column, zip: Column): Column =
    name.isNotNull && length(trim(name)) >= 3 &&
      !lower(trim(name)).isin(genericNames: _*) &&
      coalesce(address, city, state, zip).isNotNull

  /**
   * Dedup signatures (deduplicator.py:15-52): md5 hex of normalized phone
   * digits / "address|city|zip" lowercased / normalized name, first 8 hex
   * chars; full = md5 of "phone|addrstr|name". Empty component → ''.
   */
  def phoneSig(phone: Column): Column = {
    val d = regexp_replace(coalesce(phone, lit("")), "[^0-9]", "")
    when(d === "", lit("")).otherwise(substring(md5(d.cast("binary")), 1, 8))
  }
  private def addressStr(address: Column, city: Column, zip: Column): Column =
    concat_ws("|",
      filter(array(lower(trim(coalesce(address, lit("")))),
        lower(trim(coalesce(city, lit("")))),
        lower(trim(coalesce(zip, lit(""))))), s => s =!= ""))
  def addressSig(address: Column, city: Column, zip: Column): Column = {
    val a = addressStr(address, city, zip)
    when(a === "", lit("")).otherwise(substring(md5(a.cast("binary")), 1, 8))
  }
  def nameSig(name: Column): Column = {
    val n = normKey(name)
    when(n === "", lit("")).otherwise(substring(md5(n.cast("binary")), 1, 8))
  }
  def fullSig(phone: Column, address: Column, city: Column, zip: Column,
              name: Column): Column = {
    val d = regexp_replace(coalesce(phone, lit("")), "[^0-9]", "")
    val a = addressStr(address, city, zip)
    val n = normKey(name)
    md5(concat_ws("|", d, a, n).cast("binary"))
  }
}
