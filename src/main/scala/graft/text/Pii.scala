package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection + redaction over a text column — the scrubbing stage a
 * webtext training pipeline runs before anything leaves the cluster
 * (the pattern-and-replacement-token approach of the public BigScience
 * ROOTS / Dolma pipelines). Four pattern families, each a pure
 * `regexp_extract_all` / `regexp_replace` column expression (codegen'd,
 * one text pass per pattern, no UDFs):
 *
 *   email  → <EMAIL>    ssn → <SSN>    phone → <PHONE>    ipv4 → <IP>
 *
 * Patterns deliberately use only RE2-portable syntax (char classes,
 * bounded repeats, `\b`) so the DuckDB oracle runs the IDENTICAL
 * pattern strings — redacted output is byte-identical across engines.
 * Redaction order is fixed (email, ssn, phone, ip) and matters: it is
 * applied to the output of the previous replacement in both engines.
 * SSN (3-2-4) is replaced before phone (3-3-4); the group widths make
 * the two patterns disjoint, but order still pins the semantics.
 */
object Pii {

  /** (name, pattern, replacement token) in redaction order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  private def patternOf(name: String): String =
    patterns.find(_._1 == name).get._2

  /** Match count for one pattern family. */
  def count(text: Column, name: String): Column =
    size(regexp_extract_all(text, lit(patternOf(name)), lit(0))).cast("long")

  /** Text with every pattern family replaced by its token, in order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (_, re, tok)) =>
      regexp_replace(t, re, tok)
    }

  /** True iff the text contains any detectable PII. */
  def hasPii(text: Column): Column =
    patterns.map { case (name, _, _) => count(text, name) > 0 }
      .reduce(_ || _)
}
