package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-column link Generator: one pass over raw HTML emitting a row per
 * `<a href=...>` anchor — (href, anchor_text, rel). The reference walks
 * `soup.find_all('a', href=True)` and classifies links by their TEXT as
 * well as their href (/root/reference/healthcare_scraper.py:187-198), so
 * href-only extraction loses half of the F3 facility-link heuristic.
 *
 * Spec (deterministic, documented — not a BeautifulSoup port):
 *  - an anchor starts at `<a` followed by whitespace or '>'; its
 *    attribute region runs to the first '>'
 *  - `href`/`rel` are parsed as `attr="…"` or `attr='…'` inside that
 *    region; anchors without href are skipped (find_all(href=True))
 *  - anchor_text = characters between the '>' and the first `</a>`
 *    (end-of-input if unterminated), inner tags stripped, whitespace
 *    runs collapsed to one space, trimmed (get_text(strip=True) shape)
 *  - rel is null when absent
 */
case class ExtractLinks(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("href", StringType),
    StructField("anchor_text", StringType),
    StructField("rel", StringType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_links expects STRING or BINARY, got ${child.dataType.sql}")

  override def prettyName: String = "extract_links"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v match {
        case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
        case u: UTF8String => u.toString
      }
      ExtractLinks.links(s)
    }
  }

  override protected def withNewChildInternal(c: Expression): ExtractLinks = copy(c)
}

object ExtractLinks {

  /** attr="…" / attr='…' inside [from, to), or null. */
  private def attr(s: String, name: String, from: Int, to: Int): String = {
    val pat = name + "="
    var i = s.indexOf(pat, from)
    while (i >= 0 && i < to) {
      val q = i + pat.length
      if (q < to && (s.charAt(q) == '"' || s.charAt(q) == '\'')) {
        val quote = s.charAt(q)
        val e = s.indexOf(quote, q + 1)
        if (e >= 0 && e <= to) return s.substring(q + 1, e)
      }
      i = s.indexOf(pat, i + 1)
    }
    null
  }

  /** Strip inner tags + collapse whitespace + trim. */
  private def cleanText(s: String, from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    var pendingSpace = false
    var started = false
    while (i < to) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i)
        i = if (gt < 0 || gt >= to) to else gt + 1
        pendingSpace = pendingSpace || started
      } else {
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
        else {
          if (pendingSpace && started) sb.append(' ')
          pendingSpace = false; started = true
          sb.append(c)
        }
        i += 1
      }
    }
    sb.toString
  }

  private def u8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  def links(s: String): Seq[InternalRow] = {
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var i = s.indexOf("<a")
    while (i >= 0) {
      val after = i + 2
      val ok = after < s.length && {
        val c = s.charAt(after)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '>' || c == '/'
      }
      if (ok) {
        val gt = s.indexOf('>', i)
        if (gt < 0) return out.toSeq
        val href = attr(s, "href", i, gt)
        if (href != null) {
          val rel = attr(s, "rel", i, gt)
          val close = s.indexOf("</a>", gt + 1)
          val end = if (close < 0) s.length else close
          out += new GenericInternalRow(Array[Any](
            u8(href), u8(cleanText(s, gt + 1, end)), u8(rel)))
        }
        i = s.indexOf("<a", gt + 1)
      } else {
        i = s.indexOf("<a", i + 1)
      }
    }
    out.toSeq
  }
}
