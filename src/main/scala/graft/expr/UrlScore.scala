package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * URL score as ONE codegen'd expression node — identical semantics to the
 * reference's URLScorer (/root/reference/url_scorer.py:44-115, weights
 * /root/reference/crawl_config.py:60-76) and to the column-tree form it
 * replaces (both are pinned by the url_scores.json reference fixture).
 *
 * Why an expression and not a when/rlike column tree: the tree is ~100
 * Catalyst nodes and appears several times per crawl-round plan; at
 * small round sizes Catalyst analysis of those trees IS the serial
 * driver floor that caps wall-clock scaling (BASELINE.md round-1
 * finding). One node keeps the semantics and shrinks every round plan.
 *
 * `base` is nullable (null → depth 0, like the reference's base=None).
 */
case class UrlScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.requireString(prettyName, left, right)
  override def prettyName: String = "url_score"
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val u = left.eval(input)
    if (u == null) null
    else {
      val b = right.eval(input)
      UrlScore.scoreU8(u.asInstanceOf[UTF8String],
        if (b == null) null else b.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        ${r.code}
        ${ev.value} = graft.expr.UrlScore.scoreU8(${l.value},
          ${r.isNull} ? null : ${r.value});
      }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlScore =
    copy(left = l, right = r)
}

object UrlScore {

  // compiled once per JVM — same Java-regex semantics as the rlike forms
  private val pathRe = java.util.regex.Pattern.compile(
    "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)")
  private val facilityRe = java.util.regex.Pattern.compile(
    "/location[s]?/|/facilit(y|ies)/|/communit(y|ies)/|/center[s]?/|/find.*location|/directory/")
  private val negativeRe = java.util.regex.Pattern.compile(
    "/career[s]?/|/job[s]?/|/news/|/blog/|/investor[s]?/|/press/|/media/|\\.pdf$")
  private val docExtRe = java.util.regex.Pattern.compile(
    "\\.(pdf|doc|docx|xls|xlsx)$")

  /** keyword → weight (crawl_config.py:61-73), matched on the whole
    * lowercased url. */
  private val keywords: Array[(String, Int)] = Array(
    "locations" -> 10, "facilities" -> 10, "communities" -> 8,
    "directory" -> 8, "find" -> 5, "search" -> 5, "our" -> 3,
    "contact" -> -5, "about" -> -5, "careers" -> -10, "news" -> -10)

  private def pathOf(url: String): String = {
    val m = pathRe.matcher(url)
    if (m.find()) m.group(1) else ""
  }

  private def queryOf(url: String): String = {
    val qi = url.indexOf('?')
    if (qi < 0) return ""
    val hi = url.indexOf('#', qi)
    if (hi < 0) url.substring(qi + 1) else url.substring(qi + 1, hi)
  }

  private def segments(path: String): Int = {
    var n = 0
    var i = 0
    var segLen = 0
    while (i < path.length) {
      if (path.charAt(i) == '/') { if (segLen > 0) n += 1; segLen = 0 }
      else segLen += 1
      i += 1
    }
    if (segLen > 0) n += 1
    n
  }

  /** url_scorer.py:103-115: segment-count difference; base null → 0. */
  def depth(url: String, base: String): Int =
    if (base == null) 0
    else segments(pathOf(url)) - segments(pathOf(base))

  /** url_scorer.py:46-101 score. */
  def score(url: String, base: String): Double = {
    val d = depth(url, base)
    if (d > 3) return -100.0
    val path = pathOf(url).toLowerCase(java.util.Locale.ROOT)
    val query = queryOf(url).toLowerCase(java.util.Locale.ROOT)
    val urlLower = url.toLowerCase(java.util.Locale.ROOT)
    var s = -d * 2
    if (facilityRe.matcher(path).find() || facilityRe.matcher(query).find()) s += 20
    if (negativeRe.matcher(path).find()) s -= 50
    var i = 0
    while (i < keywords.length) {
      if (urlLower.contains(keywords(i)._1)) s += keywords(i)._2
      i += 1
    }
    if (path.contains("/our-") && (path.contains("location") ||
        path.contains("facilities") || path.contains("communities"))) s += 15
    if (query.contains("page=") || path.contains("/page/")) s += 5
    if (docExtRe.matcher(path).find()) s -= 30
    s.toDouble
  }

  def scoreU8(url: UTF8String, base: UTF8String): Double =
    score(url.toString, if (base == null) null else base.toString)
}
