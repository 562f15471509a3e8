package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{CssSelector, HtmlDom}

/** Driver-compiled selector bundle shipped to executors as one codegen
  * reference object (top-level class: its name must be valid Java source
  * in generated code). */
final class CompiledCss(val base: CssSelector.Selector,
                        val fields: Array[CssSelector.Selector]) extends Serializable

/**
 * Real CSS-selector extraction expressions (SURVEY.md C25; reference:
 * JsonCssExtractionStrategy schemas applied in
 * /root/reference/schema_based_extractor.py:369-417):
 *
 *  - `css_select_all(html, selector)` → array<string>: whitespace-
 *    collapsed text of every match, document order.
 *  - `css_extract(html, baseSelector, fieldSel1, …)` →
 *    array<struct<f0:string, …>>: one struct per base-element match;
 *    each field is the text of the field selector's FIRST match inside
 *    that base element's subtree (null if absent) — the reference
 *    schema shape: one record per facility card, one column per field.
 *
 * Selector arguments must be foldable (schemas are config, not data) —
 * compiled ONCE per expression instance on the driver and shipped to
 * executors as a reference object; codegen is a static kernel call, so
 * the surrounding projection stays whole-stage-compiled. Cost is one
 * [[HtmlDom]] DOM per row per expression — the same embarrassingly-
 * parallel per-page shape as html_probe, zero shuffle.
 */
case class CssSelectAll(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "css_select_all"
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(s"html must be STRING, got ${left.dataType.sql}")
    else if (!right.foldable || !right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure("selector must be a STRING literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val compiled: CompiledCss = new CompiledCss(
    CssSelector.compile(right.eval().asInstanceOf[UTF8String].toString),
    Array.empty)

  override protected def nullSafeEval(html: Any, sel: Any): Any =
    CssSelect.selectTexts(html.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cssSelector", compiled, "graft.expr.CompiledCss")
    defineCodeGen(ctx, ev, (h, _) => s"graft.expr.CssSelect.selectTexts($h, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CssSelectAll =
    copy(l, r)
}

/** `css_attr_all(html, selector, attrName)` → array<string>: the named
  * attribute's value for every selector match IN DOCUMENT ORDER,
  * matches lacking the attribute skipped — the attribute half of a
  * scraping schema (`link[rel=canonical]`/href, `meta[property="og:url"]`
  * /content, `img`/src …) that [[CssSelectAll]]'s text extraction can't
  * express. Selector and attribute must be literals (compiled once on
  * the driver, static-call codegen like [[CssSelectAll]]). */
case class CssAttrAll(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "css_attr_all"
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (!first.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(s"html must be STRING, got ${first.dataType.sql}")
    else if (Seq(second, third).exists(s => !s.foldable || !s.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckFailure("selector and attribute must be STRING literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val compiled: CompiledCss = new CompiledCss(
    CssSelector.compile(second.eval().asInstanceOf[UTF8String].toString),
    Array.empty)
  private lazy val attrName: String = {
    val a = third.eval().asInstanceOf[UTF8String].toString
    require(a.matches("[A-Za-z0-9:_-]+"), s"invalid attribute name '$a'")
    a
  }

  override protected def nullSafeEval(html: Any, sel: Any, attr: Any): Any =
    CssSelect.selectAttrs(html.asInstanceOf[UTF8String], compiled, attrName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cssSelector", compiled, "graft.expr.CompiledCss")
    defineCodeGen(ctx, ev, (h, _, _) =>
      s"""graft.expr.CssSelect.selectAttrs($h, $ref, "$attrName")""")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CssAttrAll = copy(f, s, t)
}

case class CssExtract(children: Seq[Expression]) extends Expression {
  require(children.length >= 3,
    "css_extract(html, baseSelector, fieldSelector1, ...)")
  private def html: Expression = children.head
  private def selArgs: Seq[Expression] = children.tail

  override def nullable: Boolean = true
  override def prettyName: String = "css_extract"
  override def dataType: DataType = ArrayType(
    StructType(selArgs.tail.indices.map(i => StructField(s"f$i", StringType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!html.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(s"html must be STRING, got ${html.dataType.sql}")
    else if (selArgs.exists(s => !s.foldable || !s.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckFailure("selectors must be STRING literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val compiled: CompiledCss = new CompiledCss(
    CssSelector.compile(selArgs.head.eval().asInstanceOf[UTF8String].toString),
    selArgs.tail.map(s =>
      CssSelector.compile(s.eval().asInstanceOf[UTF8String].toString)).toArray)

  override def eval(input: InternalRow): Any = {
    val h = html.eval(input)
    if (h == null) null
    else CssSelect.extract(h.asInstanceOf[UTF8String], compiled)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cssExtract", compiled, "graft.expr.CompiledCss")
    val h = html.genCode(ctx)
    ev.copy(code =
      code"""
        ${h.code}
        boolean ${ev.isNull} = ${h.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.expr.CssSelect.extract(${h.value}, $ref);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CssExtract = copy(newChildren)
}

object CssSelect {

  /** array<string> of match texts, document order. */
  def selectTexts(html: UTF8String, sel: CompiledCss): GenericArrayData = {
    val root = HtmlDom.parse(html.toString)
    new GenericArrayData(
      sel.base.select(root).map(e => UTF8String.fromString(e.text)).toArray[Any])
  }

  /** array<string> of the named attribute over matches, document order;
    * matches lacking the attribute are skipped. */
  def selectAttrs(html: UTF8String, sel: CompiledCss, attr: String): GenericArrayData = {
    val root = HtmlDom.parse(html.toString)
    new GenericArrayData(
      sel.base.select(root).flatMap(_.attr(attr))
        .map(UTF8String.fromString).toArray[Any])
  }

  /** array<struct<f0..fn:string>>: per base match, first-match text per
    * field selector within the base element's subtree (null if none). */
  def extract(html: UTF8String, css: CompiledCss): GenericArrayData = {
    val root = HtmlDom.parse(html.toString)
    val rows = css.base.select(root).map { b =>
      val vals = new Array[Any](css.fields.length)
      val scope = HtmlDom.documentOrder(b)
      var i = 0
      while (i < css.fields.length) {
        val hit = scope.find(css.fields(i).matches)
        vals(i) = hit.map(e => UTF8String.fromString(e.text)).orNull
        i += 1
      }
      InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
    }
    new GenericArrayData(rows.toArray[Any])
  }
}
