package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.HtmlDom

/**
 * Form Generator over the REAL DOM: one row per `<form>` element —
 * (action, method, form_text, fields). The search-endpoint half of the
 * reference's navigation discovery (`navigation.py:184-220`): it walks
 * `soup.find_all('form')`, reads `action`/`method`, keyword-classifies
 * the form's text, and inventories `input`/`select` fields into
 * `NavigationResult.search_endpoints` (`navigation.py:28`).
 *
 * Spec (matches the reference's BeautifulSoup semantics, re-derived):
 *  - every `form` element in document order (nested forms, though
 *    invalid HTML, each emit their own row — find_all behavior);
 *  - `action` is null when the attribute is absent (the caller applies
 *    the `urljoin(base, action) if action else base` resolve rule —
 *    navigation.py:203);
 *  - `method` = the attribute lowercased, default "get"
 *    (`form.get('method', 'get').lower()` — navigation.py:196);
 *  - `form_text` = whitespace-collapsed subtree text ([[HtmlDom.Elem.text]],
 *    BeautifulSoup `get_text()` shape) — the keyword classifier input;
 *  - `fields` = the form's `input`/`select` DESCENDANTS in document
 *    order as (name, type, required): name defaults to "", type to
 *    "text" — including for `select` elements, which is the reference's
 *    own `input_elem.get('type', 'text')` quirk (navigation.py:212) —
 *    and required = attribute presence (`has_attr` — navigation.py:214).
 *
 * The classifier itself (location keywords in the lowercased text) stays
 * a Column predicate in the caller — the Generator is general-purpose.
 */
case class ExtractForms(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("method", StringType),
    StructField("form_text", StringType),
    StructField("fields", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("required", BooleanType)))))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_forms expects STRING or BINARY, got ${child.dataType.sql}")

  override def prettyName: String = "extract_forms"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v match {
        case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
        case u: UTF8String => u.toString
      }
      ExtractForms.forms(s)
    }
  }

  override protected def withNewChildInternal(c: Expression): ExtractForms = copy(c)
}

object ExtractForms {

  private def u8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  def forms(html: String): Seq[InternalRow] = {
    val root = HtmlDom.parse(html)
    HtmlDom.documentOrder(root).iterator.filter(_.tag == "form").map { f =>
      val fields = HtmlDom.documentOrder(f).iterator
        .filter(e => e.tag == "input" || e.tag == "select")
        .map { e =>
          new GenericInternalRow(Array[Any](
            u8(e.attr("name").getOrElse("")),
            u8(e.attr("type").getOrElse("text")),
            e.attrs.contains("required")))
        }.toArray[Any]
      new GenericInternalRow(Array[Any](
        u8(f.attr("action").orNull),
        u8(f.attr("method").getOrElse("get").toLowerCase(java.util.Locale.ROOT)),
        u8(f.text),
        new GenericArrayData(fields)))
    }.toSeq
  }
}
