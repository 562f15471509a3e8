package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** [[ExtractForms]] kernel semantics against the reference's BeautifulSoup
  * walk (navigation.py:184-220): action/method defaults, field inventory
  * with the select→'text' type quirk, required as attribute presence. */
class ExtractFormsSpec extends AnyFunSuite {

  private def rows(html: String) = ExtractForms.forms(html).map { r =>
    val fields = r.getArray(3)
    (Option(r.getUTF8String(0)).map(_.toString),
      r.getUTF8String(1).toString,
      r.getUTF8String(2).toString,
      (0 until fields.numElements()).map { i =>
        val f = fields.getStruct(i, 3)
        (f.getUTF8String(0).toString, f.getUTF8String(1).toString, f.getBoolean(2))
      })
  }

  test("forms emit in document order with defaults and field inventory") {
    val html =
      """<html><body>
        |<form action="/find" method="POST">
        |  <label>Find a location</label>
        |  <input name="zip" type="text" required>
        |  <div><input name="radius" type="hidden"></div>
        |  <select name="state"><option>CA</option></select>
        |</form>
        |<form>
        |  <p>sign up</p>
        |  <input type="email">
        |</form>
        |</body></html>""".stripMargin
    val got = rows(html)
    assert(got.size == 2)
    val (a, m, t, fs) = got.head
    assert(a.contains("/find") && m == "post")
    assert(t == "Find a location CA")
    // nested input found (descendants, not children); select type defaults
    // to 'text' (the reference's input_elem.get('type','text') quirk)
    assert(fs == Seq(("zip", "text", true), ("radius", "hidden", false),
      ("state", "text", false)))
    val (a2, m2, _, fs2) = got(1)
    assert(a2.isEmpty && m2 == "get") // action absent → null, method default
    assert(fs2 == Seq(("", "email", false))) // name defaults to ""
  }

  test("formless pages and null input emit nothing") {
    assert(rows("<html><body><p>no forms</p></body></html>").isEmpty)
    assert(rows("").isEmpty)
  }
}
