package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.gf

/**
 * html_table_cells: nested tables own their rows (nearest-ancestor
 * attribution), thead/tbody are transparent, th marks headers,
 * unclosed rows/cells recover identically to well-formed markup, and
 * pages without tables yield empty arrays.
 */
class HtmlTableCellsSpec extends SparkTestBase {
  import spark.implicits._

  private def cells(html: String): Seq[(Int, Int, Int, Boolean, String)] =
    Seq(html).toDF("h")
      .select(explode(gf.html_table_cells(col("h"))).as("c"))
      .select("c.table", "c.row", "c.col", "c.is_header", "c.cell")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getBoolean(3),
        r.getString(4))).toSeq

  test("nested table keeps its rows; outer cell text includes nested text") {
    val html =
      """<table><tr><th>h</th></tr>
        |<tr><td>outer <table><tr><td>inner</td></tr></table></td></tr>
        |</table>""".stripMargin
    val got = cells(html)
    assert(got.contains((0, 0, 0, true, "h")))
    // outer data cell: subtree text includes the nested table's text
    assert(got.contains((0, 1, 0, false, "outer inner")))
    // nested table is table 1 with exactly its own row
    assert(got.contains((1, 0, 0, false, "inner")))
    assert(got.count(_._1 == 1) == 1)
    assert(got.count(_._1 == 0) == 2) // header + one outer data cell
  }

  test("sloppy markup (no </tr>, no </td>) extracts like the well-formed twin") {
    val sloppy = "<table><tbody><tr><td>a<td>b<tr><td>c<td>d</tbody></table>"
    val clean =
      "<table><tbody><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></tbody></table>"
    assert(cells(sloppy) == cells(clean))
    assert(cells(clean) == Seq(
      (0, 0, 0, false, "a"), (0, 0, 1, false, "b"),
      (0, 1, 0, false, "c"), (0, 1, 1, false, "d")))
  }

  test("no tables → empty; mixed th/td in one row indexes by position") {
    assert(cells("<html><body><p>hi</p></body></html>").isEmpty)
    assert(cells("<table><tr><th>k</th><td>v</td></tr></table>") == Seq(
      (0, 0, 0, true, "k"), (0, 0, 1, false, "v")))
  }
}
