package graft.core

import java.nio.charset.{Charset, StandardCharsets}

import graft.SparkTestBase
import graft.functions.gf
import org.apache.spark.sql.functions._

class CharsetSniffSpec extends SparkTestBase {
  import spark.implicits._

  private def s(x: Array[Byte]) = CharsetSniff.sniffName(x)
  private def d(x: Array[Byte]) = CharsetSniff.decode(x).toString

  test("BOM detection wins over everything and is stripped on decode") {
    val t = "hi \u00E9!"
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ t.getBytes(StandardCharsets.UTF_16LE)
    val be = Array(0xFE.toByte, 0xFF.toByte) ++ t.getBytes(StandardCharsets.UTF_16BE)
    val u8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ t.getBytes(StandardCharsets.UTF_8)
    assert(s(le) == "utf-16le" && d(le) == t)
    assert(s(be) == "utf-16be" && d(be) == t)
    assert(s(u8) == "utf-8" && d(u8) == t)
  }

  test("meta charset within the first 1 KiB, ASCII-compatible scan, label canonicalized") {
    val latin = "<html><head><meta charset='LATIN1'></head><body>caf\u00E9</body></html>"
    val b = latin.getBytes(StandardCharsets.ISO_8859_1)
    assert(s(b) == "iso-8859-1" && d(b) == latin)
    val httpEquiv = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"></head><body>\u201Cq\u201D</body></html>")
    val wb = httpEquiv.getBytes(Charset.forName("windows-1252"))
    assert(s(wb) == "windows-1252" && d(wb) == httpEquiv)
  }

  test("unlabeled: valid UTF-8 detected, invalid falls back to windows-1252") {
    val u8 = "no meta caf\u00E9".getBytes(StandardCharsets.UTF_8)
    assert(s(u8) == "utf-8" && d(u8) == "no meta caf\u00E9")
    // lone 0xE9 is invalid UTF-8 → windows-1252, which maps it to \u00E9
    val cp = "no meta caf\u00E9".getBytes(StandardCharsets.ISO_8859_1)
    assert(s(cp) == "windows-1252" && d(cp) == "no meta caf\u00E9")
    // windows-1252-specific: 0x93/0x94 smart quotes
    val sq = "\u201Chi\u201D".getBytes(Charset.forName("windows-1252"))
    assert(s(sq) == "windows-1252" && d(sq) == "\u201Chi\u201D")
  }

  test("truncated multibyte tails are invalid, not crashes") {
    val cut = "caf\u00E9".getBytes(StandardCharsets.UTF_8).dropRight(1)
    assert(s(cut) == "windows-1252")
    assert(d(cut).nonEmpty)
    assert(s(Array.empty[Byte]) == "utf-8" && d(Array.empty[Byte]) == "")
  }

  test("charset= outside a <meta> tag never overrides UTF-8 detection") {
    // stray charset= in visible text, a query string, and a comment —
    // WHATWG restricts the prescan to meta tags (ADVICE round 3)
    val strays = Seq(
      "<html><body>set charset=latin1 in your config</body></html>",
      "<html><a href=\"/x?charset=windows-1252\">link</a>caf\u00e9</html>",
      "<!-- charset=iso-8859-1 --><html><body>caf\u00e9</body></html>")
    strays.foreach { h =>
      val b = h.getBytes(StandardCharsets.UTF_8)
      assert(s(b) == "utf-8", h)
      assert(d(b) == h, h)
    }
    // but the same label INSIDE a meta tag still wins
    val metaB = "<meta http-equiv=x content=\"charset=latin1\">caf\u00e9"
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(s(metaB) == "iso-8859-1")
  }

  test("column expressions round-trip all five q98 encodings under codegen") {
    val t = "body caf\u00E9 text"
    val rows = Seq(
      ("utf-8", ("<meta charset=\"utf-8\">" + t).getBytes(StandardCharsets.UTF_8)),
      ("utf-16le", Array(0xFF.toByte, 0xFE.toByte) ++ t.getBytes(StandardCharsets.UTF_16LE)),
      ("utf-16be", Array(0xFE.toByte, 0xFF.toByte) ++ t.getBytes(StandardCharsets.UTF_16BE)),
      ("iso-8859-1",
        ("<meta charset=\"iso-8859-1\">" + t).getBytes(StandardCharsets.ISO_8859_1)),
      ("utf-8", t.getBytes(StandardCharsets.UTF_8)))
    val got = rows.toDF("expect", "raw")
      .select(col("expect"), gf.sniff_charset(col("raw")).as("cs"),
        gf.sniff_decode(col("raw")).as("txt"))
      .collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getString(2).endsWith(t))
    }
  }
}
