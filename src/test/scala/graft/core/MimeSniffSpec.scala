package graft.core

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkTestBase
import graft.functions.gf
import org.apache.spark.sql.functions._

class MimeSniffSpec extends SparkTestBase {
  import spark.implicits._

  private def m(b: Array[Byte]) = MimeSniff.sniffName(b)

  test("magic numbers: images, containers, archives") {
    assert(m(Array(0x89.toByte) ++ "PNG\r\n".getBytes(UTF_8) ++
      Array(0x1A.toByte, 0x0A.toByte) ++ "junk".getBytes(UTF_8)) == "image/png")
    assert(m(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)) == "image/jpeg")
    assert(m("GIF89a...".getBytes(UTF_8)) == "image/gif")
    assert(m("RIFF1234WEBPxx".getBytes(UTF_8)) == "image/webp")
    assert(m("RIFF1234WAVExx".getBytes(UTF_8)) == "audio/wav")
    assert(m("%PDF-1.7\n%".getBytes(UTF_8)) == "application/pdf")
    assert(m("PKrest".getBytes(UTF_8)) == "application/zip")
    assert(m(Array(0x1F.toByte, 0x8B.toByte, 8.toByte)) == "application/gzip")
  }

  test("markup probes skip whitespace and BOM, case-insensitive") {
    assert(m("  \r\n\t<!DOCTYPE HTML><html>".getBytes(UTF_8)) == "text/html")
    assert(m("<HtMl lang='en'>".getBytes(UTF_8)) == "text/html")
    assert(m((Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<html>".getBytes(UTF_8))) == "text/html")
    assert(m("<?xml version=\"1.0\"?><rss>".getBytes(UTF_8)) == "application/xml")
  }

  test("text vs binary: NUL/control scan of the first 512 bytes") {
    assert(m("plain words\twith\r\nlines".getBytes(UTF_8)) == "text/plain")
    assert(m("ok".getBytes(UTF_8) ++ Array(0.toByte) ++ "bad".getBytes(UTF_8)) ==
      "application/octet-stream")
    assert(m(Array.empty[Byte]) == "text/plain")
    // truncated magic is not a false positive
    assert(m("GIF8".getBytes(UTF_8)) == "text/plain")
    assert(m("RIFF123".getBytes(UTF_8)) == "text/plain")
  }

  test("UTF-16 BOM'd markup/text sniffs as text, not octet-stream") {
    import java.nio.charset.StandardCharsets.{UTF_16LE, UTF_16BE}
    val le = Array(0xFF.toByte, 0xFE.toByte)
    val be = Array(0xFE.toByte, 0xFF.toByte)
    assert(m(le ++ "<!DOCTYPE html><html>".getBytes(UTF_16LE)) == "text/html")
    assert(m(be ++ "  <html lang=en>".getBytes(UTF_16BE)) == "text/html")
    assert(m(le ++ "<?xml version=\"1.0\"?>".getBytes(UTF_16LE)) == "application/xml")
    assert(m(le ++ "plain utf-16 prose".getBytes(UTF_16LE)) == "text/plain")
    assert(m(be ++ "plain utf-16 prose".getBytes(UTF_16BE)) == "text/plain")
    // a bare FF FE with nothing after is still text (empty payload)
    assert(m(le) == "text/plain")
  }

  test("column expression under codegen") {
    val rows = Seq(
      "image/gif" -> "GIF87a11".getBytes(UTF_8),
      "text/html" -> " <html>".getBytes(UTF_8),
      "text/plain" -> "hello".getBytes(UTF_8))
    val got = rows.toDF("expect", "raw")
      .select(col("expect"), gf.sniff_mime(col("raw")).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
