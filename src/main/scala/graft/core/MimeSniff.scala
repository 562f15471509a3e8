package graft.core

import org.apache.spark.unsafe.types.UTF8String

/**
 * MIME sniffing over raw fetched payload bytes (the WHATWG
 * mimesniff magic-number shape, deterministic subset) — the
 * content-type gate a crawler applies before routing a response to the
 * HTML/text pipeline vs the binary/media store vs the discard bin.
 * Sniffing is definitionally a bounded-prefix operation: only the
 * first bytes are examined, so this is one cheap pass per response
 * regardless of payload size.
 *
 * Detection order: binary magic numbers (PNG/JPEG/GIF/WebP/WAV/PDF/
 * ZIP/GZIP) → markup probes after ASCII-whitespace/BOM skip
 * (`<!doctype html`/`<html` → text/html, `<?xml` → application/xml) →
 * NUL/control scan of the first 512 bytes (clean → text/plain, else
 * application/octet-stream).
 */
object MimeSniff {

  private def startsWith(b: Array[Byte], off: Int, sig: Int*): Boolean = {
    if (b.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if ((b(off + i) & 0xFF) != sig(i)) return false
      i += 1
    }
    true
  }

  private def asciiPrefixLower(b: Array[Byte], off: Int, n: Int): String = {
    val len = math.min(n, b.length - off)
    if (len <= 0) return ""
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      val c = b(off + i) & 0xFF
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c.toChar)
      i += 1
    }
    sb.toString
  }

  def sniffName(b: Array[Byte]): String = {
    if (startsWith(b, 0, 0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)) return "image/png"
    if (startsWith(b, 0, 0xFF, 0xD8, 0xFF)) return "image/jpeg"
    if (startsWith(b, 0, 'G', 'I', 'F', '8', '7', 'a') ||
      startsWith(b, 0, 'G', 'I', 'F', '8', '9', 'a')) return "image/gif"
    if (startsWith(b, 0, 'R', 'I', 'F', 'F') && startsWith(b, 8, 'W', 'E', 'B', 'P'))
      return "image/webp"
    if (startsWith(b, 0, 'R', 'I', 'F', 'F') && startsWith(b, 8, 'W', 'A', 'V', 'E'))
      return "audio/wav"
    if (startsWith(b, 0, '%', 'P', 'D', 'F', '-')) return "application/pdf"
    if (startsWith(b, 0, 'P', 'K', 0x03, 0x04)) return "application/zip"
    if (startsWith(b, 0, 0x1F, 0x8B)) return "application/gzip"
    // UTF-16 BOM before the binary scan (WHATWG checks FF FE / FE FF up
    // front): the 0x00 bytes of UTF-16 text would otherwise trip the NUL
    // scan and mislabel BOM'd HTML/text as octet-stream. Probe markup on
    // a UTF-16 decode of the prefix, then default to text/plain.
    val utf16 =
      if (startsWith(b, 0, 0xFF, 0xFE)) "UTF-16LE"
      else if (startsWith(b, 0, 0xFE, 0xFF)) "UTF-16BE"
      else null
    if (utf16 != null) {
      val n16 = math.min(b.length - 2, 64) & ~1
      val head16 = new String(b, 2, n16, java.nio.charset.Charset.forName(utf16))
        .toLowerCase.dropWhile(c => c == ' ' || c == '\t' || c == '\r' || c == '\n')
      if (head16.startsWith("<!doctype html") || head16.startsWith("<html"))
        return "text/html"
      if (head16.startsWith("<?xml")) return "application/xml"
      return "text/plain"
    }
    // markup probes: skip UTF-8 BOM + ASCII whitespace
    var off = if (startsWith(b, 0, 0xEF, 0xBB, 0xBF)) 3 else 0
    while (off < b.length && (b(off) == ' ' || b(off) == '\t' ||
      b(off) == '\r' || b(off) == '\n')) off += 1
    val head = asciiPrefixLower(b, off, 16)
    if (head.startsWith("<!doctype html") || head.startsWith("<html"))
      return "text/html"
    if (head.startsWith("<?xml")) return "application/xml"
    // text vs binary: NUL or C0 control (other than \t\r\n) in first 512
    var i = 0
    val n = math.min(b.length, 512)
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x20 && c != '\t' && c != '\r' && c != '\n') return "application/octet-stream"
      i += 1
    }
    "text/plain"
  }

  /** Codegen entry point. */
  def sniff(b: Array[Byte]): UTF8String = UTF8String.fromString(sniffName(b))
}
