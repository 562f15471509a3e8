package graft.core

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.spark.unsafe.types.UTF8String

/**
 * Charset sniffing + decoding for raw fetched page bytes — the step a
 * crawler MUST run before any text operator (the real web is a few
 * percent non-UTF-8; the reference inherits this from crawl4ai's
 * response decoding, and a 100 TB crawl cannot assume UTF-8).
 *
 * Detection order (the WHATWG encoding-sniffing shape):
 *   1. BOM: EF BB BF → utf-8; FF FE → utf-16le; FE FF → utf-16be.
 *   2. `<meta charset=...>` / `content="...; charset=..."` in the first
 *      1024 bytes, scanned ASCII-compatibly (works under any
 *      ASCII-superset encoding — exactly why HTML requires the meta
 *      within the first 1 KiB).
 *   3. UTF-8 validation over the payload: valid → utf-8.
 *   4. Fallback: windows-1252 (the WHATWG default for unlabeled
 *      non-UTF-8 bytes).
 *
 * [[decode]] strips the BOM before decoding so the round trip
 * (original text → encode+wrap → sniff+decode) is byte-identical —
 * q98's oracle contract. Both kernels are single-pass, allocation-free
 * until the final string, and codegen'd as static calls.
 */
object CharsetSniff {

  private val Win1252 = Charset.forName("windows-1252")

  private def hasBom(b: Array[Byte]): Int = {
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
      b(2) == 0xBF.toByte) 3 // utf-8
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte) 1 // utf-16le
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) 2 // utf-16be
    else 0
  }

  /** ASCII-compatible scan of the first 1024 bytes for a meta charset
    * declaration; returns the lowercased label or null. The `charset=`
    * scan is anchored INSIDE `<meta ...>` tags only (WHATWG restricts
    * the prescan to meta tags) — a stray "charset=" in visible text, a
    * query string, or a comment must not override UTF-8 detection. */
  private def metaCharset(b: Array[Byte]): String = {
    val n = math.min(b.length, 1024)
    val head = new String(b, 0, n, StandardCharsets.ISO_8859_1).toLowerCase
    val metaTag = "<meta[^>]*>".r
    val m1 = "charset\\s*=\\s*[\"']?([a-z0-9_-]+)".r
    metaTag.findAllMatchIn(head)
      .flatMap(t => m1.findFirstMatchIn(t.matched).map(_.group(1)))
      .nextOption().orNull
  }

  /** Strict UTF-8 validity check, single pass, no allocation. */
  private def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else {
        val len =
          if (c >= 0xC2 && c <= 0xDF) 2
          else if (c >= 0xE0 && c <= 0xEF) 3
          else if (c >= 0xF0 && c <= 0xF4) 4
          else return false
        if (i + len > n) return false
        var j = 1
        while (j < len) {
          if ((b(i + j) & 0xC0) != 0x80) return false
          j += 1
        }
        i += len
      }
    }
    true
  }

  private def canonical(label: String): String = label match {
    case "utf8" | "utf-8"                  => "utf-8"
    case "utf-16le" | "utf16le"            => "utf-16le"
    case "utf-16be" | "utf16be"            => "utf-16be"
    case "latin1" | "latin-1" | "iso8859-1" | "iso-8859-1" => "iso-8859-1"
    case "windows-1252" | "cp1252"         => "windows-1252"
    case other                             => other
  }

  /** Detected charset label (lowercase canonical). */
  def sniff(b: Array[Byte]): UTF8String = UTF8String.fromString(sniffName(b))

  def sniffName(b: Array[Byte]): String = hasBom(b) match {
    case 3 => "utf-8"
    case 1 => "utf-16le"
    case 2 => "utf-16be"
    case _ =>
      val meta = metaCharset(b)
      if (meta != null) canonical(meta)
      else if (isValidUtf8(b)) "utf-8"
      else "windows-1252"
  }

  /** Sniff, strip any BOM, decode. Unknown labels fall back through the
    * JDK charset registry, then windows-1252 (never throws on lookup). */
  def decode(b: Array[Byte]): UTF8String = {
    val name = sniffName(b)
    val bomLen = hasBom(b) match {
      case 3 => 3
      case 1 | 2 => 2
      case _ => 0
    }
    val cs = name match {
      case "utf-8"        => StandardCharsets.UTF_8
      case "utf-16le"     => StandardCharsets.UTF_16LE
      case "utf-16be"     => StandardCharsets.UTF_16BE
      case "iso-8859-1"   => StandardCharsets.ISO_8859_1
      case "windows-1252" => Win1252
      case other =>
        try Charset.forName(other) catch { case _: Exception => Win1252 }
    }
    UTF8String.fromString(new String(b, bomLen, b.length - bomLen, cs))
  }
}
