package graft.core

import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic HTML → text extraction — the byte-identical invariant
 * operator (BASELINE.json input_hint; reference behavior:
 * BeautifulSoup's `soup.get_text()` at /root/reference/healthcare_scraper.py:364,376).
 *
 * We do NOT reimplement BeautifulSoup; we define an explicit spec and
 * golden-fixture it (SURVEY.md §5.3). Spec:
 *  1. `<script>`/`<style>`/`<template>` elements are dropped whole
 *     (case-insensitive, content included).
 *  2. HTML comments `<!-- … -->` are dropped.
 *  3. Block-level tags (p div br li tr th td h1..h6 ul ol table section
 *     article header footer nav blockquote pre hr title) emit a newline;
 *     all other tags emit nothing.
 *  4. Entities decoded: named amp/lt/gt/quot/apos/nbsp (nbsp → space)
 *     plus numeric `&#NN;` / `&#xHH;` (code points ≤ 0xFFFF).
 *  5. Whitespace: runs of spaces/tabs collapse to one space; spaces
 *     around newlines trimmed; runs of newlines collapse to one '\n';
 *     result trimmed.
 *
 * Single-pass O(n) scanner; no regex, no DOM — this is the hot path at
 * 100 TB of page bytes.
 */
object TextExtractor {

  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p","div","br","li","tr","th","td","h1","h2","h3","h4","h5","h6",
        "ul","ol","table","section","article","header","footer","nav",
        "blockquote","pre","hr","title").foreach(s.add)
    s
  }
  private val dropTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("script","style","template").foreach(s.add)
    s
  }

  private def tagNameAt(html: String, i: Int): (String, Boolean) = {
    // i points at '<'; returns (lowercased tag name, isClosing)
    var j = i + 1
    var closing = false
    if (j < html.length && html.charAt(j) == '/') { closing = true; j += 1 }
    val start = j
    while (j < html.length && (html.charAt(j).isLetterOrDigit)) j += 1
    (html.substring(start, j).toLowerCase(java.util.Locale.ROOT), closing)
  }

  private def appendEntity(html: String, i: Int, out: java.lang.StringBuilder): Int = {
    // i at '&'; returns index after consumed entity, or i+1 if not an entity
    val end = math.min(html.length, i + 10)
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi >= end) { out.append('&'); return i + 1 }
    val body = html.substring(i + 1, semi)
    val rep: Int = body match {
      case "amp"  => '&'
      case "lt"   => '<'
      case "gt"   => '>'
      case "quot" => '"'
      case "apos" => '\''
      case "nbsp" => ' '
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try Integer.parseInt(b.substring(2), 16) catch { case _: NumberFormatException => -1 }
      case b if b.startsWith("#") =>
        try Integer.parseInt(b.substring(1)) catch { case _: NumberFormatException => -1 }
      case _ => -1
    }
    if (rep >= 0 && rep <= 0xFFFF) { out.append(rep.toChar); semi + 1 }
    else { out.append('&'); i + 1 }
  }

  /** Raw pass: tags stripped, entities decoded, '\n' at block boundaries. */
  private def strip(html: String): java.lang.StringBuilder = {
    val out = new java.lang.StringBuilder(html.length / 4)
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val (name, closing) = tagNameAt(html, i)
          if (name.nonEmpty && dropTags.contains(name) && !closing) {
            // skip to matching close tag (no nesting of same raw-text tags in HTML)
            val close = "</" + name
            val e = indexOfIgnoreCase(html, close, i + 1)
            if (e < 0) i = n
            else { val gt = html.indexOf('>', e); i = if (gt < 0) n else gt + 1 }
          } else {
            if (blockTags.contains(name)) out.append('\n')
            val gt = html.indexOf('>', i)
            i = if (gt < 0) n else gt + 1
          }
        }
      } else if (c == '&') {
        i = appendEntity(html, i, out)
      } else {
        out.append(c); i += 1
      }
    }
    out
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i = math.max(from, 0)
    val limit = hay.length - nl
    while (i <= limit) {
      if (hay.regionMatches(true, i, needle, 0, nl)) return i
      i += 1
    }
    -1
  }

  /** Whitespace normalization per spec rule 5. */
  private def normalizeWs(raw: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var pendingSpace = false
    var pendingNewline = false
    var started = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\n' || c == '\r') { pendingNewline = true; pendingSpace = false }
      else if (c == ' ' || c == '\t' || c == '\u000B' || c == '\f') { pendingSpace = true }
      else {
        if (pendingNewline && started) out.append('\n')
        else if (pendingSpace && started) out.append(' ')
        pendingNewline = false; pendingSpace = false; started = true
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** The invariant operator: html string → extracted text. */
  def extractText(html: String): String = {
    if (html == null) return null
    normalizeWs(strip(html))
  }

  // ---- codegen adapters ----
  def extractTextU8(html: UTF8String): UTF8String =
    UTF8String.fromString(extractText(html.toString))
  def extractTextBytes(html: Array[Byte]): UTF8String =
    UTF8String.fromString(extractText(new String(html, java.nio.charset.StandardCharsets.UTF_8)))

  /** zlib ratio of the UTF-8 bytes: compressed/raw, rounded to 6 dp
    * (empty → 1.0). Fixed level 6 + default strategy → deterministic
    * bytes, so the ratio is a stable column value. Boilerplate-heavy
    * text lands well below prose (~0.3–0.6); random-char spam above it. */
  def deflateRatio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      math.rint(total.toDouble / raw.length * 1e6) / 1e6
    } finally d.end()
  }
}
