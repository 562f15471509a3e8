package graft.core

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal tolerant HTML → element-tree parser, the DOM side of the real
 * CSS-selector engine (SURVEY.md C25; reference behavior:
 * crawl4ai's JsonCssExtractionStrategy over BeautifulSoup trees, used by
 * /root/reference/schema_based_extractor.py:369-417).
 *
 * Deliberately small and deterministic:
 *  - one O(n) scan; attributes parsed with ", ', and unquoted forms;
 *  - `script`/`style`/`template` contents are raw text (skipped — they
 *    contribute neither child elements nor text, matching
 *    [[TextExtractor]]'s drop rule);
 *  - comments and doctypes skipped;
 *  - void elements (br, img, meta, …) and `<x/>` self-closers never
 *    open a scope;
 *  - sloppy-HTML recovery: `<li>` closes an open `<li>`, `<tr>`/`<td>`/
 *    `<th>` close open cells/rows, `<p>` closes an open `<p>`;
 *    a stray `</x>` pops to the nearest open `x` or is ignored;
 *  - entities decoded in text via the same rules as [[TextExtractor]]
 *    (named amp/lt/gt/quot/apos/nbsp + numeric).
 *
 * This parser is for structured extraction (bounded pages, run inside a
 * codegen'd expression); the flat-text hot path stays the DOM-free
 * [[TextExtractor]].
 */
object HtmlDom {

  /** Element node. `children` are elements only; text is kept per-scope
    * in `textParts` (interleaving is irrelevant for selector text). */
  final class Elem(val tag: String, val attrs: Map[String, String]) {
    var parent: Elem = _
    /** 0-based position among the parent's element children. */
    var idx: Int = 0
    val children: ArrayBuffer[Elem] = new ArrayBuffer[Elem](4)
    private[core] val textParts: ArrayBuffer[String] = new ArrayBuffer[String](4)
    /** Document-ordered inline content: String text runs (whitespace-only
      * runs collapsed to " ") interleaved with child Elems. Selector text
      * ignores interleaving; markdown rendering needs it. */
    val nodes: ArrayBuffer[AnyRef] = new ArrayBuffer[AnyRef](4)

    def attr(name: String): Option[String] = attrs.get(name)
    lazy val classes: Set[String] =
      attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)

    /** Whitespace-collapsed, trimmed text of this element's subtree
      * (BeautifulSoup `get_text(strip=True)`-shaped). */
    def text: String = {
      val sb = new java.lang.StringBuilder()
      def walk(e: Elem): Unit = {
        e.textParts.foreach { t => sb.append(t); sb.append(' ') }
        e.children.foreach(walk)
      }
      walk(this)
      sb.toString.replaceAll("\\s+", " ").trim
    }
  }

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val rawTextTags = Set("script", "style", "template")

  /** tags whose open implicitly closes what's on top of the stack. */
  private def impliedClose(opening: String, top: String): Boolean = opening match {
    case "li" => top == "li"
    case "td" | "th" => top == "td" || top == "th"
    case "tr" => top == "tr" || top == "td" || top == "th"
    case "p" => top == "p"
    case "option" => top == "option"
    case _ => false
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val end = math.min(s.length, i + 10)
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi >= end) { out.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val rep: Int = body match {
            case "amp" => '&'; case "lt" => '<'; case "gt" => '>'
            case "quot" => '"'; case "apos" => '\''; case "nbsp" => ' '
            case b if b.startsWith("#x") || b.startsWith("#X") =>
              try Integer.parseInt(b.substring(2), 16) catch { case _: NumberFormatException => -1 }
            case b if b.startsWith("#") =>
              try Integer.parseInt(b.substring(1)) catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (rep >= 0 && rep <= 0xFFFF) { out.append(rep.toChar); i = semi + 1 }
          else { out.append('&'); i += 1 }
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
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

  /** Parse attributes from `html(i until gt)` where i is just past the
    * tag name and gt the index of '>'. */
  private def parseAttrs(html: String, from: Int, to: Int): Map[String, String] = {
    var i = from
    var m = Map.empty[String, String]
    while (i < to) {
      while (i < to && (html.charAt(i).isWhitespace || html.charAt(i) == '/')) i += 1
      val ns = i
      while (i < to && !html.charAt(i).isWhitespace &&
             html.charAt(i) != '=' && html.charAt(i) != '/' ) i += 1
      if (i > ns) {
        val name = html.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
        while (i < to && html.charAt(i).isWhitespace) i += 1
        if (i < to && html.charAt(i) == '=') {
          i += 1
          while (i < to && html.charAt(i).isWhitespace) i += 1
          if (i < to && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i); i += 1
            val vs = i
            while (i < to && html.charAt(i) != q) i += 1
            m += name -> decodeEntities(html.substring(vs, math.min(i, to)))
            if (i < to) i += 1
          } else {
            val vs = i
            while (i < to && !html.charAt(i).isWhitespace && html.charAt(i) != '/') i += 1
            m += name -> decodeEntities(html.substring(vs, i))
          }
        } else m += name -> ""
      } else i += 1
    }
    m
  }

  /** Parse `html` into a synthetic root element (tag "#root"). */
  def parse(html: String): Elem = {
    val root = new Elem("#root", Map.empty)
    if (html == null) return root
    val stack = new ArrayBuffer[Elem](16)
    stack += root
    def top = stack(stack.length - 1)
    def appendText(t: String): Unit =
      if (t.exists(!_.isWhitespace)) {
        val d = decodeEntities(t)
        top.textParts += d
        top.nodes += d
      } else if (t.nonEmpty) {
        // whitespace-only run: keep a single-space node so inline
        // neighbors ("<b>a</b> <i>b</i>") stay separated in markdown
        top.nodes += " "
      }
    def push(e: Elem): Unit = {
      e.parent = top; e.idx = top.children.length
      top.children += e; top.nodes += e; stack += e
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { appendText(html.substring(i)); i = n }
      else {
        if (lt > i) appendText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val e = html.indexOf("-->", lt + 4)
          i = if (e < 0) n else e + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val gt = html.indexOf('>', lt) // doctype / PI
          i = if (gt < 0) n else gt + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val gt = html.indexOf('>', lt)
          if (gt < 0) i = n
          else {
            val name = html.substring(lt + 2, gt).trim.toLowerCase(java.util.Locale.ROOT)
            // pop to nearest matching open tag; ignore if none
            val at = stack.lastIndexWhere(_.tag == name)
            if (at > 0) stack.remove(at, stack.length - at)
            i = gt + 1
          }
        } else {
          var j = lt + 1
          val ns = j
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
          val name = html.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          val gt = html.indexOf('>', lt)
          if (name.isEmpty || gt < 0) { if (gt < 0) i = n else i = gt + 1 }
          else {
            val selfClosed = html.charAt(gt - 1) == '/'
            while (stack.length > 1 && impliedClose(name, top.tag))
              stack.remove(stack.length - 1)
            val e = new Elem(name, parseAttrs(html, j, if (selfClosed) gt - 1 else gt))
            if (rawTextTags.contains(name) && !selfClosed) {
              // raw-text element: attach node, skip content to its close
              e.parent = top; e.idx = top.children.length; top.children += e; top.nodes += e
              val close = "</" + name
              val ce = indexOfIgnoreCase(html, close, gt + 1)
              if (ce < 0) i = n
              else { val g2 = html.indexOf('>', ce); i = if (g2 < 0) n else g2 + 1 }
            } else {
              if (voidTags.contains(name) || selfClosed) {
                e.parent = top; e.idx = top.children.length; top.children += e; top.nodes += e
              } else push(e)
              i = gt + 1
            }
          }
        }
        if (i <= lt) i = lt + 1 // safety: always advance
      }
    }
    root
  }

  /** All elements under (excluding) `root` in document order. */
  def documentOrder(root: Elem): ArrayBuffer[Elem] = {
    val out = new ArrayBuffer[Elem](64)
    def walk(e: Elem): Unit = e.children.foreach { c => out += c; walk(c) }
    walk(root)
    out
  }
}
