package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic HTML → Markdown rendering over [[HtmlDom]] — the
 * reference's primary page representation: its LLM paths consume
 * crawl4ai's `result.markdown` (e.g.
 * /root/reference/hybrid_llm_navigator.py:215,435), produced by the
 * crawl4ai DefaultMarkdownGenerator (html2text-style). This is a
 * from-scratch renderer over the in-house DOM, not a port: rules are
 * fixed and engine-portable so results pin as golden fixtures.
 *
 * Rendering rules (CommonMark-flavored, whitespace-normalized):
 *  - `script/style/template/noscript/iframe/svg/head` subtrees dropped;
 *  - `h1..h6` → `#`×n heading blocks;
 *  - block containers (`p/div/section/article/...`) flush interleaved
 *    inline runs as paragraphs (HtmlDom keeps text/child order in
 *    `nodes`);
 *  - `a` → `[text](href)` (text falls back to href; no-href anchors
 *    render bare text); `img` → `![alt](src)`;
 *  - `strong/b` → `**…**`, `em/i` → `*…*`, inline `code` → `` `…` ``;
 *  - `ul/ol/li` → `- ` / `1. ` items, nested lists indented two spaces;
 *  - `blockquote` → every line prefixed `> `;
 *  - `pre` → fenced code block, inner text verbatim (no collapsing);
 *  - `table/tr/td/th` → pipe table with a `---` header separator;
 *  - `hr` → `---`; `br` → hard line break inside its paragraph;
 *  - all inline text whitespace-collapsed; blocks joined by blank lines.
 *
 * `fit = true` additionally drops `nav/header/footer/aside/form/button/
 * select/option` chrome subtrees before rendering — crawl4ai's
 * "fit_markdown" (pruned) vs "raw_markdown" distinction. Density-based
 * pruning stays [[MainContent]]'s job.
 */
object Markdown {

  private val dropTags = Set("script", "style", "template", "noscript",
    "iframe", "svg", "head")
  private val chromeTags = Set("nav", "header", "footer", "aside", "form",
    "button", "select", "option")

  private val headingTags = Map(
    "h1" -> 1, "h2" -> 2, "h3" -> 3, "h4" -> 4, "h5" -> 5, "h6" -> 6)

  /** Elements that open a new block (flush the pending inline run). */
  private val blockTags = Set("p", "div", "article", "section", "main",
    "body", "html", "header", "footer", "nav", "aside", "ul", "ol", "li",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "blockquote",
    "pre", "hr", "figure", "figcaption", "dl", "dd", "dt", "form",
    "fieldset", "address", "details", "summary") ++ headingTags.keySet

  private def collapse(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Verbatim subtree text (for fenced code blocks). */
  private def rawText(e: HtmlDom.Elem): String = {
    val sb = new java.lang.StringBuilder()
    def walk(x: HtmlDom.Elem): Unit = x.nodes.foreach {
      case s: String => sb.append(s)
      case c: HtmlDom.Elem => walk(c)
    }
    walk(e)
    sb.toString
  }

  /** Append one inline node (text run or inline element, markers
    * included) to `sb`. `\n` appears only via `<br>`. */
  /** Text runs soften source newlines/tabs to spaces — only `<br>` makes
    * a hard break. (`pre` bypasses this via [[rawText]].) */
  private def softened(s: String): String = {
    var i = 0; var dirty = false
    while (i < s.length && !dirty) {
      val c = s.charAt(i); dirty = c == '\n' || c == '\r' || c == '\t'; i += 1
    }
    if (!dirty) s
    else s.map(c => if (c == '\n' || c == '\r' || c == '\t') ' ' else c)
  }

  private def emitInline(sb: java.lang.StringBuilder, x: AnyRef,
      drop: String => Boolean): Unit = x match {
    case s: String => sb.append(softened(s))
    case c: HtmlDom.Elem if drop(c.tag) => ()
    case c: HtmlDom.Elem => c.tag match {
      case "br" => sb.append('\n')
      case "img" =>
        sb.append("![").append(collapse(c.attr("alt").getOrElse("")))
          .append("](").append(c.attr("src").getOrElse("")).append(')')
      case "a" =>
        val inner = collapse(inline(c, drop))
        c.attr("href") match {
          case Some(href) if href.nonEmpty =>
            sb.append('[').append(if (inner.isEmpty) href else inner)
              .append("](").append(href).append(')')
          case _ => sb.append(inner)
        }
      case "strong" | "b" =>
        val inner = collapse(inline(c, drop))
        if (inner.nonEmpty) sb.append("**").append(inner).append("**")
      case "em" | "i" =>
        val inner = collapse(inline(c, drop))
        if (inner.nonEmpty) sb.append('*').append(inner).append('*')
      case "code" =>
        val inner = collapse(inline(c, drop))
        if (inner.nonEmpty) sb.append('`').append(inner).append('`')
      case _ => c.nodes.foreach(emitInline(sb, _, drop)) // span, …: transparent
    }
  }

  /** Render the inline content of `e` (its interleaved nodes) to a
    * single markdown run. */
  private def inline(e: HtmlDom.Elem, drop: String => Boolean): String = {
    val sb = new java.lang.StringBuilder()
    e.nodes.foreach(emitInline(sb, _, drop))
    sb.toString
  }

  /** Collapse an inline run per line, preserving `<br>` hard breaks. */
  private def paragraph(run: String): String =
    run.split('\n').map(collapse).filter(_.nonEmpty).mkString("\n")

  private def renderList(e: HtmlDom.Elem, ordered: Boolean, depth: Int,
      drop: String => Boolean): String = {
    val indent = "  " * depth
    val items = ArrayBuffer.empty[String]
    var n = 0
    e.children.foreach { li =>
      if (li.tag == "li" && !drop(li.tag)) {
        n += 1
        val marker = if (ordered) s"$n. " else "- "
        // li's own inline run first, nested lists/blocks after
        val innerBlocks = ArrayBuffer.empty[String]
        renderBlocks(li, innerBlocks, depth + 1, drop)
        val head = innerBlocks.headOption.getOrElse("")
        val cont = "  " * (depth + 1)
        val first = indent + marker +
          head.split('\n').mkString("\n" + cont)
        items += (first +: innerBlocks.drop(1).map(b =>
          b.split('\n').map(l =>
            if (l.startsWith(indent + "  ")) l else cont + l).mkString("\n"))).mkString("\n")
      }
    }
    items.mkString("\n")
  }

  private def renderTable(e: HtmlDom.Elem, drop: String => Boolean): String = {
    val rows = ArrayBuffer.empty[Seq[String]]
    def walkRows(x: HtmlDom.Elem): Unit = x.children.foreach { c =>
      if (c.tag == "tr") {
        val cells = c.children.filter(k => k.tag == "td" || k.tag == "th")
          .map(k => collapse(inline(k, drop)))
        if (cells.nonEmpty) rows += cells.toSeq
      } else if (Set("thead", "tbody", "tfoot")(c.tag)) walkRows(c)
    }
    walkRows(e)
    if (rows.isEmpty) ""
    else {
      val width = rows.map(_.length).max
      def line(cs: Seq[String]) =
        "| " + cs.padTo(width, "").mkString(" | ") + " |"
      val sep = "| " + Seq.fill(width)("---").mkString(" | ") + " |"
      (line(rows.head) +: sep +: rows.tail.map(line)).mkString("\n")
    }
  }

  /** Walk `e`'s interleaved nodes: inline runs flush as paragraphs,
    * block children dispatch to their renderers. Appends to `out`. */
  private def renderBlocks(e: HtmlDom.Elem, out: ArrayBuffer[String],
      listDepth: Int, drop: String => Boolean): Unit = {
    val run = new java.lang.StringBuilder()
    def flush(): Unit = {
      val p = paragraph(run.toString)
      if (p.nonEmpty) out += p
      run.setLength(0)
    }
    e.nodes.foreach {
      case s: String => run.append(softened(s))
      case c: HtmlDom.Elem if drop(c.tag) => ()
      case c: HtmlDom.Elem if !blockTags(c.tag) =>
        emitInline(run, c, drop) // inline element: render into the current run
      case c: HtmlDom.Elem =>
        flush()
        headingTags.get(c.tag) match {
          case Some(level) =>
            val t = collapse(inline(c, drop))
            if (t.nonEmpty) out += ("#" * level) + " " + t
          case None => c.tag match {
            case "ul" => val b = renderList(c, ordered = false, listDepth, drop); if (b.nonEmpty) out += b
            case "ol" => val b = renderList(c, ordered = true, listDepth, drop); if (b.nonEmpty) out += b
            case "table" => val b = renderTable(c, drop); if (b.nonEmpty) out += b
            case "blockquote" =>
              val inner = ArrayBuffer.empty[String]
              renderBlocks(c, inner, 0, drop)
              if (inner.nonEmpty)
                out += inner.mkString("\n\n").split('\n')
                  .map(l => if (l.isEmpty) ">" else "> " + l).mkString("\n")
            case "pre" =>
              val body = rawText(c).replaceAll("^\\n+|\\s+$", "")
              out += "```\n" + body + "\n```"
            case "hr" => out += "---"
            case _ => renderBlocks(c, out, listDepth, drop) // container
          }
        }
    }
    flush()
  }

  /** Full-page markdown (`fit = false`) or chrome-pruned "fit" markdown
    * (`fit = true`). Deterministic; blocks joined by one blank line. */
  def render(html: String, fit: Boolean = false): String = {
    val drop: String => Boolean =
      if (fit) t => dropTags(t) || chromeTags(t) else dropTags
    val out = ArrayBuffer.empty[String]
    renderBlocks(HtmlDom.parse(html), out, 0, drop)
    out.mkString("\n\n")
  }

  /** UTF8String / bytes adapters for codegen (static-call shape, like
    * [[MainContent]]'s). */
  def renderU8(html: UTF8String, fit: Boolean): UTF8String =
    UTF8String.fromString(render(html.toString, fit))
  def renderBytes(html: Array[Byte], fit: Boolean): UTF8String =
    UTF8String.fromString(render(
      new String(html, java.nio.charset.StandardCharsets.UTF_8), fit))
}
