package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.unsafe.types.UTF8String

/**
 * Main-content extraction (boilerplate removal) by block text/link
 * density — the shallow-feature classifier of Kohlschütter et al.,
 * "Boilerplate Detection using Shallow Text Features" (WSDM 2010),
 * over [[HtmlDom]]. Where [[TextExtractor]] yields ALL visible text
 * (the byte-identical invariant column), this yields only the text a
 * prep pipeline should train on: navigation chrome, footers, link
 * farms and widget noise are dropped.
 *
 * Deterministic rule set (no ML weights — reproducible across runs and
 * engines):
 *  1. STRUCTURAL prune: `script/style/nav/header/footer/aside/form/
 *     button/select/noscript/template/iframe/svg` subtrees never
 *     contribute.
 *  2. SEGMENT into blocks at block-level element boundaries
 *     (`p/div/article/section/main/td/li/h1..h6/blockquote/pre/...`).
 *  3. CLASSIFY each block: content iff `words ≥ minWords` and
 *     `anchorChars/chars ≤ maxLinkDensity` — long, low-link-density
 *     runs are body text; short or link-heavy runs are chrome.
 *  4. Concatenate content blocks in document order with `\n`.
 *
 * Note: [[HtmlDom]] keeps text per element scope (an element's own text
 * parts are attributed before its children's) — block segmentation
 * happens at element boundaries, so intra-scope interleaving loss does
 * not move text across blocks.
 */
object MainContent {

  private val dropTags = Set("script", "style", "template", "noscript",
    "nav", "header", "footer", "aside", "form", "button", "select",
    "option", "iframe", "svg")

  private val blockTags = Set("p", "div", "article", "section", "main",
    "td", "th", "li", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "pre", "table", "ul", "ol", "tr", "body", "dd", "dt", "figure",
    "figcaption")

  /** One segmented text block with its classification features. */
  final case class Block(text: String, words: Int, linkDensity: Double,
      content: Boolean)

  /** Segment + classify (see class doc for the rule set). */
  def blocks(html: String, minWords: Int = 10,
      maxLinkDensity: Double = 0.33): Seq[Block] = {
    val root = HtmlDom.parse(html)
    val out = ArrayBuffer.empty[Block]
    val sb = new java.lang.StringBuilder()
    var anchorChars = 0L
    var totalChars = 0L

    def flush(): Unit = {
      val text = sb.toString.replaceAll("\\s+", " ").trim
      if (text.nonEmpty) {
        val words = text.split(" ").length
        val ld =
          if (totalChars == 0) 0.0 else anchorChars.toDouble / totalChars
        out += Block(text, words, ld,
          content = words >= minWords && ld <= maxLinkDensity)
      }
      sb.setLength(0); anchorChars = 0L; totalChars = 0L
    }

    def walk(e: HtmlDom.Elem, inAnchor: Boolean): Unit = {
      if (!dropTags(e.tag)) {
        val isBlock = blockTags(e.tag)
        if (isBlock) flush()
        val anchored = inAnchor || e.tag == "a"
        e.textParts.foreach { t =>
          sb.append(t); sb.append(' ')
          totalChars += t.length
          if (anchored) anchorChars += t.length
        }
        e.children.foreach(walk(_, anchored))
        if (isBlock) flush()
      }
    }
    walk(root, inAnchor = false)
    flush()
    out.toSeq
  }

  /** Content blocks joined with `\n` — the training-text column. */
  def extract(html: String, minWords: Int = 10,
      maxLinkDensity: Double = 0.33): String =
    blocks(html, minWords, maxLinkDensity)
      .collect { case b if b.content => b.text }.mkString("\n")

  /** UTF8String adapters for codegen (static-call shape, like
    * [[TextExtractor]]'s). Thresholds ride along as primitives. */
  def extractU8(html: UTF8String, minWords: Int, maxLinkDensity: Double): UTF8String =
    UTF8String.fromString(extract(html.toString, minWords, maxLinkDensity))
  def extractBytes(html: Array[Byte], minWords: Int, maxLinkDensity: Double): UTF8String =
    UTF8String.fromString(extract(
      new String(html, java.nio.charset.StandardCharsets.UTF_8),
      minWords, maxLinkDensity))
}
