package graft.core

import scala.collection.mutable.ArrayBuffer
import graft.core.HtmlDom.Elem

/**
 * Real CSS-selector engine over [[HtmlDom]] trees (SURVEY.md C25 — the
 * selector dialect is the closure of everything the reference's shipped
 * schema library uses, /root/reference/schema_based_extractor.py:43-300):
 *
 *   - type (`div`), universal (`*`), `.class`, `#id`, compounds
 *     (`a.btnMainCTA`, `span[itemprop='postalCode']`)
 *   - attribute tests `[attr]`, `[attr=v]`, `[attr^=v]`, `[attr$=v]`,
 *     `[attr*=v]`, `[attr~=v]` (quoted or bare values)
 *   - combinators: descendant (space), child (`>`), adjacent (`+`),
 *     general sibling (`~`)
 *   - `:first-child`, `:last-child`, `:nth-child(k)` (literal k ≥ 1)
 *   - selector groups (`h1, h2, .facility-name`)
 *
 * Unsupported syntax throws at compile time — never a silent non-match.
 * Matching is right-to-left per complex selector (check the candidate
 * against the rightmost compound, then walk ancestors/siblings), the
 * standard engine shape; results are in document order, deduped across
 * group branches.
 */
object CssSelector {

  final case class AttrTest(name: String, op: String, value: String) {
    def matches(e: Elem): Boolean = e.attr(name) match {
      case None => false
      case Some(v) => op match {
        case ""   => true
        case "="  => v == value
        case "^=" => value.nonEmpty && v.startsWith(value)
        case "$=" => value.nonEmpty && v.endsWith(value)
        case "*=" => value.nonEmpty && v.contains(value)
        case "~=" => v.split("\\s+").contains(value)
        case _ => false
      }
    }
  }

  sealed trait Pseudo { def matches(e: Elem): Boolean }
  case object FirstChild extends Pseudo { def matches(e: Elem): Boolean = e.idx == 0 }
  case object LastChild extends Pseudo {
    def matches(e: Elem): Boolean = e.parent != null && e.idx == e.parent.children.length - 1
  }
  final case class NthChild(k: Int) extends Pseudo {
    def matches(e: Elem): Boolean = e.idx == k - 1
  }

  /** One compound: all parts must hold on the same element. */
  final case class Compound(tag: Option[String], ids: Seq[String],
                            classes: Seq[String], attrs: Seq[AttrTest],
                            pseudos: Seq[Pseudo]) {
    def matches(e: Elem): Boolean =
      tag.forall(t => t == "*" || t == e.tag) &&
        ids.forall(i => e.attr("id").contains(i)) &&
        classes.forall(e.classes.contains) &&
        attrs.forall(_.matches(e)) &&
        pseudos.forall(_.matches(e))
  }

  /** rightmost compound + (combinator, compound) steps leftward. */
  final case class Complex(last: Compound, left: Seq[(Char, Compound)]) {
    def matches(e: Elem): Boolean = last.matches(e) && walk(e, 0)
    private def walk(from: Elem, step: Int): Boolean = {
      if (step >= left.length) return true
      val (comb, c) = left(step)
      comb match {
        case '>' =>
          val p = from.parent
          p != null && p.tag != "#root" && c.matches(p) && walk(p, step + 1)
        case ' ' =>
          var p = from.parent
          while (p != null && p.tag != "#root") {
            if (c.matches(p) && walk(p, step + 1)) return true
            p = p.parent
          }
          false
        case '+' =>
          val p = from.parent
          p != null && from.idx > 0 && {
            val sib = p.children(from.idx - 1)
            c.matches(sib) && walk(sib, step + 1)
          }
        case '~' =>
          val p = from.parent
          p != null && (0 until from.idx).exists { j =>
            val sib = p.children(j)
            c.matches(sib) && walk(sib, step + 1)
          }
        case other => throw new IllegalStateException(s"combinator $other")
      }
    }
  }

  /** A compiled selector group. Serializable so it can ride inside a
    * Catalyst expression to the executors. */
  final case class Selector(source: String, branches: Seq[Complex]) extends Serializable {
    def matches(e: Elem): Boolean = branches.exists(_.matches(e))
    /** All matches under `root`, document order. */
    def select(root: Elem): ArrayBuffer[Elem] =
      HtmlDom.documentOrder(root).filter(matches)
  }

  // ---------------- parsing ----------------

  private def isIdent(c: Char): Boolean =
    c.isLetterOrDigit || c == '-' || c == '_'

  def compile(sel: String): Selector = {
    require(sel != null && sel.trim.nonEmpty, "empty selector")
    Selector(sel, sel.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(compileComplex))
  }

  private def compileComplex(s: String): Complex = {
    // tokenize into compounds and combinators; whitespace is the
    // descendant combinator unless adjacent to > + ~
    val parts = new ArrayBuffer[(Char, String)] // (combinator-before, compound)
    var i = 0
    var comb = ' '
    var first = true
    while (i < s.length) {
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i < s.length && (s.charAt(i) == '>' || s.charAt(i) == '+' || s.charAt(i) == '~')) {
        comb = s.charAt(i); i += 1
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
      }
      val start = i
      var depth = 0 // inside [...] or (...) whitespace is not a combinator
      while (i < s.length && (depth > 0 ||
             (!s.charAt(i).isWhitespace && s.charAt(i) != '>' &&
              s.charAt(i) != '+' && s.charAt(i) != '~'))) {
        val c = s.charAt(i)
        if (c == '[' || c == '(') depth += 1
        else if (c == ']' || c == ')') depth -= 1
        i += 1
      }
      if (i > start) {
        require(!first || comb == ' ', s"selector '$s' starts with combinator")
        parts += ((comb, s.substring(start, i)))
        comb = ' '
        first = false
      }
    }
    require(parts.nonEmpty, s"unparseable selector '$s'")
    val compounds = parts.map { case (c, p) => (c, compileCompound(p, s)) }
    // right-to-left: last compound, then (combinator, left-neighbor) pairs
    val last = compounds.last._2
    val left = compounds.indices.reverse.drop(1).map { k =>
      (compounds(k + 1)._1, compounds(k)._2)
    }
    Complex(last, left)
  }

  private def compileCompound(p: String, whole: String): Compound = {
    var tag: Option[String] = None
    val ids = new ArrayBuffer[String]; val classes = new ArrayBuffer[String]
    val attrs = new ArrayBuffer[AttrTest]; val pseudos = new ArrayBuffer[Pseudo]
    var i = 0
    def ident(): String = {
      val st = i
      while (i < p.length && isIdent(p.charAt(i))) i += 1
      require(i > st, s"expected identifier at '$p'[$i] in '$whole'")
      p.substring(st, i)
    }
    while (i < p.length) {
      p.charAt(i) match {
        case '*' => tag = Some("*"); i += 1
        case '.' => i += 1; classes += ident()
        case '#' => i += 1; ids += ident()
        case '[' =>
          i += 1
          while (i < p.length && p.charAt(i).isWhitespace) i += 1
          val name = ident().toLowerCase(java.util.Locale.ROOT)
          while (i < p.length && p.charAt(i).isWhitespace) i += 1
          if (i < p.length && p.charAt(i) == ']') { attrs += AttrTest(name, "", ""); i += 1 }
          else {
            val op =
              if (p.charAt(i) == '=') { i += 1; "=" }
              else if ("^$*~".contains(p.charAt(i)) && i + 1 < p.length && p.charAt(i + 1) == '=') {
                val o = s"${p.charAt(i)}="; i += 2; o
              } else throw new IllegalArgumentException(
                s"unsupported attribute op at '$p'[$i] in '$whole'")
            while (i < p.length && p.charAt(i).isWhitespace) i += 1
            val value =
              if (i < p.length && (p.charAt(i) == '"' || p.charAt(i) == '\'')) {
                val q = p.charAt(i); i += 1
                val st = i
                while (i < p.length && p.charAt(i) != q) i += 1
                require(i < p.length, s"unterminated quote in '$whole'")
                val v = p.substring(st, i); i += 1; v
              } else {
                val st = i
                while (i < p.length && p.charAt(i) != ']' && !p.charAt(i).isWhitespace) i += 1
                p.substring(st, i)
              }
            while (i < p.length && p.charAt(i).isWhitespace) i += 1
            require(i < p.length && p.charAt(i) == ']', s"expected ] in '$whole'")
            i += 1
            attrs += AttrTest(name, op, value)
          }
        case ':' =>
          i += 1
          val name = ident().toLowerCase(java.util.Locale.ROOT)
          name match {
            case "first-child" => pseudos += FirstChild
            case "last-child" => pseudos += LastChild
            case "nth-child" =>
              require(i < p.length && p.charAt(i) == '(', s"nth-child needs (k) in '$whole'")
              i += 1
              val st = i
              while (i < p.length && p.charAt(i) != ')') i += 1
              require(i < p.length, s"unterminated nth-child in '$whole'")
              val arg = p.substring(st, i).trim; i += 1
              val k = try arg.toInt catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"only literal :nth-child(k) supported, got '$arg' in '$whole'")
              }
              require(k >= 1, s"nth-child($k) in '$whole'")
              pseudos += NthChild(k)
            case other => throw new IllegalArgumentException(
              s"unsupported pseudo-class :$other in '$whole'")
          }
        case c if isIdent(c) =>
          require(tag.isEmpty, s"two type selectors in '$p' ('$whole')")
          tag = Some(ident().toLowerCase(java.util.Locale.ROOT))
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' at '$p'[$i] in '$whole'")
      }
    }
    require(tag.nonEmpty || ids.nonEmpty || classes.nonEmpty || attrs.nonEmpty || pseudos.nonEmpty,
      s"empty compound in '$whole'")
    Compound(tag, ids.toSeq, classes.toSeq, attrs.toSeq, pseudos.toSeq)
  }
}
