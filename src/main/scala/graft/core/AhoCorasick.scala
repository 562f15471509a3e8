package graft.core

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho-Corasick multi-pattern token-phrase matcher — the dictionary
 * content filter of the C4/Gopher prep stacks ("bad-word list", topic
 * lexicons, licence-string detectors). A production dictionary has
 * 10^3-10^5 entries; matching them as N regexes is N passes per
 * document, an automaton is ONE pass regardless of N — built once on
 * the driver, shipped to executors as a codegen reference object (the
 * [[graft.expr.CompiledCss]] pattern).
 *
 * Semantics (engine-portable, q99-oracled): tokenize like
 * `TextOps.words` (lowercase a-z runs), then count every token
 * position where the next k tokens equal a k-word dictionary entry.
 * ALL positions count, including overlapping matches of the same or
 * different entries ("table table table" matches "table table"
 * twice) — position semantics an oracle can replay exactly, unlike
 * leftmost-non-overlapping replace counts.
 *
 * Implementation: char-level trie over the space-padded entry strings
 * (" w1 w2 "), BFS failure links, terminal counts accumulated through
 * the fail chain so each scanned char adds `cnt(state)` in O(1). The
 * scan streams tokens straight through the automaton (one virtual
 * space between and around tokens) — no joined-string allocation.
 */
final class AhoCorasick(entries: Seq[String]) extends Serializable {
  require(entries.nonEmpty, "empty dictionary")
  entries.foreach(e => require(e.matches("[a-z]+( [a-z]+)*"),
    s"dictionary entry must be lowercase words: '$e'"))

  // trie over chars 'a'..'z' + ' ' (27 symbols)
  private def idx(c: Char): Int = if (c == ' ') 26 else c - 'a'

  private val (next, fail, cnt) = {
    val nxt = mutable.ArrayBuffer(Array.fill(27)(-1))
    val terminal = mutable.ArrayBuffer(0)
    entries.foreach { e =>
      var v = 0
      (" " + e + " ").foreach { c =>
        val k = idx(c)
        if (nxt(v)(k) < 0) {
          nxt += Array.fill(27)(-1); terminal += 0; nxt(v)(k) = nxt.length - 1
        }
        v = nxt(v)(k)
      }
      terminal(v) += 1
    }
    // BFS: goto-function completion + fail links + count accumulation
    val f = new Array[Int](nxt.length)
    val q = mutable.Queue.empty[Int]
    var k = 0
    while (k < 27) {
      if (nxt(0)(k) < 0) nxt(0)(k) = 0
      else { f(nxt(0)(k)) = 0; q += nxt(0)(k) }
      k += 1
    }
    while (q.nonEmpty) {
      val v = q.dequeue()
      terminal(v) += terminal(f(v))
      var c = 0
      while (c < 27) {
        val u = nxt(v)(c)
        if (u < 0) nxt(v)(c) = nxt(f(v))(c)
        else { f(u) = nxt(f(v))(c); q += u }
        c += 1
      }
    }
    (nxt.toArray, f, terminal.toArray)
  }

  /** Total dictionary hits over a pre-tokenized word stream. */
  def countWords(words: Iterator[String]): Long = {
    var state = next(0)(26) // leading virtual space
    var hits = 0L + cnt(state)
    words.foreach { w =>
      var i = 0
      while (i < w.length) {
        state = next(state)(idx(w.charAt(i)))
        hits += cnt(state)
        i += 1
      }
      state = next(state)(26) // inter/trailing space
      hits += cnt(state)
    }
    hits
  }

  /** Tokenize like TextOps.words (lowercase a-z runs) and count — the
    * codegen entry point. */
  def countText(text: UTF8String): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val words = s.split("[^a-z]+").iterator.filter(_.nonEmpty)
    countWords(words)
  }
}
