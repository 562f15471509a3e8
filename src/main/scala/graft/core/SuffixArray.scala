package graft.core

/**
 * Suffix array + LCP over a concatenated multi-document buffer — the
 * per-shard compute kernel of suffix-array ExactSubstr dedup (Lee et
 * al. 2022, "Deduplicating Training Data Makes Language Models
 * Better"). The paper shards the corpus, builds a suffix array per
 * shard, and scans adjacent suffixes for long shared prefixes; this
 * kernel is that per-shard step, operating on one partition's
 * documents concatenated with doc-boundary sentinels.
 *
 * Construction is prefix doubling (Manber–Myers, O(n log² n) with the
 * sort, O(n) extra memory) — no O(n·L) gram materialization, which is
 * exactly what the suffix-array formulation buys over the positional
 * L-gram scan at scale. LCP is Kasai's O(n) algorithm, then truncated
 * at doc boundaries so a "match" can never cross two documents.
 *
 * Cover semantics (proved equivalent to the positional-L-gram rule in
 * ExactSubstrSpec): partition the suffix array into maximal blocks
 * whose ADJACENT lcp is ≥ L; within a block every pair of suffixes
 * shares an ≥ L-char prefix (pairwise lcp = min of the adjacent lcps
 * between them). If a block contains suffixes from ≥ 2 distinct docs,
 * every member position p is the start of a cross-document duplicated
 * span and [p, p+L) is covered. The union of those intervals is the
 * Lee et al. scrub cover restricted to cross-document matches.
 */
object SuffixArray {

  /** Suffix array of `s` (indices 0..n-1 sorted by suffix). */
  def build(s: Array[Int]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = new Array[Int](n)
    var tmp = new Array[Int](n)
    val sa = Array.range(0, n)
    // initial ranks = symbol values (arbitrary ints OK; only order matters)
    var i = 0
    while (i < n) { rank(i) = s(i); i += 1 }
    var k = 1
    val boxed = new Array[Integer](n)
    i = 0; while (i < n) { boxed(i) = Integer.valueOf(sa(i)); i += 1 }
    while (k < n) {
      val kk = k
      val r = rank
      val cmp = new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int = {
          if (r(a) != r(b)) Integer.compare(r(a), r(b))
          else {
            val ra = if (a + kk < n) r(a + kk) else -1
            val rb = if (b + kk < n) r(b + kk) else -1
            Integer.compare(ra, rb)
          }
        }
      }
      java.util.Arrays.sort(boxed, cmp)
      i = 0; while (i < n) { sa(i) = boxed(i).intValue(); i += 1 }
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) +
          (if (cmp.compare(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      val sw = rank; rank = tmp; tmp = sw
      if (rank(sa(n - 1)) == n - 1) return sa // all ranks distinct: done
      k <<= 1
    }
    sa
  }

  /** Kasai LCP: lcp(i) = common-prefix length of sa(i-1) and sa(i); lcp(0)=0. */
  def lcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val out = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        out(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    out
  }

  /**
   * Cross-document duplicated-span cover over a set of documents.
   * Returns per docId the set of 1-based character positions covered by
   * some cross-doc shared span of length ≥ L (as merged [start, end]
   * 1-based inclusive intervals, sorted).
   *
   * Documents are concatenated with a sentinel (an int below any char
   * value) between them; Kasai LCP is then truncated to the distance to
   * the next sentinel from BOTH suffixes, so matches never cross a doc
   * boundary even though all sentinels compare equal.
   */
  def crossDocCover(docs: Seq[(Long, String)], L: Int): Map[Long, Seq[(Int, Int)]] = {
    require(L >= 2, s"L=$L: spans need at least 2 chars")
    if (docs.isEmpty) return Map.empty
    val totalLen = docs.map(_._2.length).sum + docs.length
    val buf = new Array[Int](totalLen)
    val docOf = new Array[Int](totalLen)   // doc index per position
    val posOf = new Array[Int](totalLen)   // 1-based char pos within doc
    val SENT = -1
    var off = 0
    var d = 0
    docs.foreach { case (_, text) =>
      var j = 0
      while (j < text.length) {
        buf(off) = text.charAt(j).toInt
        docOf(off) = d; posOf(off) = j + 1
        off += 1; j += 1
      }
      buf(off) = SENT; docOf(off) = -1; posOf(off) = 0
      off += 1; d += 1
    }
    val sa = build(buf)
    val rawLcp = lcp(buf, sa)
    // distance to next sentinel (inclusive of current pos counting chars)
    val toSent = new Array[Int](totalLen)
    var i = totalLen - 1
    var run = 0
    while (i >= 0) {
      if (buf(i) == SENT) run = 0 else run += 1
      toSent(i) = run
      i -= 1
    }
    def effLcp(saIdx: Int): Int = {
      val a = sa(saIdx - 1); val b = sa(saIdx)
      math.min(rawLcp(saIdx), math.min(toSent(a), toSent(b)))
    }
    // blocks of adjacent effLcp >= L; if >=2 docs in a block, cover all
    val covered = Array.fill(docs.length)(scala.collection.mutable.TreeSet.empty[Int])
    var blockStart = 0
    def flush(endExcl: Int): Unit = {
      if (endExcl - blockStart >= 2) {
        val members = (blockStart until endExcl).map(sa)
          .filter(p => docOf(p) >= 0 && toSent(p) >= L)
        val dset = members.map(docOf).distinct
        if (dset.length >= 2) {
          members.foreach { p =>
            val di = docOf(p); val start = posOf(p)
            var c = start
            while (c < start + L) { covered(di) += c; c += 1 }
          }
        }
      }
    }
    i = 1
    while (i < totalLen) {
      if (effLcp(i) < L) { flush(i); blockStart = i }
      i += 1
    }
    flush(totalLen)
    // merge covered positions into intervals
    docs.zipWithIndex.map { case ((id, _), di) =>
      val ps = covered(di).toSeq
      val iv = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      ps.foreach { p =>
        if (iv.nonEmpty && iv.last._2 + 1 == p) iv(iv.length - 1) = (iv.last._1, p)
        else iv += ((p, p))
      }
      id -> iv.toSeq
    }.toMap
  }
}
