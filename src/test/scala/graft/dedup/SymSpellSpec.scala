package graft.dedup

import graft.SparkTestBase

/**
 * FastSS deletion-neighborhood blocking vs brute force: the join must
 * return EXACTLY the levenshtein<=1 pairs a naive all-pairs scan
 * finds — substitutions, insertions/deletions, variable lengths,
 * and no false pairs at distance 2.
 */
class SymSpellSpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("matches brute force on a vocabulary with subs, indels, and far pairs") {
    val keys = Seq(
      "alpha", "alphx", "alpa", "aalpha", "alphab", // 1-edit family
      "beta", "betas", "bexa", "bxta",              // subs + append
      "gamma", "gamme", "gammx", "delta",           // family + isolate
      "ab", "b", "a", "",                           // short strings
      "zzzzz")                                      // isolate
    val got = SymSpell.edit1Join(keys.toDF("k"), "k")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = (for {
      a <- keys; b <- keys if a < b
      d = lev(a, b) if d <= 1
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(want.exists(_._3 == 1), "degenerate: no 1-edit pairs planted")
    // spot checks: a 2-edit pair must be absent
    assert(!got.exists(p => p._1 == "bexa" && p._2 == "bxta"))
    assert(got.contains(("a", "ab", 1)) && got.contains(("", "a", 1)))
  }
}
