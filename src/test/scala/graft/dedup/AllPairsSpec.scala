package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Prefix-filtered exact similarity join vs brute force: the join must
 * return EXACTLY the pairs a naive all-pairs Jaccard scan returns —
 * the whole point of the operator is zero false negatives, so the
 * differential is the completeness proof. Token universes are skewed
 * (a few near-stopwords + a rare tail) to exercise the df ordering.
 */
class AllPairsSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(sets: Map[Long, Set[String]], tau: Double)
  : Map[(Long, Long), (Long, Double)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size
      un = (sets(i) | sets(j)).size
      if un > 0 && inter.toDouble / un >= tau
    } yield (i, j) -> (inter.toLong, inter.toDouble / un)).toMap
  }

  private def run(sets: Map[Long, Set[String]], tau: Double)
  : Map[(Long, Long), (Long, Double)] = {
    val rows = sets.toSeq.flatMap { case (id, s) => s.map(id -> _) }
    AllPairs.jaccardJoin(rows.toDF("id", "tok"), "id", "tok", tau)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5)))
      .toMap
  }

  test("matches brute force on skewed synthetic sets, several thresholds") {
    // 30 sets over a universe with 3 hot tokens (in most sets) and a
    // rare tail; ids 10..12 are planted near-dups of id 0
    def tok(i: Long): String = s"t$i"
    val base = (0L until 30L).map { id =>
      val hot = Seq(tok(0), tok(1), tok(2)).filter(t => (id + t.length) % 2 == 0)
      val tail = (0L until 8L).map(j => tok(3 + (id * 7 + j * 5) % 40))
      id -> (hot ++ tail).toSet
    }.toMap
    val planted = base +
      (10L -> (base(0L) + tok(90))) + // high-overlap copy
      (11L -> base(0L)) +             // identical copy
      (12L -> (base(0L) - base(0L).head + tok(91))) // one-sub copy
    for (tau <- Seq(0.5, 0.7, 0.9)) {
      val got = run(planted, tau)
      val want = brute(planted, tau)
      assert(got.keySet == want.keySet, s"pair set at tau=$tau")
      for (k <- got.keySet) {
        assert(got(k)._1 == want(k)._1, s"inter at $k")
        assert(math.abs(got(k)._2 - want(k)._2) < 1e-12, s"jaccard at $k")
      }
      assert(want.nonEmpty, s"degenerate test at tau=$tau")
    }
  }

  test("identical sets report jaccard 1.0; disjoint sets never pair") {
    val sets = Map(
      1L -> Set("a", "b", "c"), 2L -> Set("a", "b", "c"),
      3L -> Set("x", "y", "z"))
    val got = run(sets, 0.6)
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == (3L, 1.0))
  }
}
