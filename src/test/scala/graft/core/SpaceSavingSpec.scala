package graft.core

import graft.SparkTestBase
import graft.functions.gf
import graft.synth.Synth
import org.apache.spark.sql.functions._

class SpaceSavingSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic zipf-ish stream: item `t<j>` appears ~N/(j+1) times. */
  private def skewedStream(n: Int, nItems: Int): Seq[String] =
    (0 until n).map { i =>
      val r = math.floorMod(Synth.mix2(99L, i.toLong), 1000000L) / 1000000.0
      // inverse-CDF of 1/(j+1) weights
      val weights = (0 until nItems).map(j => 1.0 / (j + 1))
      val total = weights.sum
      var acc = 0.0; var pick = nItems - 1
      var j = 0
      var done = false
      while (j < nItems && !done) {
        acc += weights(j) / total
        if (r < acc) { pick = j; done = true }
        j += 1
      }
      s"t$pick"
    }

  test("exact regime: capacity ≥ distinct ⇒ exact counts, zero error, merge = sum") {
    val stream = skewedStream(5000, 20)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // split arbitrarily, merge, compare
    val parts = stream.grouped(317).toSeq.map { chunk =>
      val s = new SpaceSaving(64); chunk.foreach(s.add(_)); s
    }
    val merged = parts.reduceLeft { (a, b) => a.mergeIn(b); a }
    assert(merged.total == 5000)
    assert(merged.sorted.map { case (k, c, _) => k -> c }.toMap == truth)
    assert(merged.sorted.forall(_._3 == 0L), "exact regime must carry err=0")
  }

  test("approximate regime: overestimate-only, err ≤ N/m, guaranteed HH recall") {
    val n = 20000
    val stream = skewedStream(n, 200) // 200 distinct >> capacity
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = 16

    for (split <- Seq(1, 7)) { // single-stream and merged summaries
      val parts = stream.grouped(n / split + 1).toSeq.map { chunk =>
        val s = new SpaceSaving(m); chunk.foreach(s.add(_)); s
      }
      val sk = parts.reduceLeft { (a, b) => a.mergeIn(b); a }
      assert(sk.total == n)
      assert(sk.counters.size <= m)
      // invariants that hold under ANY merge tree: overestimate-only,
      // and the tracked err honestly covers the overshoot
      sk.sorted.foreach { case (item, est, err) =>
        val t = truth.getOrElse(item, 0L)
        assert(t <= est, s"$item: est $est underestimates true $t")
        assert(est - t <= err, s"$item: overshoot ${est - t} exceeds tracked err $err")
      }
      if (split == 1) {
        // single-stream bounds (Metwally et al. §3): err ≤ N/m, and any
        // item heavier than N/m is guaranteed present
        sk.sorted.foreach { case (item, _, err) =>
          assert(err <= n.toLong / m, s"$item: err $err above N/m bound ${n / m}")
        }
        truth.filter(_._2 > n.toLong / m).keys.foreach { hh =>
          assert(sk.counters.contains(hh), s"heavy hitter $hh (true=${truth(hh)}) evicted")
        }
      } else {
        // merged-summary recall with the conservative 2N/m margin
        // (floors compound across merges; Agarwal et al. give the tight
        // constant — 2 is a sound envelope for this merge rule)
        truth.filter(_._2 > 2L * n / m).keys.foreach { hh =>
          assert(sk.counters.contains(hh), s"heavy hitter $hh (true=${truth(hh)}) evicted")
        }
      }
    }
  }

  test("serialization round-trips counters, capacity and total") {
    val s = new SpaceSaving(8)
    skewedStream(1000, 50).foreach(s.add(_))
    val back = SpaceSaving.deserialize(s.serialize())
    assert(back.capacity == 8 && back.total == 1000)
    assert(back.sorted == s.sorted)
    // and keeps merging correctly after the round trip
    val more = new SpaceSaving(8); skewedStream(500, 50).foreach(more.add(_))
    val a = SpaceSaving.deserialize(s.serialize()); a.mergeIn(more)
    val b = s; b.mergeIn(more)
    assert(a.sorted == b.sorted && a.total == b.total)
  }

  test("space_saving_agg: exact regime is partitioning-invariant and weight-aware") {
    val rows = (0 until 3000).map { i =>
      (s"h${math.floorMod(Synth.mix2(7L, i.toLong), 12)}", 1L + (i % 3))
    }
    val expected = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq.sortBy { case (k, c) => (-c, k) }

    for (parts <- Seq(1, 13)) {
      val got = rows.toDF("host", "w").repartition(parts)
        .agg(gf.space_saving_agg($"host", $"w", 64).as("sk"))
        .select(explode($"sk").as("e"))
        .select($"e.item", $"e.est", $"e.err", $"e.total")
        .as[(String, Long, Long, Long)].collect()
      assert(got.map { case (k, c, _, _) => (k, c) }.toSeq == expected)
      assert(got.forall(_._3 == 0L))
      assert(got.forall(_._4 == rows.map(_._2).sum))
    }
  }
}
