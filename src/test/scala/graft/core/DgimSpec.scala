package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * DGIM exponential-histogram properties against exact sliding counts:
 * the certified error bound must HOLD at every prefix and window, the
 * relative error must respect the 1/(2(r−1)) theory bound, and state
 * must stay logarithmic in the stream length.
 */
class DgimSpec extends AnyFunSuite {

  private def bitStream(seed: Long, n: Int, density: Double): Seq[Boolean] =
    (0 until n).map { i =>
      val h = (i * 2654435761L + seed * 40503L) & 0x7fffffffL
      (h.toDouble / 0x7fffffffL.toDouble) < density
    }

  test("certified error bound holds at every prefix, several windows/densities") {
    for (seed <- 1L to 3L; density <- Seq(0.1, 0.5, 0.9)) {
      val bits = bitStream(seed, 2000, density)
      val d = new Dgim(maxPerSize = 4)
      for (window <- Seq(64L, 256L)) {
        val d2 = new Dgim(maxPerSize = 4)
        bits.zipWithIndex.foreach { case (b, i) =>
          val t = i + 1L
          d2.add(t, b)
          if (t % 97 == 0) { // spot-check prefixes
            val exact = bits.slice(math.max(0, i + 1 - window.toInt), i + 1)
              .count(identity).toLong
            val (est, err) = d2.estimate(t, window)
            assert(math.abs(est - exact) <= err,
              s"seed=$seed density=$density w=$window t=$t est=$est exact=$exact err=$err")
            if (exact >= 32)
              assert(math.abs(est - exact).toDouble / exact <= 0.2,
                s"relative error at seed=$seed density=$density w=$window t=$t")
          }
        }
      }
      bits.zipWithIndex.foreach { case (b, i) => d.add(i + 1L, b) }
      val ones = bits.count(identity)
      assert(d.stateSize <= 5 * (64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1, ones).toLong) + 2), s"state too large: ${d.stateSize}")
    }
  }

  test("windowed expiry: state bounded by O(r log w) for ANY stream length, " +
    "estimates still certified") {
    for (density <- Seq(0.1, 0.5, 1.0)) {
      val bits = bitStream(7L, 20000, density)
      val w = 64L
      val bounded = new Dgim(maxPerSize = 4, window = w)
      val unbounded = new Dgim(maxPerSize = 4)
      var maxState = 0
      bits.zipWithIndex.foreach { case (b, i) =>
        val t = i + 1L
        bounded.add(t, b); unbounded.add(t, b)
        maxState = math.max(maxState, bounded.stateSize)
        if (t % 499 == 0) {
          val exact = bits.slice(math.max(0, i + 1 - w.toInt), i + 1)
            .count(identity).toLong
          val (est, err) = bounded.estimate(t, w)
          assert(math.abs(est - exact) <= err,
            s"density=$density t=$t est=$est exact=$exact err=$err")
        }
      }
      // r buckets per size, sizes 1..~2w ⇒ <= r*(log2(w)+2) buckets ever
      assert(maxState <= 4 * (java.lang.Long.numberOfTrailingZeros(
        java.lang.Long.highestOneBit(w)) + 2),
        s"windowed state grew past the O(r log w) bound: $maxState")
      // the unbounded twin keeps strictly more state on a long 1-dense stream
      if (density == 1.0) assert(unbounded.stateSize > bounded.stateSize)
    }
  }

  test("exact regimes: empty stream and all-zeros report 0 with 0 error") {
    val d = new Dgim()
    assert(d.estimate(100L, 64L) == (0L, 0L))
    (1L to 50L).foreach(t => d.add(t, bit = false))
    assert(d.estimate(50L, 64L) == (0L, 0L))
    assert(d.stateSize == 0)
  }
}
