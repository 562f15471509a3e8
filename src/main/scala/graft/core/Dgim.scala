package graft.core

import scala.collection.mutable.ArrayBuffer

/**
 * DGIM sliding-window bit counting (Datar, Gionis, Indyk & Motwani,
 * SODA'02 "Maintaining stream statistics over sliding windows") — the
 * classic answer to "how many error responses did this host return in
 * its last N requests" when the stream cannot be stored: O(log² N)
 * bucket state per key instead of the N-bit window, with a certified
 * error bound.
 *
 * State: exponential histogram — buckets of 1-counts with power-of-two
 * sizes, at most `maxPerSize` per size (merging the two OLDEST of a
 * size when exceeded, cascading upward). Each bucket keeps the
 * timestamp of its NEWEST 1.
 *
 * Estimate for the last `window` positions: every in-window bucket
 * except the oldest is fully inside the window (its newest bit is in
 * the window, and buckets are time-ordered), so their sizes are exact;
 * only the oldest straddles the boundary, contributing between 1 and
 * its size — DGIM charges half (ceil). The CERTIFIED absolute error is
 * therefore ⌈oldest/2⌉, reported alongside the estimate so callers can
 * assert it against an exact oracle (q147 does, per key, in-query);
 * with `maxPerSize` = r, the relative error is bounded by 1/(2(r−1))
 * (r = 4 here → ≤ 16.7 %).
 *
 * Expiry (ADVICE r4): when a `window` bound is known at construction,
 * `add` drops buckets whose newest timestamp has left the window
 * (standard DGIM expiry) — state is then O(maxPerSize · log window)
 * for any stream length, the always-on-monitor contract. `estimate`
 * may be asked for any window ≤ the construction bound. With
 * `window = 0` (unbounded) nothing expires and state grows
 * O(maxPerSize · log streamLength).
 */
final class Dgim(val maxPerSize: Int = 4, val window: Long = 0L)
    extends Serializable {

  // (newest-1 timestamp, log2 size), oldest first
  private val buckets = ArrayBuffer[(Long, Int)]()

  def add(t: Long, bit: Boolean): Unit = {
    // expire on EVERY arrival (0-bits advance time too): a bucket whose
    // newest 1 is at or before t - window can never intersect a future
    // estimate window ending >= t
    if (window > 0L)
      while (buckets.nonEmpty && buckets.head._1 <= t - window)
        buckets.remove(0)
    if (!bit) return
    buckets += ((t, 0))
    var k = 0
    var cascading = true
    while (cascading) {
      var count = 0
      var first = -1
      var second = -1
      var i = 0
      while (i < buckets.length) {
        if (buckets(i)._2 == k) {
          count += 1
          if (first < 0) first = i else if (second < 0) second = i
        }
        i += 1
      }
      if (count > maxPerSize) {
        // merge the two OLDEST buckets of this size; merged bucket keeps
        // the newer endpoint and stays at the older slot (time order)
        val merged = (buckets(second)._1, k + 1)
        buckets.remove(second)
        buckets.remove(first)
        buckets.insert(first, merged)
        k += 1
      } else cascading = false
    }
  }

  /** (estimate, certifiedError) for 1s among positions
    * (now − window, now]. certifiedError = ⌈oldest-in-window size / 2⌉,
    * 0 when the count is exact (no straddling bucket). */
  def estimate(now: Long, window: Long): (Long, Long) = {
    var total = 0L
    var oldest = 0L
    var i = 0
    while (i < buckets.length) {
      val (t, k) = buckets(i)
      if (t > now - window) {
        val size = 1L << k
        if (oldest == 0L) oldest = size // first in-window = oldest
        total += size
        // a fully-inside oldest bucket would make the count exact, but
        // DGIM cannot know; it always charges the half-bucket bound
      }
      i += 1
    }
    if (oldest == 0L) (0L, 0L)
    else (total - oldest + (oldest + 1) / 2, (oldest + 1) / 2)
  }

  /** Bucket count — O(maxPerSize · log window) when a `window` bound
    * expires old buckets; O(maxPerSize · log streamLength) unbounded. */
  def stateSize: Int = buckets.length
}
