package graft.core

import scala.collection.mutable

/**
 * SpaceSaving frequent-items sketch (Metwally, Agrawal, El Abbadi,
 * "Efficient computation of frequent and top-k elements in data
 * streams", ICDT 2005) with the mergeable-summaries combine rule
 * (Agarwal et al., PODS 2012): the 100 TB answer to "what are the hot
 * terms / hosts / templates" without shuffling the full frequency table.
 *
 * Guarantees with capacity m over a stream of total weight N:
 *  - overestimate only: `true ≤ est ≤ true + err`, with `err ≤ N/m`;
 *  - any item with true weight > N/m is IN the sketch (guaranteed
 *    heavy-hitter recall);
 *  - merge: absent items enter at the other summary's floor (its min
 *    count), errors add, top-m kept — bounds hold with N = ΣNᵢ.
 *  - EXACT REGIME: while distinct items ≤ m no eviction ever happens,
 *    `err = 0` for every entry, and merge degenerates to count-sum — the
 *    sketch IS an exact frequency table (the sandbox oracle's regime;
 *    the approximate regime is property-tested in SpaceSavingSpec).
 *
 * Bookkeeping is a hash map with an O(m) min-scan on eviction (the
 * constant-time stream-summary linked structure is an optimization of
 * the same algorithm; at m ≤ 2^12 the scan is cache-resident and merge
 * cost dominates anyway).
 */
final class SpaceSaving(val capacity: Int) extends Serializable {
  require(capacity > 0, s"capacity=$capacity must be positive")

  /** item → (estimated count, max overestimation) */
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  private var totalW = 0L

  /** Total stream weight observed (exact — drives the N/m bound). */
  def total: Long = totalW

  /** The eviction floor: 0 while under capacity, else the min estimate. */
  def floor: Long =
    if (counters.size < capacity) 0L else counters.valuesIterator.map(_._1).min

  def add(item: String, w: Long = 1L): Unit = {
    require(w >= 0, s"negative weight $w")
    totalW += w
    counters.get(item) match {
      case Some((c, e)) => counters.update(item, (c + w, e))
      case None if counters.size < capacity => counters.update(item, (w, 0L))
      case None =>
        // evict the min counter: newcomer inherits its estimate as error
        val (minItem, (minC, _)) = counters.minBy { case (k, (c, _)) => (c, k) }
        counters.remove(minItem)
        counters.update(item, (minC + w, minC))
    }
  }

  /** Mergeable-summaries combine: absent → other's floor, then top-m. */
  def mergeIn(other: SpaceSaving): Unit = {
    val fSelf = floor
    val fOther = other.floor
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (counters.keysIterator ++ other.counters.keysIterator).foreach { k =>
      if (!merged.contains(k)) {
        val (c1, e1) = counters.getOrElse(k, (fSelf, fSelf))
        val (c2, e2) = other.counters.getOrElse(k, (fOther, fOther))
        merged.update(k, (c1 + c2, e1 + e2))
      }
    }
    counters.clear()
    // keep top-m by (est desc, item asc) — deterministic survivor set
    merged.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      .foreach { case (k, v) => counters.update(k, v) }
    totalW += other.totalW
  }

  /** Entries sorted by (est desc, item asc) — the deterministic report. */
  def sorted: Seq[(String, Long, Long)] =
    counters.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  // -------------------------------------------------------- serialization

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(capacity); out.writeLong(totalW); out.writeInt(counters.size)
    sorted.foreach { case (k, c, e) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    bos.toByteArray
  }
}

object SpaceSaving {
  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val ss = new SpaceSaving(in.readInt())
    val total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      ss.counters.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        (in.readLong(), in.readLong()))
      i += 1
    }
    ss.totalW = total // counters were installed directly, not via add()
    ss
  }
}
