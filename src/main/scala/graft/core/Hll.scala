package graft.core

/**
 * Dense HyperLogLog cardinality sketch (Flajolet et al. 2007; the
 * linear-counting small-range correction of HLL++, Heule et al. 2013) —
 * the distinct-count analog of the seen Bloom state: "how many distinct
 * URLs has this host contributed across all crawl rounds" in `m` bytes
 * per host instead of a distinct set, with the same incremental
 * carried-state property as [[graft.expr.BloomMergeAgg]]:
 *
 *   '''merge = register-wise max''', so merging per-round delta
 *   sketches into carried state is BYTE-IDENTICAL to rebuilding from
 *   the full history (max is associative/commutative/idempotent) —
 *   re-adds of already-seen values cannot change any register.
 *
 * Inputs are pre-hashed 64-bit values (callers pass `xxhash64(key)`,
 * the [[graft.expr.BloomFilterAgg]] convention): top `p` bits pick the
 * register, the leading-zero rank of the rest updates it. Standard
 * error ≈ 1.04/√m (1.6 % at p=12 / 4 KiB).
 */
final class Hll(val p: Int) extends Serializable {
  require(p >= 4 && p <= 18, s"p must be in [4,18], got $p")
  val m: Int = 1 << p
  val regs: Array[Byte] = new Array[Byte](m)

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rank =
      if (w == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def mergeInPlace(o: Hll): Hll = {
    require(o.p == p, s"sketch precision mismatch: $p vs ${o.p}")
    var i = 0
    while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
    this
  }

  /** Bias-corrected estimate with linear counting below 2.5m. */
  def estimate: Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i).toInt
      sum += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m.toDouble * m.toDouble / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** 1 header byte (p) + m register bytes. */
  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + m)
    out(0) = p.toByte
    System.arraycopy(regs, 0, out, 1, m)
    out
  }
}

object Hll {
  def deserialize(bytes: Array[Byte]): Hll = {
    val h = new Hll(bytes(0).toInt)
    require(bytes.length == 1 + h.m, s"bad sketch blob: ${bytes.length} bytes")
    System.arraycopy(bytes, 1, h.regs, 0, h.m)
    h
  }

  /** Codegen entry point for [[graft.expr.HllEstimate]]. */
  def estimateBytes(bytes: Array[Byte]): Double = deserialize(bytes).estimate
}
