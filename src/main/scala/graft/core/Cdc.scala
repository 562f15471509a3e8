package graft.core

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined chunking (the FastCDC scheme: Xia et al., USENIX ATC
 * 2016 "FastCDC: a Fast and Efficient Content-Defined Chunking Approach
 * for Data Deduplication") — chunk boundaries chosen by the CONTENT
 * (a rolling gear hash crossing a mask), not by position. The property
 * that matters for dedup: inserting or deleting a prefix shifts every
 * fixed-size chunk boundary and destroys all chunk-hash matches, but a
 * content-defined boundary re-synchronizes within one chunk of the
 * edit, so the tail chunks of a shifted near-duplicate hash
 * identically — the storage-dedup trick applied to crawl snapshots
 * (same page re-fetched with a new header/banner) and training-corpus
 * shingling at chunk granularity.
 *
 * Gear rolling hash: h = (h << 1) + G(byte) — one shift+add per byte,
 * the table G derived deterministically from splitmix64 (no RNG
 * state, identical across JVMs). FastCDC normalization: a stricter
 * mask (more selective) before the target size and a looser one after
 * it, which tightens the chunk-size distribution around `avg` without
 * a second hash pass; hard `min`/`max` bounds cap pathological runs
 * (e.g. all-identical bytes never crossing the mask).
 *
 * Scale shape: a pure per-row kernel (one byte pass, zero allocation
 * beyond the output) behind a codegen expression — chunking never
 * shuffles; the dedup that follows is a chunk-hash equi-join like
 * every other candidate generator in the repo.
 */
object Cdc {

  /** splitmix64 — deterministic gear table, no RNG object. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val gear: Array[Long] = Array.tabulate(256)(i => mix64(i.toLong))

  /** FNV-1a 64 over a byte range — the chunk fingerprint. */
  def fnv64(bytes: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= (bytes(i) & 0xFF).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** Chunk boundaries of `bytes` under FastCDC with hard bounds
    * [min, max] and target `avg` (all powers of two recommended);
    * returns (start, len, fnv64) triples covering the input exactly. */
  def chunks(bytes: Array[Byte], min: Int, avg: Int, max: Int): Array[(Int, Int, Long)] = {
    require(0 < min && min <= avg && avg <= max, s"bounds $min/$avg/$max")
    val n = bytes.length
    if (n == 0) return Array.empty
    // FastCDC normalized masks: 2 extra selective bits before avg,
    // 2 fewer after — bits(avg) = log2(avg)
    val bits = 63 - java.lang.Long.numberOfLeadingZeros(avg.toLong)
    val maskS = (1L << (bits + 2)) - 1 // stricter
    val maskL = (1L << (bits - 2)) - 1 // looser
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long)]
    var start = 0
    while (start < n) {
      val remaining = n - start
      if (remaining <= min) {
        out += ((start, remaining, fnv64(bytes, start, remaining)))
        start = n
      } else {
        val limit = math.min(remaining, max)
        val normal = math.min(remaining, avg)
        var h = 0L
        var i = 0
        var cut = limit // default: hard max (or end)
        var found = false
        while (i < limit && !found) {
          h = (h << 1) + gear(bytes(start + i) & 0xFF)
          if (i >= min) {
            val mask = if (i < normal) maskS else maskL
            if ((h & mask) == 0L) { cut = i + 1; found = true }
          }
          i += 1
        }
        out += ((start, cut, fnv64(bytes, start, cut)))
        start += cut
      }
    }
    out.toArray
  }

  /** Codegen-facing: chunk a UTF8String's UTF-8 bytes into
    * (start, len, hash) struct rows. */
  def chunkText(text: UTF8String, min: Int, avg: Int, max: Int): ArrayData = {
    val b = text.getBytes
    val cs = chunks(b, min, avg, max)
    val rows = new Array[Any](cs.length)
    var i = 0
    while (i < cs.length) {
      rows(i) = new GenericInternalRow(
        Array[Any](cs(i)._1, cs(i)._2, cs(i)._3))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
