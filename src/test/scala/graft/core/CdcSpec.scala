package graft.core

import graft.SparkTestBase
import graft.functions.gf
import org.apache.spark.sql.functions._

/**
 * FastCDC properties: exact coverage, size bounds, determinism, the
 * shift-invariance that motivates content-defined over fixed-size
 * chunking (prefix insertion preserves most chunk hashes; fixed-size
 * chunking preserves none), locality of edits, near-zero collision
 * between unrelated texts, and the expression path.
 */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic pseudo-random ASCII text (splitmix-style chain). */
  private def synthText(seed: Long, n: Int): String = {
    val sb = new StringBuilder(n)
    var z = seed
    (0 until n).foreach { _ =>
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x = x ^ (x >>> 31)
      val r = java.lang.Long.remainderUnsigned(x, 27L).toInt
      sb.append(if (r == 26) ' ' else ('a' + r).toChar)
    }
    sb.toString
  }

  private val (mn, av, mx) = (64, 256, 1024)

  test("chunks cover the input exactly; size bounds hold; deterministic") {
    val text = synthText(1L, 5000)
    val b = text.getBytes("UTF-8")
    val cs = Cdc.chunks(b, mn, av, mx)
    assert(cs.head._1 == 0)
    assert(cs.map(_._2).sum == b.length)
    cs.sliding(2).foreach { case Array((s1, l1, _), (s2, _, _)) =>
      assert(s2 == s1 + l1)
    case _ => }
    cs.dropRight(1).foreach { case (_, l, _) => assert(l > mn && l <= mx) }
    assert(cs.last._2 <= mx)
    // per-chunk hash = fnv64 of exactly that range
    cs.foreach { case (s, l, h) => assert(h == Cdc.fnv64(b, s, l)) }
    assert(Cdc.chunks(b, mn, av, mx).toSeq == cs.toSeq)
    assert(Cdc.chunks(Array.empty[Byte], mn, av, mx).isEmpty)
  }

  test("prefix insertion: content-defined boundaries re-synchronize") {
    val a = synthText(2L, 6000)
    val shifted = synthText(99L, 137) + a // 137-byte prefix, not 0 mod any chunk size
    val ha = Cdc.chunks(a.getBytes("UTF-8"), mn, av, mx).map(_._3).toSet
    val hb = Cdc.chunks(shifted.getBytes("UTF-8"), mn, av, mx).map(_._3).toSet
    val shared = (ha & hb).size.toDouble / ha.size
    assert(shared >= 0.7, s"shared=$shared — boundaries failed to re-sync")
    // the fixed-size strawman: same-width position slices share NOTHING
    val fixA = a.getBytes("UTF-8").grouped(256).map(g => Cdc.fnv64(g, 0, g.length)).toSet
    val fixB = shifted.getBytes("UTF-8").grouped(256).map(g => Cdc.fnv64(g, 0, g.length)).toSet
    assert((fixA & fixB).size.toDouble / fixA.size <= 0.05)
  }

  test("a point edit changes only O(1) chunks; unrelated texts share none") {
    val a = synthText(3L, 6000)
    val edited = a.substring(0, 3000) + "X" + a.substring(3001)
    val ha = Cdc.chunks(a.getBytes("UTF-8"), mn, av, mx).map(_._3)
    val hb = Cdc.chunks(edited.getBytes("UTF-8"), mn, av, mx).map(_._3)
    val changed = (ha.toSet diff hb.toSet).size
    assert(changed <= 3, s"point edit invalidated $changed chunks")
    val hc = Cdc.chunks(synthText(4L, 6000).getBytes("UTF-8"), mn, av, mx).map(_._3).toSet
    assert((ha.toSet & hc).isEmpty)
  }

  test("expression path: coverage via SQL aggregation; codegen survives") {
    val df = Seq((1L, synthText(5L, 3000)), (2L, synthText(6L, 300)),
      (3L, "tiny")).toDF("id", "text")
    val got = df.select(col("id"), gf.cdc_chunks(col("text")).as("cs"),
        octet_length(col("text")).as("bytes"))
      .select(col("id"),
        size(col("cs")).as("n"),
        aggregate(transform(col("cs"), c => c.getField("len")),
          lit(0), (s, x) => s + x).as("covered"),
        col("bytes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    got.foreach { case (id, n, covered, bytes) =>
      assert(n >= 1 && covered == bytes, s"id=$id n=$n covered=$covered bytes=$bytes")
    }
  }
}
