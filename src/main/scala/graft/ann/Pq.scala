package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization for approximate nearest-neighbor search
 * (Jégou, Douze, Schmid, TPAMI 2011 "Product Quantization for Nearest
 * Neighbor Search") — the memory-side complement of [[Similarity]]'s
 * IVF partition pruning: each `dim`-dimensional vector is split into
 * `m` subvectors, each subvector quantized to one of `k` per-subspace
 * centroids, so a vector stores as `m` small codes (m bytes at k ≤ 256)
 * instead of `dim` floats — 32× compression at the q115 shape
 * (64 float32 dims → 8 codes). Queries score compressed codes by ADC
 * (asymmetric distance computation): a per-query LUT of
 * ‖q_sub − centroid‖² entries is built driver-side (m·k doubles), and a
 * row's approximate squared L2 distance is the sum of `m` table
 * lookups — no float vector is touched until the exact re-rank of the
 * top-C candidates.
 *
 * Scale shape: codebook training is Lloyd over ALL subspaces fused
 * into ONE distributed pass per iteration (posexplode to (subspace,
 * subvector), assign against the broadcast codebook literal, one hash
 * agg of per-cell element sums; only m·k·dsub doubles ever reach the
 * driver — the [[Similarity.ivfCentroids]] contract). Encoding is a
 * single projection (no shuffle). The ADC scan reads only the code
 * column (1/32 of the raw bytes); candidate selection is a per-query
 * top-C window; the exact re-rank rehydrates ONLY the C candidates by
 * id equi-join. At 100 TB this composes with IVF ([[Similarity
 * .ivfAssign]] cells partition the code table; a probe ADC-scans only
 * nProbe cells) — the standard IVF-PQ layout; q115 exercises the PQ
 * half on the flat table.
 *
 * The reference has no vector index at all (similarity there is
 * `difflib.SequenceMatcher` on strings, deduplicator.py:236) — this is
 * beyond-reference training-data tooling (SURVEY §2.11).
 */
object Pq {

  /** Trained per-subspace codebooks: `cents(mi)(j)` is the j-th
    * centroid (length `dsub`) of subspace `mi`. */
  final case class Codebook(m: Int, dsub: Int, k: Int,
                            cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    require(cents.length == m && cents.forall(_.length == k) &&
      cents.forall(_.forall(_.length == dsub)), "codebook shape mismatch")
    def dim: Int = m * dsub
  }

  /** j = 0..k-1 index literal zipped against a centroid list. */
  private def jLit(k: Int): Column = array((0 until k).map(lit): _*)

  /** Squared L2 between an array<double> column and a lambda-bound
    * centroid array — one fused pass. */
  private[ann] def sqDist(x: Column, c: Column): Column =
    aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
      lit(0.0d), (s, v) => s + v)

  /** argmin_j ‖sub − cents(j)‖² as a column (ties → larger j, the
    * [[Similarity]] assignTo convention; deterministic either way). */
  private[ann] def argminCode(sub: Column, cents: Column, k: Int): Column =
    array_max(zip_with(cents, jLit(k),
      (cv, j) => struct((-sqDist(sub, cv)).as("s"), j.as("j")))).getField("j")

  /** Subvector `mi` of a float-array column, cast to double once. */
  private[ann] def subvec(vec: Column, mi: Int, dsub: Int): Column =
    transform(slice(vec, mi * dsub + 1, dsub), x => x.cast("double"))

  /**
   * Train per-subspace codebooks: seeded with the subvectors of the
   * first `k` vectors by id (deterministic), refined by `iters` Lloyd
   * rounds — each round ONE distributed assign+sum pass covering all
   * `m` subspaces (posexplode), and an m·k-row collect. Empty cells
   * keep their previous centroid so every subspace stays k-ary.
   */
  def train(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int = 8, k: Int = 16, iters: Int = 2): Codebook = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val seeds = vectors.orderBy(col(idCol).asc).limit(k)
      .select((0 until m).map(mi => subvec(col(vecCol), mi, dsub).as(s"s$mi")): _*)
      .collect()
    require(seeds.length == k, s"need >= $k vectors to seed, got ${seeds.length}")
    var cents: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
      (0 until m).map(mi => seeds.toIndexedSeq.map(r =>
        r.getSeq[Double](mi).toIndexedSeq))
    for (_ <- 0 until iters) {
      val cbLit = typedlit(cents)
      val subs = vectors.select(posexplode(array((0 until m).map(mi =>
        subvec(col(vecCol), mi, dsub)): _*)).as(Seq("mi", "sv")))
      val sums = subs
        .withColumn("code",
          argminCode(col("sv"), element_at(cbLit, col("mi") + 1), k))
        .groupBy("mi", "code")
        .agg(count(lit(1)).as("n"),
          (0 until dsub).map(i =>
            sum(element_at(col("sv"), i + 1)).as(s"c$i")): _*)
        .collect()
      val refined: Map[(Int, Int), IndexedSeq[Double]] = sums.map { r =>
        val n = r.getLong(2).toDouble
        (r.getInt(0), r.getInt(1)) ->
          (0 until dsub).map(i => r.getDouble(3 + i) / n)
      }.toMap
      cents = (0 until m).map(mi => (0 until k).map(j =>
        refined.getOrElse((mi, j), cents(mi)(j))))
    }
    Codebook(m, dsub, k, cents)
  }

  /** Encode every vector to its `m` codes — one projection, no
    * shuffle: (idCol, codes array<int>). */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame =
    vectors.select(col(idCol), array((0 until cb.m).map { mi =>
      argminCode(subvec(col(vecCol), mi, cb.dsub), typedlit(cb.cents(mi)), cb.k)
    }: _*).as("codes"))

  /** Per-query ADC lookup table: lut(mi)(j) = ‖q_mi − cents(mi)(j)‖²
    * (driver-side, m·k doubles). */
  def lutFor(query: Seq[Double], cb: Codebook): IndexedSeq[IndexedSeq[Double]] = {
    require(query.length == cb.dim, s"query dim ${query.length} != ${cb.dim}")
    (0 until cb.m).map { mi =>
      val q = query.slice(mi * cb.dsub, (mi + 1) * cb.dsub)
      cb.cents(mi).map { cv =>
        var s = 0.0; var i = 0
        while (i < cb.dsub) { val d = q(i) - cv(i); s += d * d; i += 1 }
        s
      }
    }
  }

  /** Approximate squared L2 distance of a codes column to the query a
    * LUT was built for: m table lookups, no vector math. */
  def adcDist(codes: Column, lut: IndexedSeq[IndexedSeq[Double]]): Column =
    adcDistCol(codes, typedlit(lut))

  /** ADC against a COLUMN-borne LUT (array<array<double>>) — the
    * [[IvfPq]] probe shape, where each (query, probed cell) pair joins
    * its own residual LUT onto the scanned codes. */
  def adcDistCol(codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, lut, (c, row) => element_at(row, c + 1)),
      lit(0.0d), (s, v) => s + v)
}
