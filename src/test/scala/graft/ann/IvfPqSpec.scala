package graft.ann

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * IVF-PQ composition properties on a deterministic clustered corpus:
 *  - cells partition the rows and match the driver-side argmin;
 *  - encode ≡ encodeFused (the self-join-free production encoder);
 *  - residual identity: rvec + centroid(cell) reconstructs the vector;
 *  - probing ALL cells at full width + exact re-rank ⇒ EXACTLY the
 *    brute-force top-k (completeness: the composition only prunes);
 *  - probe plan is deterministic, ranked by true cell distance, and
 *    its LUTs are the residual-query LUTs;
 *  - zero-quantization-error corpus: per-cell ADC ≡ exact distance.
 */
class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8
  // 4 well-separated cluster anchors; 40 vectors = anchor + small
  // deterministic jitter, so coarse Lloyd recovers the anchors
  private val anchors = Seq(
    Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
    Seq(100f, 0f, 0f, 0f, 100f, 0f, 0f, 0f),
    Seq(0f, 100f, 0f, 0f, 0f, 100f, 0f, 0f),
    Seq(0f, 0f, 100f, 0f, 0f, 0f, 100f, 0f))
  private def jitter(i: Int, d: Int): Float =
    (((i * 2654435761L + d * 40503L) % 7L).toFloat - 3f) * 0.25f
  private val vecs = (0 until 40).map { i =>
    val a = anchors(i % 4)
    (i.toLong, Array.tabulate(dim)(d => a(d) + jitter(i, d)))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding").coalesce(4)
  private lazy val idx = IvfPq.train(df, "vec_id", "embedding", dim,
    nCells = 4, m = 2, k = 4, iters = 3)

  private def bruteTop(q: Seq[Double], topK: Int): Seq[Long] =
    vecs.map { case (id, v) =>
      (id, v.map(_.toDouble).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(topK).map(_._1)

  test("cells partition rows; assignment matches driver-side argmin; residual identity") {
    val r = IvfPq.residuals(df, "vec_id", "embedding", idx.coarse)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getSeq[Double](2)))
    assert(r.length == 40)
    r.foreach { case (id, cell, rv) =>
      val v = vecs(id.toInt)._2.map(_.toDouble)
      val dists = idx.coarse.map(c =>
        v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      // ties → larger index (the argminCode convention); separated
      // clusters make ties impossible here
      assert(dists(cell) == dists.min, s"id=$id not in nearest cell")
      val rec = rv.zip(idx.coarse(cell)).map { case (a, b) => a + b }
      v.zip(rec).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    }
    assert(r.map(_._2).distinct.sorted.toSeq == Seq(0, 1, 2, 3), "all cells populated")
  }

  test("encode == encodeFused") {
    val a = IvfPq.encode(df, "vec_id", "embedding", idx)
      .select("vec_id", "cell", "codes")
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
    val b = IvfPq.encodeFused(df, "vec_id", "embedding", idx)
      .select("vec_id", "cell", "codes")
      .as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("probe plan: deterministic, distance-ranked, residual LUTs") {
    val q = vecs(9)._2.map(_.toDouble).toSeq
    val p = IvfPq.probe(q, idx, nProbe = 3)
    assert(p.map(_._2) == Seq(1, 2, 3))
    val cellDist = (j: Int) =>
      q.zip(idx.coarse(j)).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(p.map(x => cellDist(x._1)) == p.map(x => cellDist(x._1)).sorted)
    // LUT of the top probe equals the residual-query LUT built by hand
    val (j0, _, lut0) = p.head
    val qr = q.indices.map(i => q(i) - idx.coarse(j0)(i))
    assert(lut0 == Pq.lutFor(qr, idx.cb))
  }

  test("all cells + full width + exact re-rank == brute force exactly") {
    val codes = IvfPq.encodeFused(df, "vec_id", "embedding", idx)
    for (qi <- Seq(3, 17, 30)) {
      val q = vecs(qi)._2.map(_.toDouble).toSeq
      val probes = IvfPq.probe(q, idx, nProbe = idx.nCells)
        .map { case (cell, pr, lut) => (cell, pr, lut) }
        .toDF("cell", "probe_rank", "lut")
      val got = codes.join(broadcast(probes), Seq("cell"))
        .withColumn("adist", Pq.adcDistCol(col("codes"), col("lut")))
        // full width: every row is a candidate; exact re-rank drives order
        .join(df, Seq("vec_id"))
        .withColumn("dist", aggregate(
          zip_with(transform(col("embedding"), x => x.cast("double")),
            typedlit(q), (a, b) => (a - b) * (a - b)),
          lit(0.0d), (acc, x) => acc + x))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .select("vec_id").as[Long].take(5).toSeq
      assert(got == bruteTop(q, 5), s"query $qi full-probe != brute")
    }
  }

  test("at-rest index: probe reads ONLY the probed cells' partition files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    IvfPq.writeIndex(IvfPq.encodeFused(df, "vec_id", "embedding", idx), dir)
    val opened = IvfPq.openIndex(spark, dir)
    assert(opened.count() == 40)
    val q = vecs(7)._2.map(_.toDouble).toSeq
    val probed = IvfPq.probe(q, idx, nProbe = 2).map(_._1)
    assert(opened.select("cell").distinct().count() == 4)
    val pruned = opened.filter(col("cell").isin(probed: _*))
    // planning-time partition pruning, asserted from the executed scan's
    // own metrics (NOT inputFiles, which is best-effort on the base
    // relation and ignores partition filters): of the 4 cell directories
    // on disk, the scan selects exactly the nProbe = 2 probed ones
    val got = pruned.collect().map(_.getAs[Long]("vec_id")).toSet
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numPartitions").value == 2,
      s"expected 2 pruned cell partitions, scanned ${scan.metrics("numPartitions").value}")
    val want = IvfPq.encodeFused(df, "vec_id", "embedding", idx)
      .filter(col("cell").isin(probed: _*))
      .select("vec_id").as[Long].collect().toSet
    assert(got == want)
  }

  test("candidate scan touches only probed cells") {
    val codes = IvfPq.encodeFused(df, "vec_id", "embedding", idx)
    val q = vecs(12)._2.map(_.toDouble).toSeq
    val probes = IvfPq.probe(q, idx, nProbe = 2)
      .map { case (cell, pr, lut) => (cell, pr, lut) }
      .toDF("cell", "probe_rank", "lut")
    val scanned = codes.join(broadcast(probes), Seq("cell"))
      .select("cell").distinct().as[Int].collect().toSet
    assert(scanned == IvfPq.probe(q, idx, 2).map(_._1).toSet)
    assert(scanned.size == 2)
  }
}
