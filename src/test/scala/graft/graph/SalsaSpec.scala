package graft.graph

import graft.SparkTestBase

/**
 * SALSA differential tests: the two-half-join iteration must match a
 * naive driver-side walk, conserve mass exactly (stochastic
 * transitions — no HITS-style renormalization), and approach the
 * known stationary distribution (authority ∝ in-degree on a connected
 * support) as iterations grow.
 */
class SalsaSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(edges: Seq[(Long, Long)], iters: Int)
  : (Map[Long, Double], Map[Long, Double]) = {
    val e = edges.distinct
    val ind = e.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val outd = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var a = ind.keys.map(_ -> 1.0 / ind.size).toMap
    var h = outd.keys.map(_ -> 1.0 / outd.size).toMap
    for (_ <- 1 to iters) {
      val s = e.groupBy(_._1).view.mapValues(
        _.map { case (_, j) => a(j) / ind(j) }.sum).toMap
      a = e.groupBy(_._2).view.mapValues(
        _.map { case (i, _) => s(i) / outd(i) }.sum).toMap
      val t = e.groupBy(_._2).view.mapValues(
        _.map { case (i, _) => h(i) / outd(i) }.sum).toMap
      h = e.groupBy(_._1).view.mapValues(
        _.map { case (_, j) => t(j) / ind(j) }.sum).toMap
    }
    (a, h)
  }

  test("matches naive walk; mass conserved exactly") {
    val n = 25
    val edges = for (i <- 0L until 25L; j <- 1 to 3)
      yield (i, (i * 11 + j * 17) % 25)
    val got = Salsa.run((0L until n.toLong).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val (wa, wh) = naive(edges, 4)
    for (v <- 0L until n.toLong) {
      assert(math.abs(got(v)._1 - wa.getOrElse(v, 0.0)) < 1e-12, s"auth $v")
      assert(math.abs(got(v)._2 - wh.getOrElse(v, 0.0)) < 1e-12, s"hub $v")
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("uniform is the exact fixed point on a 2-regular graph") {
    // i -> i+1, i -> i+4: indeg = outdeg = 2 everywhere, so the SALSA
    // stationary authority/hub distribution (∝ indeg / ∝ outdeg) IS
    // the uniform start — every iteration must reproduce it exactly
    val edges = (0L until 12L).flatMap(i =>
      Seq((i, (i + 1) % 12), (i, (i + 4) % 12)))
    val got = Salsa.run((0L until 12L).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    for (v <- 0L until 12L) {
      assert(math.abs(got(v)._1 - 1.0 / 12) < 1e-12, s"authority at $v")
      assert(math.abs(got(v)._2 - 1.0 / 12) < 1e-12, s"hub at $v")
    }
  }
}
