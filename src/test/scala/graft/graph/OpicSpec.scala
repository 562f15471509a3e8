package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * OPIC differential + invariant tests: the synchronous cash/history
 * loop must match a naive driver-side simulation exactly, conserve
 * total cash at 1 through every round (dangling pages bank via the
 * virtual page), and produce importances that sum to 1.
 */
class OpicSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(n: Int, edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, (Double, Double)] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var c = (0L until n.toLong).map(_ -> 1.0 / n).toMap
    var h = (0L until n.toLong).map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      val dangling = c.collect { case (u, cu) if !out.contains(u) => cu }.sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => c(u) / out(u) }.sum).toMap
      h = h.map { case (v, hv) => v -> (hv + c(v)) }
      c = (0L until n.toLong).map(v =>
        v -> (in.getOrElse(v, 0.0) + dangling / n)).toMap
    }
    (0L until n.toLong).map(v => v -> ((c(v), h(v)))).toMap
  }

  test("opic matches naive simulation; cash conserved; importance sums to 1") {
    val n = 30
    val edges = for {
      i <- 0L until n.toLong if i % 5 != 4 // ≡4 (mod 5) dangling
      j <- 1 to 3
    } yield (i, (i * 7 + j * 11) % n)
    val got = Opic.run((0L until n.toLong).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Double]("cash"), r.getAs[Double]("hist"),
          r.getAs[Double]("importance")))).toMap
    val want = naive(n, edges, 4)
    got.foreach { case (id, (c, h, _)) =>
      val (wc, wh) = want(id)
      assert(math.abs(c - wc) < 1e-12, s"cash node $id: $c vs $wc")
      assert(math.abs(h - wh) < 1e-12, s"hist node $id: $h vs $wh")
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9, "Σ cash must stay 1")
    assert(math.abs(got.values.map(_._2).sum - 4.0) < 1e-9, "Σ hist must be T")
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9, "Σ importance must be 1")
  }

  test("star graph: the hub's history dwarfs the leaves'") {
    // leaves 1..9 all point at hub 0; hub is dangling (banks its cash)
    val edges = (1L to 9L).map(i => (i, 0L))
    val got = Opic.run((0L to 9L).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("importance")).toMap
    val leafMax = (1L to 9L).map(got).max
    assert(got(0L) > 3 * leafMax, s"hub ${got(0L)} vs leaf max $leafMax")
  }
}
