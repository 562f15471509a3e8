package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Label-propagation differential + structure tests: the synchronous
 * min-label-tie loop must match a naive driver-side simulation exactly
 * (it is integer-deterministic), collapse well-separated cliques to
 * their min id, and leave in-edge-less nodes labeled as themselves.
 */
class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(n: Int, edges: Seq[(Long, Long)],
                    iters: Int): Map[Long, Long] = {
    var lbl = (0L until n.toLong).map(v => v -> v).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    for (_ <- 1 to iters) {
      lbl = (0L until n.toLong).map { v =>
        in.get(v) match {
          case None => v -> lbl(v)
          case Some(srcs) =>
            val counts = srcs.groupBy(lbl).view.mapValues(_.size).toMap
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    lbl
  }

  test("two directed cliques converge to min-id labels; loner keeps its own") {
    // cliques 0-4 and 10-14 (all-pairs directed both ways), loner 20
    val clique = (base: Long) => for {
      i <- base until base + 5; j <- base until base + 5 if i != j
    } yield (i, j)
    val edges = clique(0L) ++ clique(10L)
    val got = LabelProp.run((0L to 20L).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 4L).foreach(v => assert(got(v) == 0L, s"clique-1 node $v: ${got(v)}"))
    (10L to 14L).foreach(v => assert(got(v) == 10L, s"clique-2 node $v: ${got(v)}"))
    assert(got(20L) == 20L)
    // and the full state matches the naive simulation
    assert(got == naive(21, edges, 3))
  }

  test("matches naive simulation on a pseudo-random directed graph") {
    val n = 40
    val edges = for {
      i <- 0L until n.toLong if i % 7 != 6
      j <- 1 to 3
    } yield (i, (i * 11 + j * 17) % n)
    for (iters <- Seq(1, 2, 4)) {
      val got = LabelProp.run((0L until n.toLong).toDF("id"), "id",
          edges.toDF("src", "dst"), "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive(n, edges, iters), s"iters=$iters")
    }
  }
}
