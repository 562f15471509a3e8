package graft.graph

import graft.SparkTestBase

/**
 * HyperANF differential tests: exactBalls must match a naive
 * driver-side BFS ball computation on arbitrary graphs (cycles,
 * danglers, multi-edges), and the HLL sketch path must track the
 * exact path within the p=12 small-ball regime on every node.
 */
class HyperAnfSpec extends SparkTestBase {
  import spark.implicits._

  private def naiveBalls(n: Int, edges: Seq[(Long, Long)], hops: Int)
  : Map[Long, Seq[Long]] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    (0L until n.toLong).map { v =>
      var ball = Set(v)
      val sizes = (1 to hops).map { _ =>
        ball = ball ++ ball.flatMap(adj.getOrElse(_, Nil))
        ball.size.toLong
      }
      v -> sizes
    }.toMap
  }

  test("exact balls match naive BFS; sketch tracks exact per node") {
    val n = 40
    val edges = (for (i <- 0L until 40L; j <- 1 to 2)
      yield (i, (i * 13 + j * 7) % 40)) ++
      Seq((3L, 3L), (5L, 9L), (5L, 9L)) // self-loop + multi-edge
    val want = naiveBalls(n, edges, 3)
    val exact = HyperAnf.exactBalls((0L until n.toLong).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", hops = 3)
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(exact == want)

    val est = HyperAnf.sketchBalls((0L until n.toLong).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", hops = 3)
      .collect()
      .map(r => r.getLong(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    for (v <- 0L until n.toLong; t <- 0 until 3) {
      val (ex, es) = (want(v)(t).toDouble, est(v)(t))
      assert(math.abs(es - ex) / ex <= 0.15,
        s"sketch off at node $v hop ${t + 1}: est=$es exact=$ex")
    }
  }

  test("isolated node: ball stays {self} at every hop") {
    val got = HyperAnf.exactBalls((0L to 2L).toDF("id"), "id",
        Seq((0L, 1L)).toDF("src", "dst"), "src", "dst", hops = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(2L) == (1L, 1L))
    assert(got(0L) == (2L, 2L))
    assert(got(1L) == (1L, 1L))
  }
}
