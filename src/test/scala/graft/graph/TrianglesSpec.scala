package graft.graph

import graft.SparkTestBase

/**
 * Triangle counting differential tests: the degree-ordered wedge-close
 * pipeline must match a naive O(n^3) enumeration on arbitrary graphs,
 * count each triangle exactly once regardless of edge direction,
 * multi-edges, reciprocal pairs, or self-loops, and report exact
 * clustering coefficients.
 */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(n: Int, edges: Seq[(Long, Long)])
  : Map[Long, (Long, Long, Double)] = {
    val u = edges.flatMap { case (a, b) =>
      if (a == b) Nil else Seq((math.min(a, b), math.max(a, b)))
    }.toSet
    val deg = (0L until n.toLong).map(v =>
      v -> u.count(e => e._1 == v || e._2 == v).toLong).toMap
    def adj(a: Long, b: Long) = u.contains((math.min(a, b), math.max(a, b)))
    val triPerNode = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (x <- 0L until n.toLong; y <- x + 1 until n.toLong;
         z <- y + 1 until n.toLong)
      if (adj(x, y) && adj(y, z) && adj(x, z)) {
        triPerNode(x) += 1; triPerNode(y) += 1; triPerNode(z) += 1
      }
    (0L until n.toLong).map { v =>
      val d = deg(v); val t = triPerNode(v)
      val c = if (d >= 2) 2.0 * t / (d.toDouble * (d - 1).toDouble) else 0.0
      v -> (d, t, c)
    }.toMap
  }

  test("matches naive enumeration on a hashed graph with loops and reciprocals") {
    val n = 30
    val edges = (for (i <- 0L until 30L; j <- 1 to 3)
      yield (i, (i * 7 + j * 11) % 30)) ++
      Seq((5L, 5L), (2L, 9L), (9L, 2L), (2L, 9L)) // self-loop + dup + reciprocal
    val got = Triangles.perNode((0L until n.toLong).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val want = naive(n, edges)
    assert(got.keySet == want.keySet)
    for (v <- got.keySet) {
      assert(got(v)._1 == want(v)._1, s"degree mismatch at $v")
      assert(got(v)._2 == want(v)._2, s"triangle count mismatch at $v")
      assert(math.abs(got(v)._3 - want(v)._3) < 1e-12, s"clustering at $v")
    }
    assert(got.values.map(_._2).sum > 0, "test graph has no triangles")
  }

  test("K4 and an isolated node: exact closed-form counts") {
    // complete graph on {0,1,2,3}: every node is in C(3,2)=3 triangles,
    // degree 3, clustering 1.0; node 4 isolated
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val got = Triangles.perNode((0L to 4L).toDF("id"), "id",
        k4.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    for (v <- 0L to 3L) assert(got(v) == (3L, 3L, 1.0))
    assert(got(4L) == (0L, 0L, 0.0))
  }

  test("triangle-free graph (star) reports zero triangles, correct degrees") {
    val star = (1L to 6L).map(i => (0L, i))
    val got = Triangles.perNode((0L to 6L).toDF("id"), "id",
        star.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(0L) == (6L, 0L, 0.0))
    for (v <- 1L to 6L) assert(got(v) == (1L, 0L, 0.0))
  }
}
