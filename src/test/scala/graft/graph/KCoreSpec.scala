package graft.graph

import graft.SparkTestBase

/**
 * k-core peeling differential tests: the synchronous loop must match a
 * naive sequential peel (the two agree because peeling order never
 * changes the k-core — it is the unique maximal subgraph), handle
 * cascades (a chain hanging off a clique peels link by link), and
 * refuse to return an unconverged answer.
 */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(n: Int, edges: Seq[(Long, Long)], k: Int)
  : Map[Long, Long] = {
    val u = edges.flatMap { case (a, b) =>
      if (a == b) Nil else Seq((math.min(a, b), math.max(a, b)))
    }.toSet
    var alive = (0L until n.toLong).toSet
    var changed = true
    while (changed) {
      val deg = alive.map(v =>
        v -> u.count(e => (e._1 == v && alive(e._2)) ||
          (e._2 == v && alive(e._1)))).toMap
      val next = alive.filter(deg(_) >= k)
      changed = next != alive
      alive = next
    }
    val coreDeg = alive.map(v =>
      v -> u.count(e => (e._1 == v && alive(e._2)) ||
        (e._2 == v && alive(e._1))).toLong).toMap
    (0L until n.toLong).map(v => v -> coreDeg.getOrElse(v, 0L)).toMap
  }

  test("clique + hanging chain: chain cascades off, clique survives k=3") {
    // K5 on 0..4, chain 4-5-6-7, isolated 8
    val edges = (for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)) ++
      Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = KCore.membership((0L to 8L).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst", k = 3, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    for (v <- 0L to 4L) assert(got(v) == (true, 4L), s"clique node $v")
    for (v <- 5L to 8L) assert(got(v) == (false, 0L), s"peeled node $v")
  }

  test("matches naive peel on a hashed graph across k") {
    val n = 40
    val edges = for (i <- 0L until 40L; j <- 1 to 3)
      yield (i, (i * 13 + j * 7) % 40)
    for (k <- 2 to 5) {
      val got = KCore.membership((0L until n.toLong).toDF("id"), "id",
          edges.toDF("src", "dst"), "src", "dst", k = k, maxRounds = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == naive(n, edges, k), s"k=$k")
    }
  }

  test("unconverged peel throws instead of returning a wrong set") {
    // long chain with k=2: every round peels exactly the two endpoints,
    // so 12 nodes need ~6 rounds — cap at 2 must throw
    val chain = (0L until 11L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      KCore.membership((0L to 11L).toDF("id"), "id",
        chain.toDF("src", "dst"), "src", "dst", k = 2, maxRounds = 2)
    }
  }
}
