package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Multi-source BFS differential tests: the level-synchronous loop must
 * match a naive driver-side BFS on arbitrary graphs (cycles, multiple
 * seeds, unreachable islands), respect the hop cap, and be indifferent
 * to multi-edges.
 */
class BfsSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(n: Int, edges: Seq[(Long, Long)], seeds: Set[Long],
                    maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(adj.getOrElse(_, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    (0L until n.toLong).map(v => v -> dist.getOrElse(v, -1L)).toMap
  }

  test("seed hops match naive BFS on a cyclic graph with an unreachable island") {
    val n = 40
    // main component 0..29 (cycle-ish chains), island 30..39 seedless
    val edges = (for (i <- 0L until 30L; j <- 1 to 2)
      yield (i, (i * 5 + j * 3) % 30)) ++
      (for (i <- 30L until 40L) yield (i, 30L + (i + 1) % 10))
    val seeds = Set(0L, 17L)
    val got = Bfs.seedHops((0L until n.toLong).toDF("id"), "id",
        edges.toDF("src", "dst"), "src", "dst",
        seeds.toSeq.toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = naive(n, edges, seeds, 4)
    assert(got == want)
    (30L until 40L).foreach(v => assert(got(v) == -1L, s"island node $v reached"))
    assert(got(0L) == 0L && got(17L) == 0L)
  }

  test("hop cap truncates: a long chain reports -1 past the cap; multi-edges harmless") {
    val chain = (0L until 8L).map(i => (i, i + 1)) ++ Seq((0L, 1L), (0L, 1L))
    val got = Bfs.seedHops((0L to 8L).toDF("id"), "id",
        chain.toDF("src", "dst"), "src", "dst",
        Seq(0L).toDF("id"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(i => got(i) == i))
    assert((4L to 8L).forall(i => got(i) == -1L))
  }
}
