package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** In-test reference implementation of the SAME convention: word-count
    * training with (cnt desc, l, r) argmax and fixed-pass leftmost
    * replace (Java String.replace is one leftmost-non-overlapping pass,
    * exactly like the SQL/Spark `replace`). */
  private def naiveTrain(texts: Seq[String], k: Int, passes: Int = 6)
      : (Seq[(String, String)], Map[String, String]) = {
    val wc = texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var syms = wc.keys.map(w => w -> s" ${w.toCharArray.mkString(" ")} </w> ").toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to k) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (w, sym) =>
        val t = sym.trim.split(" ")
        t.sliding(2).foreach {
          case Array(a, b) => pairCnt((a, b)) = pairCnt.getOrElse((a, b), 0L) + wc(w)
          case _ => ()
        }
      }
      if (pairCnt.nonEmpty) {
        val ((l, r), _) = pairCnt.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r))
        syms = syms.view.mapValues { s =>
          (1 to passes).foldLeft(s)((acc, _) => acc.replace(s" $l $r ", s" $l$r "))
        }.toMap
      }
    }
    (merges.toSeq, syms)
  }

  private val corpus = Seq(
    "low low low lower lower newest newest newest newest widest",
    "widest widest newest newest low lowest ab ab abab aaaa aaaa a")

  test("train matches the reference implementation merge-for-merge") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (got, trained) = Bpe.train(docs, "text", numMerges = 12)
    val (want, wantSyms) = naiveTrain(corpus, 12)
    assert(got == want, s"merge sequences differ:\n got=$got\nwant=$want")

    // the trained symbol strings agree word-for-word
    val gotSyms = trained.select("word", "sym").as[(String, String)]
      .collect().toMap
    assert(gotSyms == wantSyms)
  }

  test("tokenCounts = sum of per-word symbol counts; merges only shrink it") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (_, t0) = Bpe.train(docs, "text", numMerges = 0)
    val (_, t8) = Bpe.train(docs, "text", numMerges = 8)
    def total(t: org.apache.spark.sql.DataFrame): Long =
      Bpe.tokenCounts(docs, "doc_id", "text", t)
        .agg(sum("n_tokens")).as[Long].head()
    val (n0, n8) = (total(t0), total(t8))
    // untrained: every word costs chars+1 (the </w> marker)
    val chars = corpus.flatMap(_.split("[^a-z]+").filter(_.nonEmpty))
    assert(n0 == chars.map(_.length + 1).sum)
    assert(n8 < n0, s"8 merges must compress: $n8 >= $n0")

    val (_, wantSyms) = naiveTrain(corpus, 8)
    val perDoc = Bpe.tokenCounts(docs, "doc_id", "text", t8)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    val wantPerDoc = corpus.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .map(w => wantSyms(w).trim.split(" ").length.toLong).sum
    }.toMap
    assert(perDoc == wantPerDoc)
  }
}
