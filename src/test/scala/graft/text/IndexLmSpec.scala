package graft.text

import graft.SparkTestBase

/** Hand-computed fixtures for the inverted index and the interpolated
  * bigram LM (q77/q78). */
class IndexLmSpec extends SparkTestBase {
  import spark.implicits._

  test("inverted index: df/total_tf/postings on a hand corpus") {
    val docs = Seq(
      (1L, "a b a"), (2L, "b b c"), (3L, "a")).toDF("doc_id", "text")
    val got = InvertedIndex.build(docs, "doc_id", "text", cap = 10)
      .orderBy("term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("a", 2L, 3L, "1:2,3:1"),   // tf desc, then id asc
      ("b", 2L, 3L, "2:2,1:1"),
      ("c", 1L, 1L, "2:1")))
  }

  test("inverted index: posting list capped, stats uncapped") {
    // 15 docs all containing "x"; doc i repeats it i+1 times
    val docs = (0L until 15L).map(i => (i, Seq.fill(i.toInt + 1)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val r = InvertedIndex.build(docs, "doc_id", "text", cap = 10).head()
    assert(r.getAs[Long]("df") == 15L)
    assert(r.getAs[Long]("total_tf") == (1 to 15).sum.toLong)
    val posts = r.getAs[String]("postings").split(",")
    assert(posts.length == 10)
    // top tf first: doc 14 (tf 15) … doc 5 (tf 6)
    assert(posts.head == "14:15" && posts.last == "5:6")
  }

  test("bigram LM: hand-computed interpolated NLL; short docs score 0") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"), (5L, "")
    ).toDF("doc_id", "text")
    val got = BigramLm.score(docs, "doc_id", "text", lambda = 0.7)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // corpus: bigrams (a,b)x2 (a,c)x1, cc(a)=3; unigrams a:3 b:2 c:1 z:1 T=7
    def nll(p: Double) = BigDecimal(-math.log(p)) // Spark round = HALF_UP
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = 0.7 * (2.0 / 3) + (1.0 - 0.7) * (2.0 / 7)
    val pAC = 0.7 * (1.0 / 3) + (1.0 - 0.7) * (1.0 / 7)
    assert(got.toSeq == Seq(
      (1L, 1L, nll(pAB)), (2L, 1L, nll(pAB)), (3L, 1L, nll(pAC)),
      (4L, 0L, 0.0), (5L, 0L, 0.0)))
  }

  test("Kneser-Ney: hand-computed held-out NLL; all four branches fire") {
    // model: bigrams (a,b)x2 (a,c)x1 → cb={ab:2, ac:1}; ctx(a): cc=3,
    // n1f=2; cont: b→1, c→1; bigram types bt=2; p_cont(b)=p_cont(c)=1/2,
    // OOV p_cont=0.5/2=0.25. D=0.75.
    val model = Seq((10L, "a b"), (11L, "a b"), (12L, "a c"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b a z c b"), // (a,b) seen; (b,a)/(z,c)/(c,b) unseen-ctx;
                           // (a,z) seen-ctx + unseen pair + OOV cont
      (2L, "a b"),         // the pure discounted-count branch
      (3L, "q"), (4L, "")  // short docs → 0
    ).toDF("doc_id", "text")
    val got = KneserNey.score(eval, model, "doc_id", "text", discount = 0.75)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = (2.0 - 0.75) / 3 + 0.75 * 2 / 3 * 0.5 // = 2/3
    val pBA = 0.25  // w1 unseen, 'a' never closes a bigram → OOV floor
    val pAZ = 0.0 / 3 + 0.75 * 2 / 3 * 0.25 // seen ctx, unseen pair+cont
    val pZC = 0.5   // w1 unseen, p_cont(c)
    val pCB = 0.5
    val nll1 = r4(Seq(pAB, pBA, pAZ, pZC, pCB).map(p => -math.log(p)).sum / 5)
    assert(got.toSeq == Seq(
      (1L, 5L, nll1), (2L, 1L, r4(-math.log(pAB))),
      (3L, 0L, 0.0), (4L, 0L, 0.0)))
  }
}
