package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-weighted term scoring — the two classic frequency models a
 * webtext pipeline derives from its own corpus:
 *
 *   - [[topTerms]]: smoothed TF-IDF keyword extraction (tf ·
 *     (ln((N+1)/(df+1)) + 1), the sklearn-style smooth idf), top-k
 *     terms per document;
 *   - [[UnigramLm.score]] (below): unigram negative-log-likelihood — the
 *     cheap stand-in for the CCNet LM-perplexity quality signal, scored
 *     from the corpus's own unigram distribution.
 *
 * Scale shape: one words-explode of the corpus → (doc, term) counts
 * (map-side combinable) → term document-frequencies are a second hash
 * agg over the distinct (doc, term) pairs — both shuffles carry only
 * term keys, never text. N is a 1-row broadcast. Ranking ties are
 * broken on the ROUNDED score then term (both engines order on
 * identical quantities — the q28 tie lesson).
 */
object Tfidf {

  /** Top-k TF-IDF terms per doc: (id, term, tf, df, score, rank). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(TextOps.words(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false) // feeds both df-agg and the score join
    val dfreq = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = terms
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }
}

/**
 * Corpus-unigram negative log-likelihood: avg over a doc's words of
 * −ln p(term), p from the corpus's own counts — low = templated/common
 * language, high = rare-token soup; both tails get filtered in a CCNet
 * style quality gate.
 */
object UnigramLm {

  /** (id, n_words, nll) with nll = round(avg −ln p(term), 4); wordless
    * docs score 0.0. The unigram table is corpus-derived and joined on
    * the exploded words (term-key shuffle; the model itself is a
    * DataFrame — at 100 TB it stays distributed, no driver collect). */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode_outer(TextOps.words(col(textCol))).as("term"))
      .localCheckpoint(false) // feeds the model agg and the score join
    val present = exploded.filter(col("term").isNotNull)
    val total = present.agg(count(lit(1)).cast("double").as("__t"))
    val model = present.groupBy("term").agg(count(lit(1)).as("cnt"))
    exploded
      .join(model, Seq("term"), "left") // null term rows keep the doc alive
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(col("term")).as("n_words"),
        round(coalesce(avg(-log(col("cnt") / col("__t"))), lit(0.0)), 4).as("nll"))
  }
}

/**
 * Interpolated bigram language model — the next rung above [[UnigramLm]]
 * toward the CCNet KenLM-perplexity quality signal: a CONDITIONAL model,
 * so templated token soup ("a a a a") that fools unigram frequency gets
 * a proper (low-surprise) score and rare-but-grammatical text is not
 * over-penalized.
 *
 *   p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/T
 *
 * with c(w₁·) the bigram-context count (NOT the unigram count — a doc's
 * final word opens no context), T the corpus word total, and Jelinek-
 * Mercer interpolation weight λ. Per-doc score = avg over the doc's
 * bigram tokens of −ln p; docs with < 2 words score 0.
 *
 * Scale shape: one words-projection feeds both the bigram explode and
 * the unigram explode; all three count tables (bigram, context,
 * unigram) are map-side-combinable hash aggs keyed on terms; scoring
 * joins the bigram-instance table against them on term keys only —
 * text never shuffles, the model never collects.
 */
object BigramLm {

  /** (id, n_bigrams, nll) with nll = round(avg −ln p(w₂|w₁), 4). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lambda: Double = 0.7): DataFrame = {
    val base = docs
      .select(col(idCol), TextOps.words(col(textCol)).as("__ws"))
      .localCheckpoint(false) // feeds bigrams, unigrams, and the doc spine
    val bigrams = base
      .select(col(idCol),
        explode(when(size(col("__ws")) >= 2,
          arrays_zip(
            slice(col("__ws"), lit(1), size(col("__ws")) - 1).as("w1"),
            slice(col("__ws"), lit(2), size(col("__ws")) - 1).as("w2")))
          .otherwise(array())).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .localCheckpoint(false) // feeds cb, cc, and the scoring join
    val unigrams = base.select(explode(col("__ws")).as("term"))
    val cb = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("__cb"))
    val cc = bigrams.groupBy("w1").agg(count(lit(1)).as("__cc"))
    val cu = unigrams.groupBy("term").agg(count(lit(1)).as("__cu"))
    val total = unigrams.agg(count(lit(1)).cast("double").as("__t"))
    val scored = bigrams
      .join(cb, Seq("w1", "w2"))
      .join(cc, Seq("w1"))
      .join(cu, bigrams("w2") === cu("term"))
      .crossJoin(broadcast(total))
      .select(col(idCol),
        (-log(lit(lambda) * (col("__cb") / col("__cc")) +
          (lit(1.0) - lambda) * (col("__cu") / col("__t")))).as("__lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("__nb"), avg("__lp").as("__nll"))
    base.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nb"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("__nll"), lit(0.0)), 4).as("nll"))
  }
}
