package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed logistic-regression trainer for document-quality
 * classification — the DCLM/fastText-shaped "learned quality filter"
 * rung above the hand-weighted heuristics (TextOps.qualityScore) and
 * the generative DSIR log-ratio model ([[Dsir]]): given labeled docs,
 * learn `w` over hashed bag-of-words features and score the corpus
 * with `σ(w·x)`.
 *
 * 100 TB shape: full-batch gradient descent where each iteration is ONE
 * aggregation over the feature table — per-doc error `(σ(w·x)−y)`
 * fans out to dim+1 (dim ≤ a few hundred) gradient keys, map-side
 * combined, so the wire carries O(partitions·dim) rows; the weight
 * vector itself is dim+1 doubles, collected and re-broadcast as a
 * literal each round (the PageRank/IVF k-bounded-driver-action
 * pattern). Features are md5-hashed term frequencies ([[Dsir.bucket]] —
 * engine-portable), so the trainer, scorer, and the unrolled SQL oracle
 * share one feature definition.
 */
object QualityLr {

  /**
   * Per-doc feature/label table: `x` = [tf(bucket 0..dim-1), 1.0 bias],
   * `y` = 1.0 iff the doc uses `posWord` more often than `negWord` (a
   * deterministic, linearly-learnable planted rule — stands in for
   * human/LLM quality labels).
   */
  def features(docs: DataFrame, idCol: String, textCol: String, dim: Int,
      posWord: String = "fast", negWord: String = "slow"): DataFrame = {
    val w = docs.select(col(idCol),
      explode(TextOps.words(col(textCol))).as("__w"))
      .withColumn("__b", Dsir.bucket(col("__w"), dim))
    val cnts = (0 until dim).map(d =>
      sum(when(col("__b") === d, 1L).otherwise(0L)).as(s"__c$d"))
    val agg = w.groupBy(idCol).agg(count(lit(1)).as("__nw"),
      (cnts :+
        sum(when(col("__w") === posWord, 1L).otherwise(0L)).as("__pos") :+
        sum(when(col("__w") === negWord, 1L).otherwise(0L)).as("__neg")): _*)
    agg.select(col(idCol),
      array((0 until dim).map(d =>
        col(s"__c$d").cast("double") / col("__nw")) :+ lit(1.0): _*).as("x"),
      when(col("__pos") > col("__neg"), 1.0).otherwise(0.0).as("y"))
  }

  /** `σ(w·x)` with `w` a literal vector — dot in index order (matches
    * the SQL oracle's `w0*x0 + w1*x1 + …` exactly). */
  private def sigmoidDot(x: Column, w: Seq[Double]): Column = {
    val dot = w.zipWithIndex.map { case (wi, i) =>
      element_at(x, i + 1) * lit(wi)
    }.reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-dot))
  }

  /**
   * Full-batch GD: `w ← w − η·avg((σ(w·x) − y)·x)`, `iters` rounds,
   * one agg + one (dim+1)-row collect per round.
   */
  def train(feats: DataFrame, dim: Int, iters: Int, eta: Double): Array[Double] = {
    val n = feats.count().toDouble
    var w = Array.fill(dim + 1)(0.0)
    for (_ <- 1 to iters) {
      val g = feats
        .select((sigmoidDot(col("x"), w.toSeq) - col("y")).as("__e"), col("x"))
        .select(posexplode(col("x")).as(Seq("__d", "__xv")), col("__e"))
        .groupBy("__d").agg(sum(col("__e") * col("__xv")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wi, d) =>
        wi - eta * g.getOrElse(d, 0.0) / n
      }
    }
    w
  }

  /** Trained weights as a DataFrame report (dim index, weight rounded
    * with the engine's round() — same grain as the SQL oracle). */
  def trainReport(feats: DataFrame, dim: Int, iters: Int, eta: Double): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    train(feats, dim, iters, eta).zipWithIndex
      .map { case (wi, d) => (d.toLong, wi) }.toSeq.toDF("dim", "weight")
      .select(col("dim"), round(col("weight"), 6).as("weight"))
  }

  /** Corpus scoring under trained weights: (id, p, predicted, label). */
  def score(feats: DataFrame, idCol: String, w: Array[Double]): DataFrame = {
    val sig = sigmoidDot(col("x"), w.toSeq)
    feats.select(col(idCol), round(sig, 6).as("p"),
      (sig >= 0.5).cast("int").as("predicted"), col("y").cast("int").as("label"))
  }
}
