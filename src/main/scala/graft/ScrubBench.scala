package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Micro-benchmark for the ExactSubstr scrub tail on the LONG-SPAMMY-DOC
 * class (VERDICT r4 #5): documents stuffed with many verbatim-shared
 * boilerplate blocks, the workload where a per-char cover probe is
 * O(n_chars × spans) while the interval-merge splice is O(n + spans).
 *
 * Corpus: GRAFT_SCRUB_DOCS docs (default 64), each GRAFT_SCRUB_BLOCKS
 * (default 100) blocks of [unique md5 filler ‖ shared spam sentence] —
 * ~21 k chars/doc, ~half of every doc inside a duplicated span at
 * L = 50. Prints one line: wall seconds (best of GRAFT_SCRUB_RERUNS+1)
 * + invariant checksums (kept chars, removed chars) so old/new tails
 * can be diffed for identical semantics.
 */
object ScrubBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = sys.env.getOrElse("GRAFT_SCRUB_DOCS", "64").toInt
    val blocks = sys.env.getOrElse("GRAFT_SCRUB_BLOCKS", "100").toInt
    val reruns = sys.env.getOrElse("GRAFT_SCRUB_RERUNS", "2").toInt
    val spam = "the same spammy boilerplate sentence, repeated verbatim " +
      "in every document of this synthetic corpus, again and again. "
    def filler(d: Int, b: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"scrubbench:$d:$b".getBytes("UTF-8"))
      h.map("%02x".format(_)).mkString * 3 // 96 unique chars
    }
    val docs = (0 until nDocs).map { d =>
      (d.toLong, (0 until blocks).map(b => filler(d, b) + spam).mkString)
    }.toDF("id", "text").repartition(cpus.toInt).localCheckpoint()

    def run(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val r = text.ExactSubstr.scrub(docs, "id", "text", L = 50, minDocs = 2)
        .agg(sum(length(col("clean_text"))).as("kept"),
          sum(col("n_removed")).as("removed")).head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }
    val runs = (0 to reruns).map(_ => run())
    val (sec, kept, removed) = runs.minBy(_._1)
    println(f"""{"bench":"scrub_longdoc","docs":$nDocs,"chars_per_doc":${docs.select(max(length(col("text")))).head().getInt(0)},"sec":$sec%.2f,"kept":$kept,"removed":$removed}""")
    spark.stop()
  }
}
