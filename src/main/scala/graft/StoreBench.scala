package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * 1000-round FrontierStore longevity synthetic (VERDICT r4 #2): a
 * months-long crawl writes one round-dir per round forever; with
 * periodic [[graft.frontier.FrontierStore.compact]] +
 * [[graft.frontier.FrontierStore.gc]] the file count must stay BOUNDED
 * (O(compaction interval)), and the compacted store must read back the
 * identical seen/order contents as an uncompacted twin.
 *
 * Env: GRAFT_STORE_ROUNDS (default 1000), GRAFT_STORE_COMPACT_EVERY
 * (default 128), GRAFT_STORE_TWIN=0 to skip the uncompacted twin.
 * Prints one JSON line with file counts at milestones + the final
 * equality checksum.
 */
object StoreBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rounds = sys.env.getOrElse("GRAFT_STORE_ROUNDS", "1000").toInt
    val every = sys.env.getOrElse("GRAFT_STORE_COMPACT_EVERY", "128").toInt
    val twin = sys.env.getOrElse("GRAFT_STORE_TWIN", "1") == "1"

    def synthRound(k: Int) = {
      // 3 urls first-seen per round, deterministic from k
      val seen = (0 until 3).map(i => k.toLong * 10 + i).toDF("urlHash")
      val frontier = seen.withColumn("url",
        concat(lit("https://h"), col("urlHash"), lit(".example/")))
      val order = seen.select(col("urlHash"), lit(k).as("round"))
      (frontier.coalesce(1), seen.coalesce(1), order.coalesce(1))
    }

    def drive(root: String, doCompact: Boolean): (Long, Seq[(Int, Long)]) = {
      val s = new frontier.FrontierStore(spark, root)
      val milestones = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      for (k <- 0 until rounds) {
        val (f, sd, o) = synthRound(k)
        s.writeRound(k, f, sd, o)
        if (doCompact && k > 0 && k % every == 0) { s.compact(k); s.gc() }
        if ((k + 1) % 250 == 0) milestones += ((k + 1, s.fileCount))
      }
      if (doCompact) { s.compact(rounds - 1); s.gc() }
      (s.fileCount, milestones.toSeq)
    }

    val rootC = java.nio.file.Files.createTempDirectory("graft-store-compact").toString
    val t0 = System.nanoTime()
    val (filesCompacted, milesC) = drive(rootC, doCompact = true)
    val secC = (System.nanoTime() - t0) / 1e9
    val sC = new frontier.FrontierStore(spark, rootC)
    val k = sC.lastCommittedRound.get
    val seenN = sC.readSeenUpTo(k).count()
    val orderSum = sC.readOrderUpTo(k).agg(sum(col("urlHash"))).head().getLong(0)

    val (filesPlain, twinLine) = if (twin) {
      val rootP = java.nio.file.Files.createTempDirectory("graft-store-plain").toString
      val (fp, _) = drive(rootP, doCompact = false)
      val sP = new frontier.FrontierStore(spark, rootP)
      val pSeen = sP.readSeenUpTo(k).count()
      val pSum = sP.readOrderUpTo(k).agg(sum(col("urlHash"))).head().getLong(0)
      require(pSeen == seenN && pSum == orderSum,
        s"compacted store diverged: seen $seenN vs $pSeen, sum $orderSum vs $pSum")
      (fp, s""","files_uncompacted":$fp,"content_equal":true""")
    } else (0L, "")

    println(s"""{"bench":"store_1000_rounds","rounds":$rounds,"compact_every":$every,"files_compacted":$filesCompacted,"milestones":${milesC.map(m => s"[${m._1},${m._2}]").mkString("[", ",", "]")},"seen_rows":$seenN,"sec":${f"$secC%.1f"}$twinLine}""")
    spark.stop()
  }
}
