package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.core.CrawlConfig
import graft.frontier.{CrawlRound, SeenSet}

/**
 * Structured-Streaming crawl (SURVEY.md T1/T6/T7): each BFS round is one
 * micro-batch. The frontier is a self-feeding parquet file-stream — a
 * round's discovered links are written back into the watched directory and
 * become the next micro-batch. Spark's streaming checkpoint gives exactly-
 * once round processing and mid-crawl resume (kill the query, start it
 * again with the same checkpointDir: processed frontier files are not
 * re-processed).
 *
 * Layout under `root/`:
 *   frontier_stream/   -- watched dir; seed delta + per-round discovered deltas
 *   seen/round=k/      -- seen-set deltas (parquet)
 *   order/round=k/     -- crawl-order rows
 *   checkpoint/        -- Spark streaming checkpoint (offsets/commits)
 */
object StreamingCrawl {

  val frontierSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("canonUrl", StringType),
    StructField("urlHash", LongType), StructField("host", StringType),
    StructField("depth", IntegerType), StructField("score", DoubleType)))

  /** Write the seed frontier as delta 0 into the watched dir. */
  def writeSeeds(spark: SparkSession, root: String, seeds: DataFrame): Unit =
    CrawlRound.seedFrontier(seeds)
      .select("url", "canonUrl", "urlHash", "host", "depth", "score")
      .withColumn("depth", col("depth").cast("int"))
      .write.mode("append").parquet(s"$root/frontier_stream")

  private def seenSoFar(spark: SparkSession, root: String): (DataFrame, Long) = {
    val dir = new java.io.File(s"$root/seen")
    val rounds = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("round="))
    if (rounds.isEmpty) {
      import spark.implicits._
      (Seq.empty[Long].toDF("urlHash"), 0L)
    } else {
      val df = spark.read.parquet(rounds.map(_.getPath).toIndexedSeq: _*)
        .select("urlHash")
      (df, df.count())
    }
  }

  /**
   * Start the streaming crawl. One micro-batch = one politeness round over
   * every frontier delta that arrived since the last batch.
   */
  def start(spark: SparkSession, root: String, pagesKeyed: DataFrame,
            robots: DataFrame, cfg: CrawlConfig): StreamingQuery = {
    val stream = spark.readStream
      .schema(frontierSchema)
      .parquet(s"$root/frontier_stream")

    stream.writeStream
      .option("checkpointLocation", s"$root/checkpoint")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val round = batchId.toInt + 1
        val (seen, seenCount) = seenSoFar(s, root)
        // frontier deltas may contain urls seen in earlier rounds
        val frontier = SeenSet.filterUnseen(
          CrawlRound.dedupeCandidates(batch), seen, seenCount, cfg)
          .localCheckpoint(true)
        if (!frontier.isEmpty) {
          val r = CrawlRound.run(round, frontier, pagesKeyed, robots, cfg,
            df => df.localCheckpoint(true))
          r.fetched.select("urlHash")
            .write.mode("overwrite").parquet(s"$root/seen/round=$round")
          r.order.write.mode("overwrite").parquet(s"$root/order/round=$round")
          // deferred (over politeness budget) + fresh discoveries feed the
          // next micro-batch through the watched directory
          r.deferred.unionByName(r.discovered)
            .select("url", "canonUrl", "urlHash", "host", "depth", "score")
            .withColumn("depth", col("depth").cast("int"))
            .write.mode("append").parquet(s"$root/frontier_stream")
        }
        ()
      }
      .start()
  }

  /** All crawl-order rows committed by the stream so far. */
  def readOrder(spark: SparkSession, root: String): DataFrame = {
    val dir = new java.io.File(s"$root/order")
    val rounds = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("round="))
    spark.read.option("basePath", s"$root/order")
      .parquet(rounds.map(_.getPath).toIndexedSeq: _*)
  }

  /**
   * Event-time metrics stream (SURVEY.md T7/T8): tumbling 1-minute windows
   * over fetched pages' `warc_ts` with a 1-hour watermark — fetch counts
   * per capture window, late rows beyond the watermark dropped.
   */
  def warcMetrics(fetchedStream: DataFrame): DataFrame =
    fetchedStream
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 minute"), col("host"))
      .agg(count("*").as("fetches"), sum(when(col("fetchOk"), 0).otherwise(1)).as("misses"))
}
