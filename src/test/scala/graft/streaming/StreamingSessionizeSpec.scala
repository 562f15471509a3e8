package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Streaming sessionization ≡ batch [[graft.events.Sessionize]]: sessions
 * that close by a later in-stream event (cross-batch state) and sessions
 * that close by watermark timeout both emit exactly the batch rollup.
 */
class StreamingSessionizeSpec extends SparkTestBase {
  import spark.implicits._
  import StreamingSessionize._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream ≡ batch: cross-batch continuation, in-state close, watermark flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val in = ms.toDF.toDF("user_id", "event_id", "ts", "value")
      .withWatermark("ts", "0 seconds").as[Ev]
    val q = StreamingSessionize.sessionStream(in, gapSeconds = 3600L)
      .writeStream.format("memory").queryName("sessout")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session; user 2 opens one
      ms.addData((1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, 11L, ts("2024-01-01 10:20:00"), 2.0),
        (2L, 20L, ts("2024-01-01 10:05:00"), 1.5))
      q.processAllAvailable()
      // batch 2: user 1 CONTINUES across the batch boundary (one merged
      // session, not two); user 2's next event closes its open session
      // via carried state
      ms.addData((1L, 12L, ts("2024-01-01 10:59:00"), 3.0),
        (2L, 21L, ts("2024-01-01 13:00:00"), 2.5))
      q.processAllAvailable()
      // batch 3: user 1's gap closes session 1, opens session 2
      ms.addData((1L, 13L, ts("2024-01-01 13:30:00"), 4.0))
      q.processAllAvailable()
      // sentinel: advance the global watermark a day — every still-open
      // session times out and flushes
      ms.addData((99L, 990L, ts("2024-01-02 12:00:00"), 0.0))
      q.processAllAvailable()

      val stream = spark.table("sessout")
        .filter($"user_id" =!= 99L)
        .select("user_id", "session_seq", "n_events", "start_us",
          "duration_us", "value_sum")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet

      val batchIn = Seq(
        (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, 11L, ts("2024-01-01 10:20:00"), 2.0),
        (1L, 12L, ts("2024-01-01 10:59:00"), 3.0),
        (1L, 13L, ts("2024-01-01 13:30:00"), 4.0),
        (2L, 20L, ts("2024-01-01 10:05:00"), 1.5),
        (2L, 21L, ts("2024-01-01 13:00:00"), 2.5)
      ).toDF("user_id", "event_id", "ts", "value")
      val batch = graft.events.Sessionize.sessionStats(batchIn,
          "user_id", "ts", "event_id", 3600L, "value")
        .select(col("user_id"), col("session_seq"), col("n_events"),
          unix_micros(col("session_start")).as("start_us"),
          col("duration_us"), col("value_sum"))
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet

      assert(batch.size == 4, s"batch shape: $batch")
      assert(stream == batch, s"stream=$stream\nbatch=$batch")
      // each session emitted exactly once (append mode, no duplicates)
      assert(spark.table("sessout").filter($"user_id" =!= 99L).count() == 4)
    } finally q.stop()
  }
}
