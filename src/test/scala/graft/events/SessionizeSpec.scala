package graft.events

import graft.SparkTestBase
import java.sql.Timestamp

/**
 * Gap-based sessionization: hand-computed sessions on a planted event
 * log (the driver gate cross-checks the same op against DuckDB window
 * SQL on the events table at sf0.01).
 */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: three events inside one hour, then a 2h silence, then one
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (1L, 11L, ts("2024-01-01 10:20:00"), 2.0),
    (1L, 12L, ts("2024-01-01 10:59:00"), 3.0),
    (1L, 13L, ts("2024-01-01 13:00:00"), 4.0),
    // user 2: two events EXACTLY gap apart (boundary: not a new session)
    (2L, 20L, ts("2024-01-02 08:00:00"), 1.5),
    (2L, 21L, ts("2024-01-02 09:00:00"), 2.5),
    // user 3: equal timestamps — ordered by the id tie-break
    (3L, 31L, ts("2024-01-03 07:00:00"), 1.0),
    (3L, 30L, ts("2024-01-03 07:00:00"), 2.0)
  ).toDF("user_id", "event_id", "ts", "value")

  test("sessionize: gap splits, boundary gap does not, per-user counters") {
    val got = Sessionize.sessionize(events, "user_id", "ts", "event_id", 3600L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got(10L) == 1L && got(11L) == 1L && got(12L) == 1L)
    assert(got(13L) == 2L)            // 2h01m > 1h gap → new session
    assert(got(20L) == 1L && got(21L) == 1L) // exactly 1h: NOT > gap
    assert(got(30L) == 1L && got(31L) == 1L)
  }

  test("sessionStats: counts, start, duration, rounded value sum") {
    val got = Sessionize.sessionStats(events, "user_id", "ts", "event_id",
        3600L, "value")
      .select("user_id", "session_seq", "n_events", "session_start",
        "duration_us", "value_sum")
      .as[(Long, Long, Long, Timestamp, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got((1L, 1L)) == ((3L, ts("2024-01-01 10:00:00"), 3540L * 1000000L, 6.0)))
    assert(got((1L, 2L)) == ((1L, ts("2024-01-01 13:00:00"), 0L, 4.0)))
    assert(got((2L, 1L)) == ((2L, ts("2024-01-02 08:00:00"), 3600L * 1000000L, 4.0)))
    assert(got((3L, 1L)) == ((2L, ts("2024-01-03 07:00:00"), 0L, 3.0)))
  }

  test("sessionize: partitioning-independent") {
    val a = Sessionize.sessionize(events, "user_id", "ts", "event_id", 3600L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toSet
    val b = Sessionize.sessionize(events.repartition(7), "user_id", "ts",
        "event_id", 3600L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
