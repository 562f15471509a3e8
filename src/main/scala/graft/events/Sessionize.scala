package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization of an event stream — the classic clickstream /
 * crawl-log operator: consecutive events of the same user belong to one
 * session until a silence longer than `gapSeconds` splits it. Sessions
 * are the unit every downstream engagement metric (duration, depth,
 * conversion) aggregates over; the reference's per-run crawl metrics are
 * the same shape (events = fetches, user = host, session = crawl burst).
 *
 * Deterministic by construction: events are ordered by (ts, id) — the id
 * tie-break makes equal-timestamp orderings engine-independent — and the
 * session boundary compares microsecond epochs as longs, so Spark and
 * any SQL oracle agree exactly (no double epochs, no timezone math).
 *
 * Scale shape: ONE hash shuffle on the user key; both the lag and the
 * running session counter are windows over that same partitioning, so
 * Catalyst evaluates them in a single sort+window stage (no second
 * shuffle, see PlanAudit). Per-user event counts are human-bounded
 * (a user's clicks, a host's fetches) — no skew handling needed; a
 * pathological hot key would be capped upstream by politeness budgets.
 */
object Sessionize {

  /**
   * Assign each event its user-local `session_seq` (1-based): a new
   * session starts at the user's first event and whenever the gap since
   * the previous event exceeds `gapSeconds`.
   */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds=$gapSeconds must be positive")
    val order = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NTZ columns are interpreted in the session timezone; the gap math
    // is translation-invariant, so any consistent zone yields the same
    // sessions (Verify pins UTC to match DuckDB's naive epochs)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val newSession = when(
      lag(us, 1).over(order).isNull ||
        us - lag(us, 1).over(order) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_seq", sum(newSession).over(run))
  }

  /**
   * Per-session rollup: (user, session_seq, n_events, start ts, duration
   * in microseconds, value sum). `valueCol` is summed as a rounded double
   * (summation order differs across engines — the rounded value is the
   * contract, per the q54/q60 lesson).
   */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, gapSeconds: Long,
                   valueCol: String): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        (unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp"))).as("duration_us"),
        round(sum(col(valueCol)), 4).as("value_sum"))
}
