package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming counterpart of [[graft.events.Sessionize]]: gap-based
 * sessions over an event stream via `flatMapGroupsWithState` with an
 * EVENT-TIME timeout — a session is emitted exactly once, when the
 * watermark passes its last event + gap (the streaming definition of
 * "the session closed"). The equivalence spec proves stream ≡ batch
 * [[graft.events.Sessionize.sessionStats]] on in-order streams.
 *
 * State is O(1) per user — ONE open-session accumulator (seq, count,
 * start, last, value sum), never a buffer of events: each micro-batch
 * folds its (ts, id)-sorted events into the accumulator, emits every
 * session an in-batch gap closes, and re-arms the timeout at
 * last + gap. After a timeout flush the state keeps only the session
 * COUNTER (so a user's next session numbers correctly, matching batch);
 * that residual is a few longs per ever-seen user — the same carried
 * footprint class as the crawl's seen-bloom, and evictable by a
 * processing-time TTL at the documented cost of counter resets.
 *
 * Late events (behind the watermark) are dropped by the engine before
 * the state function sees them — the standard streaming contract; the
 * batch operator is the replay/backfill path when exactness over late
 * data matters.
 */
object StreamingSessionize {

  final case class Ev(user_id: Long, event_id: Long,
                      ts: java.sql.Timestamp, value: Double)
  final case class Open(seq: Long, nEvents: Long, startUs: Long,
                        lastUs: Long, valueSum: Double)
  final case class SessState(nextSeq: Long, open: Option[Open])
  final case class SessionOut(user_id: Long, session_seq: Long,
                              n_events: Long, start_us: Long,
                              duration_us: Long, value_sum: Double)

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def out(user: Long, o: Open): SessionOut =
    SessionOut(user, o.seq, o.nEvents, o.startUs, o.lastUs - o.startUs,
      BigDecimal(o.valueSum).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)

  /**
   * Sessions, emitted as they close. The input must already carry a
   * watermark on the event-time column backing `Ev.ts` (the spec uses
   * `withWatermark("ts", ...)`); event-time timeouts require it.
   */
  def sessionStream(events: Dataset[Ev], gapSeconds: Long): Dataset[SessionOut] = {
    require(gapSeconds > 0, s"gapSeconds=$gapSeconds must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], gs: GroupState[SessState]) =>
          if (gs.hasTimedOut) {
            val st = gs.get
            val flushed = st.open.map(o => out(user, o))
            gs.update(SessState(st.nextSeq, None)) // keep the counter
            flushed.iterator
          } else {
            val sorted = rows.toArray.sortBy(e => (us(e.ts), e.event_id))
            var st = gs.getOption.getOrElse(SessState(1L, None))
            val closed = Vector.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = us(e.ts)
              st.open match {
                case Some(o) if t - o.lastUs <= gapUs =>
                  st = SessState(st.nextSeq, Some(o.copy(
                    nEvents = o.nEvents + 1, lastUs = t,
                    valueSum = o.valueSum + e.value)))
                case Some(o) => // in-batch gap: close and start the next
                  closed += out(user, o)
                  st = SessState(st.nextSeq + 1,
                    Some(Open(st.nextSeq, 1L, t, t, e.value)))
                case None => // nextSeq always points at the NEXT unused seq
                  st = SessState(st.nextSeq + 1,
                    Some(Open(st.nextSeq, 1L, t, t, e.value)))
              }
            }
            gs.update(st)
            st.open.foreach { o => // close when the watermark passes last+gap
              gs.setTimeoutTimestamp((o.lastUs + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
