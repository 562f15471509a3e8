package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import scala.collection.mutable.ArrayBuffer

/**
 * T7: per-micro-batch crawl metrics via the StreamingQueryListener API —
 * the streaming counterpart of the reference's per-batch counters
 * (/root/reference/csv_processor.py:360-375). Captures batch id, input
 * rows (frontier delta size), processing duration, and derived fetch rate.
 */
final class CrawlQueryListener extends StreamingQueryListener {

  final case class BatchMetric(batchId: Long, inputRows: Long,
                               durationMs: Long, rowsPerSec: Double)

  val batches: ArrayBuffer[BatchMetric] = ArrayBuffer.empty

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val dur = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    val rows = p.numInputRows
    if (rows > 0) synchronized {
      batches += BatchMetric(p.batchId, rows, dur,
        if (dur > 0) rows * 1000.0 / dur else 0.0)
    }
  }

  def totalRows: Long = synchronized(batches.map(_.inputRows).sum)
  def meanRate: Double = synchronized {
    if (batches.isEmpty) 0.0 else batches.map(_.rowsPerSec).sum / batches.size
  }
}
