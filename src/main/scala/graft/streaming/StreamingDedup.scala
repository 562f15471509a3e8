package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.extract.Dedup

/**
 * T4 streaming stateful dedup: signature-keyed per-group state via
 * `flatMapGroupsWithState` — the streaming counterpart of the reference's
 * in-heap signature set (/root/reference/deduplicator.py:86-122), exact
 * instead of the reference's last-500 ring buffer.
 *
 * Key equivalence (why ONE stateful key suffices): the batch engine keeps
 * a row iff it is rank-1 in BOTH the fullSig window and the
 * phoneSig|addressSig window (Dedup.exact). Rows with equal fullSig
 * necessarily have equal phone digits/address string, hence equal
 * composite key; and the composite falls back to fullSig when either
 * component sig is empty (the reference skips the phone+addr check then,
 * deduplicator.py:95-107). So "first row per composite key" is exactly
 * the batch survivor set — asserted by the streaming≡batch test.
 *
 * State is one boolean per seen signature. `stateTtl` > 0 evicts idle
 * keys after that many ms of processing time — the memory-bounded mode
 * matching the reference's capped window (deduplicator.py:119-122), at
 * the documented cost of re-admitting a duplicate that reappears after
 * the TTL.
 */
object StreamingDedup {

  final case class FacilityKeyed(
      paKey: String, sourceUrl: String, name: String, address: String,
      city: String, state: String, zipCode: String, phone: String)

  /** Composite dedup key: phoneSig|addressSig when both present, else
    * fullSig (deduplicator.py:95-107 check order collapsed — see object
    * scaladoc for the equivalence argument). */
  def withPaKey(facilities: DataFrame): DataFrame =
    Dedup.withSignatures(facilities)
      .withColumn("paKey",
        when(col("phoneSig") =!= "" && col("addressSig") =!= "",
          concat(col("phoneSig"), lit("|"), col("addressSig")))
          .otherwise(col("fullSig")))

  /**
   * Streaming (or batch) dedup: emits the first-seen row per signature
   * key; later occurrences — in the same micro-batch (min sourceUrl
   * wins, deterministic) or any later one — are dropped via the
   * checkpointed per-key state.
   */
  def dedupStream(facilities: DataFrame, stateTtlMs: Long = 0L): Dataset[FacilityKeyed] = {
    val spark = facilities.sparkSession
    import spark.implicits._
    val keyed = withPaKey(facilities)
      .select("paKey", "sourceUrl", "name", "address", "city", "state",
        "zipCode", "phone")
      .as[FacilityKeyed]
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed.groupByKey(_.paKey)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: String, rows: Iterator[FacilityKeyed], gs: GroupState[Boolean]) =>
          if (gs.hasTimedOut) { gs.remove(); Iterator.empty }
          else if (gs.exists) Iterator.empty
          else {
            gs.update(true)
            if (stateTtlMs > 0) gs.setTimeoutDuration(stateTtlMs)
            Iterator.single(rows.minBy(_.sourceUrl))
          }
      }
  }
}
