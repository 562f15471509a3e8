package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot change-data-capture: row-level diff between two crawl (or
 * corpus) snapshots keyed by a 64-bit id and compared on a content
 * fingerprint — the primitive behind incremental recrawl scheduling
 * (recrawl `changed`, enqueue `added`, retire `removed`) and
 * incremental downstream prep (reprocess only `added ∪ changed`).
 *
 * Scale shape: ONE full-outer equi-join on the id — both sides shuffle
 * once on the same key (co-partitioned snapshots skip it entirely);
 * fingerprints are compared post-join, no text moves. Statuses:
 * added / removed / changed / unchanged.
 */
object SnapshotDiff {

  /** (id, status) for every id present in either snapshot. Inputs are
    * (idCol, fpCol) frames — reduce page stores to id + fingerprint
    * before calling so only 16-byte digests shuffle. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           idCol: String, fpCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol), col(fpCol).as("__fpOld"))
    val n = newSnap.select(col(idCol), col(fpCol).as("__fpNew"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fpOld").isNull, "added")
          .when(col("__fpNew").isNull, "removed")
          .when(col("__fpOld") =!= col("__fpNew"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Per-status counts — the recrawl planner's summary row. */
  def summary(oldSnap: DataFrame, newSnap: DataFrame,
              idCol: String, fpCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, fpCol)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
