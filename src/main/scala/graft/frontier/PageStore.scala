package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf

/**
 * Bucketed page store — the Iceberg-bucket-partitioning stand-in (no
 * Iceberg jars in this image, SURVEY.md §7.0): pages written as parquet
 * partitioned by `bucket = pmod(urlHash, nBuckets)`.
 *
 * Why it matters at 100 TB: the drain's fetch join broadcasts the
 * budgeted frontier and PROBES the page store, so an unbucketed store is
 * fully scanned every politeness round — at big corpora that scan IS the
 * dominant per-round executor cost (BASELINE.md round-2 W analysis). With
 * bucket partitioning the join carries `bucket` as an extra equi-key and
 * the scan reads only the buckets the round's frontier can hit — runtime
 * file skipping, the same shape Iceberg bucket transforms + runtime
 * filtering give on a real cluster.
 */
object PageStore {

  /** Write the page store bucketed by url identity. */
  def write(pages: DataFrame, path: String, nBuckets: Int): Unit =
    pages
      .withColumn("urlHash", gf.url_id(col("url")))
      .withColumn("bucket", pmod(col("urlHash"), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Open a bucketed store; `bucket` comes back as a partition column. */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** Bucket ids of a (bounded, budget-sized) frontier — driver-side set
    * for an explicit partition-pruning filter. At most `nBuckets` longs. */
  def frontierBuckets(budgeted: DataFrame, nBuckets: Int): Seq[Long] =
    budgeted.select(pmod(col("urlHash"), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted

  /** Prune a bucketed store's scan to the buckets a frontier can hit —
    * a filter on the partition column, satisfied from file listing alone
    * (PartitionFilters in the scan; zero data files read for untouched
    * buckets). */
  def pruneTo(store: DataFrame, buckets: Seq[Long]): DataFrame =
    store.filter(col("bucket").isin(buckets: _*))
}
