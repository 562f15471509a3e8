package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.CrawlConfig
import graft.functions.gf

/**
 * URL-seen filtering (SURVEY.md J1): a partitioned Bloom pre-filter in
 * front of the authoritative exact anti-join (north rule: "partitioned
 * bloom/cuckoo URL-seen filter ... exact anti-join stays authoritative").
 *
 * The Bloom pass splits candidates into
 *   - definitely-new (bloom says absent)  → skip the expensive anti-join
 *     shuffle against the (10^10-row at target scale) seen table entirely;
 *   - maybe-seen (bloom positives)        → exact `left_anti` verdict.
 * Filters are built per `pmod(urlHash, bloomBuckets)` bucket so each
 * filter stays executor-sized as the seen set grows; the bucket column
 * rides along on both sides so the bloom join is a broadcast equi-join.
 */
object SeenSet {

  /** (bucket, bloom) table over the seen hashes. */
  def buildBlooms(seenHashes: DataFrame, expectedPerBucket: Long, cfg: CrawlConfig): DataFrame =
    seenHashes
      .groupBy(pmod(col("urlHash"), lit(cfg.bloomBuckets)).as("bloomBucket"))
      .agg(gf.bloom_agg(col("urlHash"), expectedPerBucket, cfg.bloomFpp).as("bloom"))

  /**
   * candidates − seen. `candidates` must be unique by urlHash; result
   * preserves candidate columns.
   */
  def filterUnseen(candidates: DataFrame, seenHashes: DataFrame, seenCount: Long,
                   cfg: CrawlConfig): DataFrame = {
    if (seenCount == 0) return candidates
    val expected = math.max(seenCount / cfg.bloomBuckets + 1, 1024L)
    val blooms = buildBlooms(seenHashes, expected, cfg)
    val tested = candidates
      .withColumn("bloomBucket", pmod(col("urlHash"), lit(cfg.bloomBuckets)))
      .join(broadcast(blooms), Seq("bloomBucket"), "left")
      .withColumn("maybeSeen",
        col("bloom").isNotNull && gf.might_contain(col("bloom"), col("urlHash")))
      .drop("bloom", "bloomBucket")
    val definitelyNew = tested.filter(!col("maybeSeen")).drop("maybeSeen")
    val verified = tested.filter(col("maybeSeen")).drop("maybeSeen")
      .join(seenHashes.select("urlHash"), Seq("urlHash"), "left_anti")
    definitelyNew.unionByName(verified)
  }
}
