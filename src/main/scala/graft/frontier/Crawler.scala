package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.CrawlConfig
import graft.functions.gf

/**
 * The round-synchronous crawl driver (SURVEY.md T1/T2/T6): BFS rounds over
 * a page-store table, each round one micro-batch of declarative Catalyst
 * plans. State (frontier, seen) lives in checkpointed DataFrames —
 * `localCheckpoint` truncates the per-round lineage while *retaining the
 * hash partitioning*, so the seen anti-join never re-shuffles the seen
 * side; optional [[FrontierStore]] snapshots give Iceberg-like commit +
 * resume semantics.
 */
object Crawler {

  final case class RoundMetrics(
      round: Int, fetched: Long, fetchMisses: Long, discovered: Long,
      dedupHits: Long, frontierNext: Long, seenTotal: Long, wallMs: Long)

  final case class CrawlResult(
      order: DataFrame,          // all CrawlOrderRow rows, every round
      fetchedPages: DataFrame,   // all fetched frontier×page rows (for extraction)
      seen: DataFrame,           // final seen set (urlHash)
      metrics: Seq[RoundMetrics])

  /** pages keyed by url identity, hash-partitioned once so every round's
    * fetch join only shuffles the (budget-sized) frontier side. At real
    * scale this is a bucketed/Iceberg table; in-session we persist the
    * repartitioned scan (SURVEY.md §4 join strategy). */
  def keyPages(pages: DataFrame, partitions: Int): DataFrame =
    pages
      .withColumn("urlHash", gf.url_id(col("url")))
      .repartition(partitions, col("urlHash"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  def crawl(spark: SparkSession, pages: DataFrame, robots: DataFrame, seeds: DataFrame,
            cfg: CrawlConfig, maxRounds: Int,
            store: Option[FrontierStore] = None,
            keyedPages: Option[DataFrame] = None): CrawlResult = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pagesKeyed = keyedPages.getOrElse(keyPages(pages, parts))

    val ck = (df: DataFrame) => df.localCheckpoint(true)

    // resume from the last committed snapshot if a store is present (T6)
    val resumeRound = store.flatMap(_.lastCommittedRound)
    var frontier: DataFrame = resumeRound match {
      case Some(k) => ck(store.get.readFrontier(k))
      case None =>
        val f0 = ck(CrawlRound.seedFrontier(seeds))
        store.foreach(_.writeRound(0, f0,
          f0.select("urlHash").limit(0), emptyOrder(spark)))
        f0
    }
    var seen: DataFrame = resumeRound match {
      case Some(k) => ck(store.get.readSeenUpTo(k).repartition(parts, col("urlHash")))
      case None => frontier.select("urlHash").limit(0)
    }
    var seenCount: Long = if (resumeRound.isDefined) seen.count() else 0L
    var frontierCount: Long = frontier.count()

    val orders = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val fetchedAll = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val metrics = scala.collection.mutable.ArrayBuffer[RoundMetrics]()

    var round = resumeRound.getOrElse(0) + 1
    while (round <= maxRounds && frontierCount > 0) {
      val t0 = System.nanoTime()
      // ck inside run(): rank, fetch join and discovery each computed once
      val r = CrawlRound.run(round, frontier, pagesKeyed, robots, cfg, ck)

      val fetched = r.fetched
      val order = r.order
      val delta = fetched.select("urlHash")
      val fetchedCount = fetched.count()
      val newSeen = ck(seen.unionByName(delta).repartition(parts, col("urlHash")))
      val newSeenCount = seenCount + fetchedCount // budgeted rows are urlHash-unique

      val discovered = r.discovered
      val discoveredCount = discovered.count()
      val fresh = SeenSet.filterUnseen(discovered, newSeen, newSeenCount, cfg)
      val nextFrontier = ck(CrawlRound.dedupeCandidates(
        r.deferred.unionByName(fresh)))
      val nextCount = nextFrontier.count()

      store.foreach(_.writeRound(round, nextFrontier, delta,
        order.select("round", "host", "hostRank", "canonUrl", "urlHash", "score", "fetchOk")))

      val misses = fetched.filter(!col("fetchOk")).count()
      metrics += RoundMetrics(round, fetchedCount, misses, discoveredCount,
        dedupHits = discoveredCount + r.deferred.count() - nextCount,
        frontierNext = nextCount, seenTotal = newSeenCount,
        wallMs = (System.nanoTime() - t0) / 1000000L)

      orders += order
      fetchedAll += fetched
      seen.unpersist(); frontier.unpersist()
      seen = newSeen; seenCount = newSeenCount
      frontier = nextFrontier; frontierCount = nextCount
      round += 1
    }

    val orderAll = if (orders.nonEmpty) orders.reduce(_ unionByName _) else emptyOrder(spark)
    val fetchedPages = if (fetchedAll.nonEmpty) fetchedAll.reduce(_ unionByName _)
      else pagesKeyed.limit(0)
    CrawlResult(orderAll, fetchedPages, seen, metrics.toSeq)
  }

  private def emptyOrder(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Int, String, Int, String, Long, Double, Boolean)]
      .toDF("round", "host", "hostRank", "canonUrl", "urlHash", "score", "fetchOk")
  }
}
