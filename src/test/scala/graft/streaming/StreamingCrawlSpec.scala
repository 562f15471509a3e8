package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.CrawlConfig
import graft.synth.{PageSynth, SynthConfig}
import graft.frontier.Crawler

class StreamingCrawlSpec extends SparkTestBase {
  import spark.implicits._

  private val synthCfg = SynthConfig(nPages = 300L, nHosts = 4, hotFrac = 0.5)
  private val crawlCfg = CrawlConfig(maxDepth = 10, perHostBudget = 15,
    saltBuckets = 4, bloomBuckets = 8)
  private lazy val pages = PageSynth.pages(spark, synthCfg).toDF()
  private lazy val robots = PageSynth.robots(spark, synthCfg).toDF()
  private lazy val seeds = PageSynth.seeds(synthCfg).toDF("url")
  private lazy val keyed = Crawler.keyPages(pages, 4)

  test("streaming crawl matches the batch crawler's fetch set and politeness") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    StreamingCrawl.writeSeeds(spark, root, seeds)
    val listener = new CrawlQueryListener
    spark.streams.addListener(listener)
    StreamingCrawl.seenLoads = 0
    val q = StreamingCrawl.start(spark, root, keyed, robots, crawlCfg)
    q.processAllAvailable()
    q.stop()
    spark.streams.removeListener(listener)

    // T7: the listener captured per-micro-batch metrics
    assert(listener.batches.nonEmpty)
    assert(listener.totalRows > 0 && listener.meanRate > 0.0)
    // incremental seen state: the full store was loaded exactly once per
    // query start, not once per round
    assert(StreamingCrawl.seenLoads == 1,
      s"expected 1 full seen load, got ${StreamingCrawl.seenLoads}")

    val streamOrder = StreamingCrawl.readOrder(spark, root).cache()
    val batch = Crawler.crawl(spark, pages, robots, seeds, crawlCfg, 50, None, Some(keyed))

    // same seen set
    val sSet = streamOrder.select("urlHash").as[Long].collect().toSet
    val bSet = batch.order.select("urlHash").as[Long].collect().toSet
    assert(sSet == bSet, s"stream=${sSet.size} batch=${bSet.size}")
    // politeness per (round, host)
    val over = streamOrder.groupBy("round", "host").count()
      .filter($"count" > crawlCfg.perHostBudget).count()
    assert(over == 0)
    // no double-fetch
    assert(streamOrder.groupBy("urlHash").count().filter($"count" > 1).count() == 0)
    // identical per-round order rows
    val s = streamOrder.select($"round", $"host", $"hostRank", $"canonUrl")
      .as[(Int, String, Int, String)].collect().sortBy(t => (t._1, t._2, t._3)).toSeq
    val b = batch.order.select($"round", $"host", $"hostRank", $"canonUrl")
      .as[(Int, String, Int, String)].collect().sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(s == b)
    streamOrder.unpersist()
  }

  test("streaming crawl resumes from checkpoint without reprocessing rounds") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream-resume").toString
    StreamingCrawl.writeSeeds(spark, root, seeds)
    // phase 1: let it run briefly, then stop mid-crawl
    val q1 = StreamingCrawl.start(spark, root, keyed, robots, crawlCfg)
    q1.awaitTermination(8000)
    q1.stop()
    val roundsAfterStop = StreamingCrawl.readOrder(spark, root)
      .select(coalesce(max("round"), lit(0))).as[Int].collect().head
    // phase 2: restart with the same checkpoint; drain fully
    val q2 = StreamingCrawl.start(spark, root, keyed, robots, crawlCfg)
    q2.processAllAvailable()
    q2.stop()

    val order = StreamingCrawl.readOrder(spark, root)
    assert(order.select(max("round")).as[Int].collect().head >= roundsAfterStop)
    // exactly-once: no urlHash fetched twice across the two query lifetimes
    assert(order.groupBy("urlHash").count().filter($"count" > 1).count() == 0)
    // equals an uninterrupted batch crawl
    val batch = Crawler.crawl(spark, pages, robots, seeds, crawlCfg, 50, None, Some(keyed))
    assert(order.select("urlHash").as[Long].collect().toSet ==
      batch.order.select("urlHash").as[Long].collect().toSet)
  }
}
