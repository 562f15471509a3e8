package graft.synth

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Page, TextExtractor}
import java.sql.Timestamp
import java.nio.charset.StandardCharsets

/**
 * Distributed materialization of the synthetic corpus: `spark.range` over
 * page ids mapped through the pure generators in [[Synth]] — embarrassingly
 * parallel, no shuffle, O(1) driver memory, so the same code scales the
 * corpus from 2k test pages to the bench sizes.
 *
 * The `text` column is extract_text(html) *by construction* — it is the
 * golden column for the byte-identical invariant (BASELINE.json
 * input_hint; tested in CrawlEndToEndSpec).
 */
object PageSynth {

  def pages(spark: SparkSession, cfg: SynthConfig): Dataset[Page] = {
    import spark.implicits._
    spark.range(0L, cfg.nPages, 1L, spark.sparkContext.defaultParallelism)
      .map { id =>
        val html = Synth.htmlOf(cfg, id)
        Page(
          url = Synth.urlOf(cfg, id),
          warc_ts = new Timestamp(Synth.warcTsMs(id)),
          html = html.getBytes(StandardCharsets.UTF_8),
          text = TextExtractor.extractText(html),
          lang = Synth.langOf(id))
      }
  }

  /** Seed list: the hot host's root only — cross-host root links make the
    * whole corpus reachable (Synth.crossHostLinks). */
  def seeds(cfg: SynthConfig): Seq[String] =
    Seq("https://" + Synth.hostName(0) + "/")

  /** Wide seed list for steady-state throughput benchmarks: the first
    * `perHost` pages of every host, skipping the BFS warm-up rounds. */
  def wideSeeds(spark: SparkSession, cfg: SynthConfig, perHost: Int): Dataset[String] = {
    import spark.implicits._
    spark.range(0, cfg.nHosts.toLong * perHost).flatMap { i =>
      val h = (i / perHost).toInt
      val local = i % perHost
      if (local < cfg.hostPages(h)) Some(Synth.urlOf(cfg, cfg.idOf(h, local)))
      else None
    }
  }

  /** robots rows: every host disallows /careers/ (cf. the reference's
    * exclude patterns /root/reference/config.py:89-93 + robots handling
    * /root/reference/navigation.py:92-108). */
  final case class RobotsRow(host: String, disallow: Seq[String], crawlDelay: Double)
  def robots(spark: SparkSession, cfg: SynthConfig): Dataset[RobotsRow] = {
    import spark.implicits._
    (0 until cfg.nHosts)
      .map(h => RobotsRow(Synth.hostName(h), Seq("/careers/"), 1.0)).toDS()
  }
}
