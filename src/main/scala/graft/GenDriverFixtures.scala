package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Golden-fixture generator for the driver-contract queries that are not
 * SQL-expressible (custom crawl/extraction/multimodal expressions over the
 * deterministic synthetic corpus — no sf-table inputs). Each query's
 * result is pinned as a single parquet file under
 * `src/test/resources/fixtures/driver/`, and its `oracleSql` entry is a
 * plain `SELECT * FROM '<fixture>'` — so the DuckDB gate becomes a hard
 * regression check on rows+schema+values.
 *
 * The pinned results are themselves validated by the sbt suite (crawl
 * ordering vs the reference-semantics simulator, card round-trips,
 * validation-rule fixtures, media determinism); this file only freezes
 * them for the driver. Regenerate after any intentional semantics change:
 *   sbt -batch "runMain graft.GenDriverFixtures"
 */
object GenDriverFixtures {

  val fixtureDir = "src/test/resources/fixtures/driver"

  val names: Seq[String] = Seq(
    "q32_crawl_round", "q33_extract_facilities",
    "q34_media_features", "q38_validation", "q40_ann_ivf", "q47_semdedup",
    "q73_audio_features", "q74_video_frames", "q75_css_extract",
    "q81_anchor_text", "q89_main_content", "q93_compression_quality",
    "q94_markdown", "q119_cdc_dedup")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else fixtureDir
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      val tmp = Files.createTempDirectory(s"fixture_$n").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$out/$n.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"[fixtures] wrote $out/$n.parquet")
    }
    spark.stop()
  }
}
