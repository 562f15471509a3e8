package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/**
 * Snapshot-committed Parquet store emulating Iceberg snapshot semantics
 * (SURVEY.md §7.0 — no Iceberg jars ship in this zero-egress image; a real
 * Iceberg catalog slots in behind this trait where the jars exist).
 *
 * Layout:
 *   root/
 *     manifest.json               -- {"round": k}   (atomically replaced)
 *     frontier/round=k/           -- full frontier snapshot after round k
 *     seen/round=k/               -- DELTA of urls first seen in round k
 *     order/round=k/              -- crawl-order rows of round k
 *
 * Commit protocol: write all three round-k datasets, then atomically move
 * manifest.tmp → manifest.json. A crash between writes leaves the manifest
 * at k-1 and the next run resumes from the last committed round, ignoring
 * orphan round-k dirs (the resumability test, SURVEY.md §5.5).
 */
final class FrontierStore(spark: SparkSession, root: String) {

  private def p(parts: String*) = (root +: parts).mkString("/")

  def lastCommittedRound: Option[Int] = {
    val m = Paths.get(p("manifest.json"))
    if (!Files.exists(m)) None
    else {
      val s = new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      "\"round\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
    }
  }

  def writeRound(round: Int, frontier: DataFrame, seenDelta: DataFrame, order: DataFrame): Unit = {
    frontier.write.mode(SaveMode.Overwrite).parquet(p("frontier", s"round=$round"))
    seenDelta.write.mode(SaveMode.Overwrite).parquet(p("seen", s"round=$round"))
    order.write.mode(SaveMode.Overwrite).parquet(p("order", s"round=$round"))
    commit(round)
  }

  private def commit(round: Int): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(p("manifest.json.tmp"))
    Files.write(tmp, s"""{"round": $round}""".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(p("manifest.json")),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readFrontier(round: Int): DataFrame = spark.read.parquet(p("frontier", s"round=$round"))
  def readSeenDelta(round: Int): DataFrame = spark.read.parquet(p("seen", s"round=$round"))
  def readOrder(round: Int): DataFrame = spark.read.parquet(p("order", s"round=$round"))

  /** Union of seen deltas for rounds 0..k — the authoritative seen set. */
  def readSeenUpTo(round: Int): DataFrame =
    (0 to round).map(readSeenDelta).reduce(_ union _)

  /** All crawl-order rows committed so far. */
  def readOrderUpTo(round: Int): DataFrame =
    (1 to round).map(readOrder).reduce(_ union _)
}
