package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/**
 * Output sinks (SURVEY.md K1-K6). The reference writes JSON/CSV/Excel
 * files driver-side (/root/reference/healthcare_scraper.py:470-495,
 * main_hybrid.py:269-323); here every sink is a distributed write —
 * parquet is the native format (K4), CSV flattens arrays to the
 * reference's pipe-joined form, "Excel sheets" become one dataset per
 * sheet directory (no poi offline).
 */
object Sinks {

  /** K1: JSON sink. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K4: parquet sink. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** K2: CSV sink with arrays flattened to " | "-joined strings
    * (main_hybrid.py:277-283). */
  def writeCsvFlattened(df: DataFrame, path: String): Unit = {
    val flat = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case ArrayType(_, _) => acc.withColumn(f.name, concat_ws(" | ", col(f.name)))
        case _ => acc
      }
    }
    flat.write.mode("overwrite").option("header", true).csv(path)
  }

  /** K3: multi-sheet workbook → one sub-directory per sheet. */
  def writeSheets(sheets: Map[String, DataFrame], root: String): Unit =
    sheets.foreach { case (name, df) => writeParquet(df, s"$root/$name") }

  /** K6: run-summary metrics row (main.py:94-110 shape). */
  def runSummary(results: DataFrame): DataFrame =
    results.agg(
      count("*").as("total_sites"),
      sum(when(col("success"), 1).otherwise(0)).as("successful"),
      sum(when(!col("success"), 1).otherwise(0)).as("failed"),
      sum("facilities_count").as("total_facilities"))

  /** K5 write half: per-chain JSON outputs — one directory per chain in
    * a single distributed partitioned write (the reference writes one
    * JSON file per chain run, csv_processor.py:441-457). */
  def writePerChain(facilities: DataFrame, path: String): Unit =
    facilities.write.mode("overwrite").partitionBy("corporation_name").json(path)

  /** K5 read-back half: load per-chain JSON outputs, corporation_name
    * restored from the partition directory (csv_processor.py:488-494). */
  def readPerChain(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).json(s"$dir/corporation_name=*")

  /** K5 read-back half (flat layout): load per-chain JSON outputs. */
  def readJsonOutputs(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(s"$dir/*")
}
