package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/**
 * Output sinks (SURVEY.md K1-K6). The reference writes JSON/CSV/Excel
 * files driver-side (/root/reference/healthcare_scraper.py:470-495,
 * main_hybrid.py:269-323); here every sink is a distributed write —
 * parquet is the native format (K4), CSV flattens arrays to the
 * reference's pipe-joined form. The Excel sink (K3) comes in two
 * shapes: [[writeSheets]] (one dataset directory per sheet — the
 * unbounded-data form) and [[writeXlsx]], a REAL driver-side `.xlsx`
 * writer (OOXML is a zip of XML parts — `java.util.zip` + hand-written
 * XML, no poi needed) for bounded report workbooks, which is exactly
 * what the reference's Excel output is.
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

  /** K3: multi-sheet workbook → one sub-directory per sheet (the
    * unbounded-data form; use [[writeXlsx]] for a real `.xlsx`). */
  def writeSheets(sheets: Map[String, DataFrame], root: String): Unit =
    sheets.foreach { case (name, df) => writeParquet(df, s"$root/$name") }

  // ---------- K3: real .xlsx workbook (driver-side, bounded) ----------

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;"); case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;"); case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => () // illegal in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[graft] def colLetters(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { n -= 1; sb.insert(0, ('A' + n % 26).toChar); n /= 26 }
    sb.toString
  }

  /** One `<row>` of inline-string / numeric / boolean cells. */
  private def rowXml(rowIdx: Int, cells: Seq[Any]): String = {
    val sb = new StringBuilder(s"""<row r="$rowIdx">""")
    cells.zipWithIndex.foreach { case (v, c) =>
      val ref = s"${colLetters(c)}$rowIdx"
      v match {
        case null => () // empty cell: omitted entirely
        case b: Boolean =>
          sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
        case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double |
                  _: BigDecimal | _: java.math.BigDecimal) =>
          sb.append(s"""<c r="$ref"><v>$n</v></c>""")
        case s: scala.collection.Seq[_] => // arrays: the reference's pipe-joined form
          sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(s.mkString(" | "))}</t></is></c>""")
        case other =>
          sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>""")
      }
    }
    sb.append("</row>").toString
  }

  /**
   * K3: a REAL multi-sheet `.xlsx` workbook — OOXML spreadsheet written
   * with JDK `java.util.zip` + hand-built XML parts ([Content_Types],
   * package/workbook rels, one worksheet part per sheet; strings inline,
   * numerics as native `<v>` cells, arrays pipe-joined like the CSV
   * sink, nulls as empty cells).
   *
   * Driver-side and BOUNDED by design: the xlsx format itself caps a
   * sheet at 2^20 rows, and the reference's Excel output is a report
   * workbook (summaries, validation digests), never corpus data —
   * `maxRowsPerSheet` (default the format cap) refuses anything bigger
   * rather than silently truncating. Corpus-sized results go to K4
   * parquet / K3 writeSheets.
   */
  def writeXlsx(sheets: Seq[(String, DataFrame)], path: String,
                maxRowsPerSheet: Int = 1 << 20): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    require(maxRowsPerSheet >= 1 && maxRowsPerSheet <= (1 << 20),
      s"maxRowsPerSheet=$maxRowsPerSheet outside the xlsx format bound")
    val names = sheets.map(_._1)
    require(names.distinct.size == names.size, s"duplicate sheet names: $names")
    names.foreach(n => require(
      n.nonEmpty && n.length <= 31 && !n.exists("[]*?/\\:".contains(_)),
      s"invalid xlsx sheet name '$n'"))

    val hdr = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    def part(name: String, body: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write((hdr + "\n" + body).getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      val n = sheets.size
      part("[Content_Types].xml",
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
          "</Types>")
      part("_rels/.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          "</Relationships>")
      part("xl/workbook.xml",
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          sheets.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      part("xl/_rels/workbook.xml.rels",
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          (1 to n).map(i =>
            s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString +
          "</Relationships>")
      sheets.zipWithIndex.foreach { case ((name, df), i) =>
        // bounded collect: limit() caps the driver pull; header + a full
        // limit-sized page means the sheet is at/over the cap
        val rows = df.limit(maxRowsPerSheet).collect()
        require(rows.length + 1 <= maxRowsPerSheet,
          s"sheet '$name' exceeds maxRowsPerSheet=$maxRowsPerSheet (incl. header); use writeSheets/parquet for corpus data")
        val header = rowXml(1, df.schema.fieldNames.toSeq)
        val body = rows.iterator.zipWithIndex
          .map { case (r, j) => rowXml(j + 2, r.toSeq) }.mkString
        part(s"xl/worksheets/sheet${i + 1}.xml",
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
            header + body + "</sheetData></worksheet>")
      }
    } finally out.close()
  }

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
