package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

/**
 * WARC (Web ARChive, ISO 28500) source + sink — the container format of
 * Common Crawl and every serious archive-scale crawl, re-expressed for
 * Spark's execution model. Reference analog: the reference crawler keeps
 * its fetched pages in a per-run cache directory (`crawler.py` page
 * cache); at 100 TB the industry shape for that store is WARC segments,
 * so the engine reads and writes them natively.
 *
 * Layout choices mirror Common Crawl exactly:
 *  - one `warcinfo` record leads each file;
 *  - each page is a `response` record whose block is a full HTTP/1.1
 *    response (status line + headers + body);
 *  - `.warc.gz` files are CONCATENATED PER-RECORD GZIP MEMBERS (not one
 *    stream): any record can be decompressed knowing only its byte
 *    offset, which is what makes a CDX offset index + ranged reads work
 *    at archive scale. `GZIPInputStream` reads member-concatenated
 *    streams natively, so whole-file scans need no special casing.
 *
 * Scale shape: the parallelism unit is the FILE (one task per WARC
 * segment — how Common Crawl jobs schedule), read through Spark's
 * `binaryFile` source; the writer fans out per-partition through the
 * Hadoop FileSystem API, so the same code targets local disk, HDFS, or
 * an object store. The parser is a single forward pass per file
 * (length-framed records, O(bytes)), and resynchronizes on the next
 * record magic after a corrupt record instead of discarding the file.
 */
object Warc {

  /** One parsed WARC record (response records carry parsed HTTP fields;
    * revisit records carry the digest/refers-to dedup headers — "" when
    * absent). */
  final case class WarcRecord(
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_length: Long,
      http_status: Int,          // -1 for non-response records
      http_content_type: String, // "" for non-response records
      body: Array[Byte],         // HTTP body for responses, raw block otherwise
      payload_digest: String,    // WARC-Payload-Digest ("" when absent)
      warc_profile: String,      // WARC-Profile ("" when absent)
      refers_to_uri: String,     // WARC-Refers-To-Target-URI ("" when absent)
      refers_to_date: String)    // WARC-Refers-To-Date ("" when absent)

  private val CRLF = "\r\n"
  private val Magic = "WARC/1.0"

  // ---------------------------------------------------------------- write

  /** Serialize one record: WARC header + length-framed block + 2×CRLF.
    * `extra` carries record-type-specific headers (digest/refers-to). */
  private def recordBytes(warcType: String, recordId: String, targetUri: String,
      date: String, block: Array[Byte], blockContentType: String,
      extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val header = new StringBuilder()
      .append(Magic).append(CRLF)
      .append("WARC-Type: ").append(warcType).append(CRLF)
      .append("WARC-Record-ID: ").append(recordId).append(CRLF)
      .append("WARC-Date: ").append(date).append(CRLF)
    if (targetUri.nonEmpty) header.append("WARC-Target-URI: ").append(targetUri).append(CRLF)
    extra.foreach { case (k, v) => header.append(k).append(": ").append(v).append(CRLF) }
    header.append("Content-Type: ").append(blockContentType).append(CRLF)
      .append("Content-Length: ").append(block.length).append(CRLF)
      .append(CRLF)
    val h = header.toString.getBytes(US_ASCII)
    val out = new ByteArrayOutputStream(h.length + block.length + 4)
    out.write(h); out.write(block); out.write(s"$CRLF$CRLF".getBytes(US_ASCII))
    out.toByteArray
  }

  /** Full HTTP/1.1 200 response block around a page body. */
  private def httpResponseBlock(body: Array[Byte], contentType: String): Array[Byte] = {
    val head = (s"HTTP/1.1 200 OK$CRLF" +
      s"Content-Type: $contentType$CRLF" +
      s"Content-Length: ${body.length}$CRLF$CRLF").getBytes(US_ASCII)
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head); out.write(body)
    out.toByteArray
  }

  /** Deterministic record id (real writers use urn:uuid; we derive the
    * uuid bytes from the target URI so reruns are byte-identical). */
  private def recordIdFor(uri: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(uri.getBytes(UTF_8))
    f"<urn:uuid:${java.util.UUID.nameUUIDFromBytes(md)}>"
  }

  /** One CDX-style index row: where a record's bytes live. With gzip,
    * `[offset, offset+length)` is a complete standalone gzip member —
    * a ranged read of exactly those bytes inflates to the record. */
  final case class CdxEntry(url: String, file: String, offset: Long, length: Long)

  /**
   * Write `docs` — columns (url: string, date: string, body: string) — as
   * `nFiles` WARC segments under `outDir` (`part-NNNNN.warc[.gz]`) and
   * return the CDX offset index (one row per response record).
   * Hash-partitioned by url and sorted within each segment, so the file
   * set is byte-deterministic run-to-run (task retries overwrite with
   * identical bytes — the write is idempotent). Gzip mode emits one gzip
   * member per record (Common Crawl layout — see class doc).
   *
   * The returned Dataset is the WRITING JOB: executing it performs the
   * writes and yields the index. Persist it as a sidecar table (see
   * [[writeWithCdx]]) — recomputing it re-writes the segments.
   *
   * Memory: one segment's rows are buffered per task (a segment is
   * bounded by choosing nFiles so segments land near the archive-standard
   * ~1 GB — the same knob Common Crawl uses).
   */
  def writeIndexed(docs: DataFrame, outDir: String, nFiles: Int, gzip: Boolean = true,
      contentType: String = "text/html"): org.apache.spark.sql.Dataset[CdxEntry] = {
    require(nFiles > 0, s"nFiles=$nFiles must be positive")
    val suffix = if (gzip) ".warc.gz" else ".warc"
    import docs.sparkSession.implicits._
    docs.select(col("url").cast("string"), col("date").cast("string"),
        col("body").cast("string"))
      .repartition(nFiles, col("url"))
      .sortWithinPartitions("url")
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val pid = TaskContext.getPartitionId()
          val path = new Path(outDir, f"part-$pid%05d$suffix")
          // executor-local Configuration: defaults resolve local/HDFS/S3 by scheme
          val fs = path.getFileSystem(new Configuration())
          val raw = fs.create(path, true)
          val entries = Seq.newBuilder[CdxEntry]
          try {
            var pos = 0L
            def member(bytes: Array[Byte]): Long =
              if (gzip) {
                val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
                val gz = new GZIPOutputStream(bos)
                gz.write(bytes); gz.finish()
                val m = bos.toByteArray
                raw.write(m); m.length.toLong
              } else { raw.write(bytes); bytes.length.toLong }
            val info = ("software: graft/1.0" + CRLF + "format: WARC File Format 1.0" + CRLF)
              .getBytes(US_ASCII)
            pos += member(recordBytes("warcinfo", recordIdFor(path.toString), "",
              "2026-01-01T00:00:00Z", info, "application/warc-fields"))
            rows.foreach { r =>
              val url = r.getString(0)
              val len = member(recordBytes("response", recordIdFor(url), url, r.getString(1),
                httpResponseBlock(r.getString(2).getBytes(UTF_8), contentType),
                "application/http; msgtype=response"))
              entries += CdxEntry(url, path.toString, pos, len)
              pos += len
            }
          } finally raw.close()
          entries.result().iterator
        }
      }
  }

  /** Action form: write segments, discarding the index. */
  def write(docs: DataFrame, outDir: String, nFiles: Int, gzip: Boolean = true,
      contentType: String = "text/html"): Unit =
    writeIndexed(docs, outDir, nFiles, gzip, contentType).foreach(_ => ())

  /**
   * Dedup-aware archive writer — WARC `revisit` records (ISO 28500 §6.7.2,
   * the Common Crawl / Heritrix `identical-payload-digest` profile): a
   * fetch whose payload digest matches the PRIOR capture of the same url
   * is archived as a payload-LESS revisit record that points back at the
   * original capture, so an unchanged page costs ~200 header bytes
   * instead of its body — the container-level face of the engine's
   * seen/counting-Bloom dedup state (SnapshotDiff feeds `prior`).
   *
   *  - `docs`: (url, date, body) — this crawl's fetches;
   *  - `prior`: (url, digest, prior_date) — the previous capture's
   *    payload digest per url (the CDX+digest sidecar of the last run);
   *    sha-256 hex (WARC allows any labeled algorithm; sha-256 is the
   *    cross-engine-verifiable choice here).
   *
   * Every record (response AND revisit) carries `WARC-Payload-Digest`;
   * revisits add `WARC-Profile` + `WARC-Refers-To-Target-URI`/`-Date`
   * and an EMPTY block. Returns the CDX index over all written records.
   *
   * Scale shape: digest decisions are one equi-join on url (both sides
   * crawl-sized — shuffle hash, never broadcast, never collected); the
   * segment write stays the one-task-per-file pass of [[writeIndexed]].
   */
  def writeIndexedDedup(docs: DataFrame, prior: DataFrame, outDir: String,
      nFiles: Int, gzip: Boolean = true,
      contentType: String = "text/html"): org.apache.spark.sql.Dataset[CdxEntry] = {
    require(nFiles > 0, s"nFiles=$nFiles must be positive")
    val suffix = if (gzip) ".warc.gz" else ".warc"
    import docs.sparkSession.implicits._
    docs.select(col("url").cast("string"), col("date").cast("string"),
        col("body").cast("string"))
      .withColumn("__digest", sha2(col("body").cast("binary"), 256))
      .join(prior.select(col("url").cast("string"),
          col("digest").as("__prior_digest"),
          col("prior_date").cast("string").as("__prior_date")),
        Seq("url"), "left")
      .withColumn("__revisit",
        col("__prior_digest").isNotNull && col("__prior_digest") === col("__digest"))
      .repartition(nFiles, col("url"))
      .sortWithinPartitions("url")
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val pid = TaskContext.getPartitionId()
          val path = new Path(outDir, f"part-$pid%05d$suffix")
          val fs = path.getFileSystem(new Configuration())
          val raw = fs.create(path, true)
          val entries = Seq.newBuilder[CdxEntry]
          try {
            var pos = 0L
            def member(bytes: Array[Byte]): Long =
              if (gzip) {
                val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
                val gz = new GZIPOutputStream(bos)
                gz.write(bytes); gz.finish()
                val m = bos.toByteArray
                raw.write(m); m.length.toLong
              } else { raw.write(bytes); bytes.length.toLong }
            val info = ("software: graft/1.0" + CRLF + "format: WARC File Format 1.0" + CRLF)
              .getBytes(US_ASCII)
            pos += member(recordBytes("warcinfo", recordIdFor(path.toString), "",
              "2026-01-01T00:00:00Z", info, "application/warc-fields"))
            rows.foreach { r =>
              val url = r.getString(0)
              val digestHeader = "WARC-Payload-Digest" -> s"sha256:${r.getString(3)}"
              val bytes =
                if (r.getBoolean(6)) // unchanged: payload-less revisit
                  recordBytes("revisit", recordIdFor(url), url, r.getString(1),
                    Array.emptyByteArray, "application/http; msgtype=response",
                    Seq(digestHeader,
                      "WARC-Profile" ->
                        "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
                      "WARC-Refers-To-Target-URI" -> url,
                      "WARC-Refers-To-Date" -> r.getString(5)))
                else
                  recordBytes("response", recordIdFor(url), url, r.getString(1),
                    httpResponseBlock(r.getString(2).getBytes(UTF_8), contentType),
                    "application/http; msgtype=response", Seq(digestHeader))
              val len = member(bytes)
              entries += CdxEntry(url, path.toString, pos, len)
              pos += len
            }
          } finally raw.close()
          entries.result().iterator
        }
      }
  }

  /** Write segments AND the CDX sidecar (`outDir/cdx.parquet`) in one
    * job — the archive + `cluster.idx` layout. */
  def writeWithCdx(docs: DataFrame, outDir: String, nFiles: Int, gzip: Boolean = true,
      contentType: String = "text/html"): Unit =
    writeIndexed(docs, outDir, nFiles, gzip, contentType)
      .write.mode("overwrite").parquet(s"$outDir/cdx.parquet")

  /** Load the CDX sidecar written by [[writeWithCdx]]. */
  def readCdx(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[CdxEntry] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/cdx.parquet").as[CdxEntry]
  }

  /**
   * Random access into the archive: fetch EXACTLY the records named by
   * `cdx`, reading only their byte ranges — never scanning segments.
   * This is the 100 TB point-lookup shape: selecting 10^4 urls out of a
   * 10^10-record archive costs 10^4 ranged reads, not a 100 TB scan.
   * Entries are grouped per file and read in offset order (one open +
   * forward seeks per segment per task).
   */
  def fetchRanged(cdx: org.apache.spark.sql.Dataset[CdxEntry]): DataFrame = {
    import cdx.sparkSession.implicits._
    cdx.repartition(col("file"))
      .sortWithinPartitions("file", "offset")
      .mapPartitions { it =>
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def close(): Unit = if (in != null) { in.close(); in = null; curFile = null }
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => close()))
        it.map { e =>
          if (e.file != curFile) {
            close()
            val p = new Path(e.file)
            in = p.getFileSystem(new Configuration()).open(p)
            curFile = e.file
          }
          val buf = new Array[Byte](e.length.toInt)
          in.readFully(e.offset, buf)
          val bytes =
            if (buf.length >= 2 && (buf(0) & 0xFF) == 0x1F && (buf(1) & 0xFF) == 0x8B)
              gunzipAll(new ByteArrayInputStream(buf))
            else buf
          parseRecords(bytes).next()
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------- parse

  /** Read ASCII header lines up to the blank separator; None at EOF/garbage. */
  private def parseHeaders(bytes: Array[Byte], start: Int): Option[(Map[String, String], Int)] = {
    var i = bytes.indexOfSlice(CRLF.getBytes(US_ASCII), start)
    if (i < 0 || new String(bytes, start, i - start, US_ASCII) != Magic) return None
    var pos = i + 2
    val kv = Map.newBuilder[String, String]
    while (pos < bytes.length) {
      i = bytes.indexOfSlice(CRLF.getBytes(US_ASCII), pos)
      if (i < 0) return None
      if (i == pos) return Some((kv.result(), pos + 2)) // blank line: headers done
      val line = new String(bytes, pos, i - pos, US_ASCII)
      val c = line.indexOf(':')
      if (c > 0) kv += line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim
      pos = i + 2
    }
    None
  }

  /** Split an HTTP response block into (status, content-type, body). */
  private def parseHttp(block: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = block.indexOfSlice(s"$CRLF$CRLF".getBytes(US_ASCII))
    if (sep < 0) return (-1, "", Array.emptyByteArray)
    val head = new String(block, 0, sep, US_ASCII).split(CRLF)
    val status = head.headOption.map(_.split(" ", 3)) match {
      case Some(Array(v, code, _*)) if v.startsWith("HTTP/") => code.toIntOption.getOrElse(-1)
      case _ => -1
    }
    val ct = head.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") => l.substring(13).trim
    }.getOrElse("")
    (status, ct, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  /**
   * One forward pass over a decompressed WARC file. Length-framed, so the
   * cost is O(bytes); a record whose header is unparsable or whose
   * Content-Length overruns the buffer triggers a RESYNC — scan to the
   * next `WARC/1.0` magic and continue — so one corrupt record never
   * discards the rest of the segment.
   */
  def parseRecords(bytes: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private val magic = Magic.getBytes(US_ASCII)
    private var pos = 0
    private var nextRec: WarcRecord = null

    private def resync(from: Int): Int = {
      val i = bytes.indexOfSlice(magic, from)
      if (i < 0) bytes.length else i
    }

    @annotation.tailrec
    private def advance(): Unit = {
      nextRec = null
      if (pos >= bytes.length) return
      parseHeaders(bytes, pos) match {
        case None =>
          val r = resync(pos + 1)
          if (r < bytes.length) { pos = r; advance() } else pos = bytes.length
        case Some((h, bodyStart)) =>
          val len = h.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
          if (len < 0 || bodyStart + len > bytes.length) {
            pos = resync(pos + 1); if (pos < bytes.length) advance()
          } else {
            val block = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + len.toInt)
            val tpe = h.getOrElse("warc-type", "")
            val (status, ct, body) =
              if (tpe == "response") parseHttp(block) else (-1, "", block)
            nextRec = WarcRecord(tpe, h.getOrElse("warc-record-id", ""),
              h.getOrElse("warc-target-uri", ""), h.getOrElse("warc-date", ""),
              len, status, ct, body,
              h.getOrElse("warc-payload-digest", ""),
              h.getOrElse("warc-profile", ""),
              h.getOrElse("warc-refers-to-target-uri", ""),
              h.getOrElse("warc-refers-to-date", ""))
            pos = bodyStart + len.toInt + 4 // skip record-separator 2×CRLF
          }
      }
    }

    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; advance(); r
    }
  }

  /** Decompress a (possibly member-concatenated) gzip stream fully —
    * also the ranged-read entry point: handed a stream positioned at any
    * member offset (from a CDX-style index), it inflates from there. */
  def gunzipAll(in: InputStream): Array[Byte] = {
    val gz = new GZIPInputStream(in)
    val out = new ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    try {
      var n = gz.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = gz.read(buf) }
    } catch { case _: EOFException => () } // truncated trailing member: keep what decoded
    out.toByteArray
  }

  /**
   * Scan a directory of WARC segments into a DataFrame of records.
   * `binaryFile` schedules ONE TASK PER FILE — the archive-scale unit of
   * work — and prunes the `content` column when only paths are selected.
   * Gzip detection is by magic bytes, not extension.
   */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select("content")
      .as[Array[Byte]]
      .flatMap { raw =>
        val bytes =
          if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
            gunzipAll(new ByteArrayInputStream(raw))
          else raw
        parseRecords(bytes)
      }
      .toDF()
  }

  /**
   * Streaming ingest: watch `dir` for new WARC segments and emit their
   * parsed records incrementally — archive deltas land as files (the
   * crawl's natural unit) and flow straight into the corpus/prep
   * pipeline via Structured Streaming. Same parser, same
   * one-task-per-new-file shape; the file-source offset log gives
   * exactly-once per segment.
   */
  def readStreamRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .schema(StructType(Seq(
        StructField("path", StringType), StructField("modificationTime", TimestampType),
        StructField("length", LongType), StructField("content", BinaryType))))
      .load(dir)
      .select("content")
      .as[Array[Byte]]
      .flatMap { raw =>
        val bytes =
          if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
            gunzipAll(new ByteArrayInputStream(raw))
          else raw
        parseRecords(bytes)
      }
      .toDF()
  }

  /** Responses only, body decoded as UTF-8 text — the crawl-corpus view. */
  def responses(records: DataFrame): DataFrame =
    records.filter(col("warc_type") === "response")
      .select(col("target_uri").as("url"), col("warc_date").as("fetched_at"),
        col("http_status"), col("http_content_type"),
        octet_length(col("body")).cast("long").as("body_octets"),
        col("body").cast("string").as("body_text"))
}
