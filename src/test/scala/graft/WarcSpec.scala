package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.sources.Warc

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def synthDocs(n: Int) =
    spark.range(n.toLong).select(
      concat(lit("https://w"), pmod(col("id"), lit(7)), lit(".example.com/p/"), col("id")).as("url"),
      lit("2026-02-01T00:00:00Z").as("date"),
      concat(lit("body of page "), col("id"), lit(" — unicode ok")).as("body"))

  test("WARC round-trip: plain and per-record-gzip files both read back exactly") {
    for (gzip <- Seq(false, true)) {
      val dir = tmpDir(s"warc-rt-$gzip")
      val docs = synthDocs(40)
      Warc.write(docs, dir, nFiles = 3, gzip = gzip)
      val rec = Warc.read(spark, dir).cache()

      // one warcinfo per non-empty segment, leading each file
      val nFiles = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
      assert(rec.filter($"warc_type" === "warcinfo").count() == nFiles)
      assert(nFiles >= 1 && nFiles <= 3)

      // responses round-trip byte-exactly (url, status, content type, body)
      val got = Warc.responses(rec)
        .select("url", "http_status", "http_content_type", "body_text")
        .as[(String, Int, String, String)].collect().toSet
      val want = docs.as[(String, String, String)].collect()
        .map { case (u, _, b) => (u, 200, "text/html", b) }.toSet
      assert(got == want)
      // HTTP framing: record content_length covers status line + headers + body
      assert(Warc.responses(rec).filter($"body_octets" <= 0).isEmpty)
      rec.unpersist()
    }
  }

  test("gzip segments are member-per-record (Common Crawl layout, range-readable)") {
    val dir = tmpDir("warc-members")
    Warc.write(synthDocs(10), dir, nFiles = 1, gzip = true)
    val f = new java.io.File(dir).listFiles().find(_.getName.endsWith(".warc.gz")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // count gzip member headers: 1F 8B 08 magic at each member start
    var members = 0
    var i = 0
    while (i < bytes.length - 2) {
      if ((bytes(i) & 0xFF) == 0x1F && (bytes(i + 1) & 0xFF) == 0x8B && bytes(i + 2) == 8)
        members += 1
      i += 1
    }
    // exactly warcinfo + 10 responses; each record independently inflatable
    assert(members == 11, s"expected 11 gzip members, scanned $members")
    // a member in the middle inflates on its own given only its offset —
    // the property a CDX index + ranged reads depend on
    val offsets = (0 until bytes.length - 2).filter(i =>
      (bytes(i) & 0xFF) == 0x1F && (bytes(i + 1) & 0xFF) == 0x8B && bytes(i + 2) == 8)
    val mid = offsets(5)
    val one = Warc.gunzipAll(new java.io.ByteArrayInputStream(
      java.util.Arrays.copyOfRange(bytes, mid, bytes.length)))
    assert(Warc.parseRecords(one).next().warc_type == "response")
  }

  test("parser resyncs after a corrupt record instead of dropping the file") {
    val dir = tmpDir("warc-corrupt")
    Warc.write(synthDocs(12), dir, nFiles = 1, gzip = false)
    val f = new java.io.File(dir).listFiles().find(_.getName.endsWith(".warc")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val total = Warc.parseRecords(bytes).count(_.warc_type == "response")
    assert(total == 12)

    // smash the 3rd record's header magic (find its WARC/1.0 and flip it)
    val magic = "WARC/1.0".getBytes(UTF_8)
    var hits = 0; var pos = -1; var i = 0
    while (i < bytes.length && hits < 4) {
      if (bytes.slice(i, i + magic.length).sameElements(magic)) { hits += 1; pos = i }
      i += 1
    }
    val corrupted = bytes.clone()
    corrupted(pos) = 'X'.toByte
    val kept = Warc.parseRecords(corrupted).count(_.warc_type == "response")
    assert(kept == 11, s"one corrupt record should cost exactly itself, kept=$kept")
  }

  test("content-length overrun (truncated file) keeps all complete records") {
    val dir = tmpDir("warc-trunc")
    Warc.write(synthDocs(8), dir, nFiles = 1, gzip = false)
    val f = new java.io.File(dir).listFiles().find(_.getName.endsWith(".warc")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val truncated = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 10)
    val kept = Warc.parseRecords(truncated).count(_.warc_type == "response")
    assert(kept == 7, s"only the cut-off final record may be lost, kept=$kept")
  }

  test("CDX ranged fetch returns exactly the named records without scanning segments") {
    for (gzip <- Seq(false, true)) {
      val dir = tmpDir(s"warc-cdx-$gzip")
      val docs = synthDocs(50)
      Warc.writeWithCdx(docs, dir, nFiles = 4, gzip = gzip)
      val cdx = Warc.readCdx(spark, dir)
      assert(cdx.count() == 50) // one row per response, none for warcinfo

      // point-lookup a deterministic subset through the index
      val wanted = cdx.filter($"url".rlike("/p/.*[05]$"))
      val got = Warc.responses(Warc.fetchRanged(wanted))
        .select("url", "http_status", "body_text")
        .as[(String, Int, String)].collect().toSet
      val want = docs.filter($"url".rlike("/p/.*[05]$"))
        .as[(String, String, String)].collect()
        .map { case (u, _, b) => (u, 200, b) }.toSet
      assert(got == want && got.nonEmpty)

      // each CDX range is self-contained: offsets+lengths tile the file
      // (with gzip, each range is a standalone member — proven by the
      // fetch itself, which inflates ONLY the sliced bytes)
      val byFile = cdx.collect().groupBy(_.file)
      byFile.values.foreach { es =>
        val sorted = es.sortBy(_.offset)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a.offset + a.length == b.offset)
          case _ => ()
        }
        val f = new java.io.File(new java.net.URI(sorted.last.file).getPath)
        assert(sorted.last.offset + sorted.last.length == f.length())
      }
    }
  }

  test("streaming ingest: new segments flow incrementally, exactly once each") {
    val dir = tmpDir("warc-stream")
    val ckpt = tmpDir("warc-stream-ckpt")
    Warc.write(synthDocs(20).filter($"url".rlike("[02468]$")), dir, nFiles = 2)
    val q = Warc.responses(Warc.readStreamRecords(spark, dir))
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val first = spark.table("warc_stream").select("url").as[String].collect().toSet
      assert(first == synthDocs(20).filter($"url".rlike("[02468]$"))
        .select("url").as[String].collect().toSet)

      // drop a new delta segment: only its records append
      val staging = tmpDir("warc-delta")
      Warc.write(synthDocs(20).filter($"url".rlike("[13579]$")), staging, nFiles = 1)
      // move into the watched root with a distinct name (file source keys on path)
      val f = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".warc.gz")).get
      java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$dir/delta-00001.warc.gz"))
      q.processAllAvailable()
      val all = spark.table("warc_stream").select("url").as[String].collect()
      assert(all.length == 20 && all.toSet ==
        synthDocs(20).select("url").as[String].collect().toSet,
        "delta records appended exactly once, earlier segments not re-emitted")
    } finally q.stop()
  }

  test("revisit records: unchanged payloads archive payload-less and point back") {
    val dir = tmpDir("warc-revisit")
    val docs = synthDocs(30).cache()
    // prior snapshot: ids %3==0 unchanged, %3==1 changed digest, %3==2 absent
    val prior = docs
      .withColumn("id", regexp_extract($"url", "/p/([0-9]+)$", 1).cast("long"))
      .filter(pmod($"id", lit(3)) < 2)
      .select($"url",
        when(pmod($"id", lit(3)) === 0, sha2($"body".cast("binary"), 256))
          .otherwise(sha2(concat($"body", lit("X")).cast("binary"), 256)).as("digest"),
        lit("2025-11-01T00:00:00Z").as("prior_date"))
    val cdx = Warc.writeIndexedDedup(docs, prior, dir, nFiles = 2).cache()
    assert(cdx.count() == 30) // every fetch indexed, revisit or not

    val rec = Warc.read(spark, dir).cache()
    val revisits = rec.filter($"warc_type" === "revisit")
    val responses = rec.filter($"warc_type" === "response")
    assert(revisits.count() == 10 && responses.count() == 20)

    // revisits: empty block, digest + profile + refers-to headers present
    assert(revisits.filter(octet_length($"body") =!= 0).isEmpty)
    assert(revisits.filter(!$"warc_profile".contains("identical-payload-digest")).isEmpty)
    assert(revisits.filter($"refers_to_uri" =!= $"target_uri" ||
      $"refers_to_date" =!= "2025-11-01T00:00:00Z").isEmpty)

    // every record's digest header is sha256 of the CURRENT body
    val want = docs.select($"url",
      concat(lit("sha256:"), sha2($"body".cast("binary"), 256)).as("d"))
    assert(rec.filter($"warc_type".isin("revisit", "response"))
      .join(want, $"target_uri" === want("url"))
      .filter($"payload_digest" =!= $"d").isEmpty)

    // responses round-trip their bodies; a ranged CDX fetch of a revisit
    // record inflates to the revisit (point-lookup works for both kinds)
    val full = Warc.responses(responses).select("url", "body_text")
      .as[(String, String)].collect().toSet
    val wantFull = docs
      .withColumn("id", regexp_extract($"url", "/p/([0-9]+)$", 1).cast("long"))
      .filter(pmod($"id", lit(3)) =!= 0)
      .select("url", "body").as[(String, String)].collect().toSet
    assert(full == wantFull)
    val revUrl = revisits.select("target_uri").as[String].head()
    val fetched = Warc.fetchRanged(cdx.filter($"url" === revUrl))
    assert(fetched.select("warc_type").as[String].collect().toSeq == Seq("revisit"))
    docs.unpersist(); cdx.unpersist(); rec.unpersist()
  }

  test("read schedules one task per segment and prunes content for path-only scans") {
    val dir = tmpDir("warc-tasks")
    Warc.write(synthDocs(30), dir, nFiles = 4, gzip = true)
    val nFiles = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    val rec = Warc.read(spark, dir)
    // file = unit of parallelism: at least one partition per file is NOT
    // required (binaryFile may coalesce small files) but records from a
    // given file stay in one partition — the warcinfo leads its segment.
    val firstTypes = rec.select("warc_type").as[String]
      .mapPartitions(it => Iterator.single(it.toSeq.headOption.getOrElse("")))
      .collect().filter(_.nonEmpty)
    assert(firstTypes.count(_ == "warcinfo") >= 1)
    assert(Warc.responses(rec).count() == 30 &&
      rec.filter($"warc_type" === "warcinfo").count() == nFiles)
  }
}
