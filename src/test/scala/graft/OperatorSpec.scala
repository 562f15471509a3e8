package graft

import org.apache.spark.sql.functions._
import graft.sources.{Chains, Sitemap}
import graft.text.{Chunker, TextOps}
import graft.dedup.NearDup
import graft.ann.Similarity
import graft.extract.Classify
import graft.multimodal.MediaOps
import graft.sinks.Sinks

class OperatorSpec extends SparkTestBase {
  import spark.implicits._

  // ---------- chains (S1/S2, F8-F10, A2-A4, W6, J4/K5) ----------

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("chain CSV scan, filters, stats, batching") {
    val dir = tmpDir("chains")
    val csv =
      """corporation_name,primary_url,secondary_urls,facility_types,priority,estimated_facilities,last_updated
        |Acme Care,https://acme.example.com,https://a2.example.com|https://a3.example.com,skilled nursing|hospice,1,200+,2025-01-15
        |Beta Health,https://beta.example.com,,assisted living,2,50,2025-07-20
        |,https://nobody.example.com,,,3,,
        |Gamma Living,https://gamma.example.com,,memory care|assisted living,3,1000+,
        |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/chains.csv"), csv.getBytes)
    val chains = Chains.load(spark, s"$dir/chains.csv")
    assert(chains.count() == 3) // required-field row dropped
    assert(chains.filter($"corporation_name" === "Acme Care")
      .select(size($"secondary_urls")).as[Int].head() == 2)

    val filtered = Chains.filterChains(chains, maxPriority = 3,
      facilityType = Some("Assisted Living"), staleDays = 30, asOf = "2025-07-25")
    // Beta fresh (5 days) → dropped; Gamma null last_updated → kept
    assert(filtered.select("corporation_name").as[String].collect().toSet == Set("Gamma Living"))

    assert(Chains.priorityDistribution(chains).as[(Int, Long)].collect().toSeq ==
      Seq((1, 1L), (2, 1L), (3, 1L)))
    val types = Chains.typeDistribution(chains).as[(String, Long)].collect().toMap
    assert(types("assisted living") == 2 && types("skilled nursing") == 1)
    assert(Chains.estimatedTotal(chains).as[Long].head() == 1250)
    val batches = Chains.withBatchId(chains, 2)
      .select("corporation_name", "batch_id").as[(String, Long)].collect().toMap
    assert(batches("Acme Care") == 0 && batches("Gamma Living") == 1)
  }

  test("consolidate: per-chain JSON round-trip, broadcast equi-join enrichment, run summary") {
    val dir = tmpDir("consolidate")
    val chains = Seq(
      ("Acme Care", "https://acme.example.com", 1, Seq("skilled nursing")),
      ("Beta Health", "https://beta.example.com", 2, Seq("assisted living")))
      .toDF("corporation_name", "primary_url", "priority", "facility_types")
    val facilities = Seq(
      ("https://acme.example.com/loc/1", "Acme One", "Acme Care"),
      ("https://acme.example.com/loc/2", "Acme Two", "Acme Care"),
      ("https://beta.example.com/f/9", "Beta Nine", "Beta Health"),
      ("https://other.example.com/x", "Unattributed", "Ghost Chain"))
      .toDF("sourceUrl", "name", "corporation_name")

    // K5 write + read-back: one JSON dir per chain, partition col restored
    Sinks.writePerChain(facilities, s"$dir/perchain")
    val back = Sinks.readPerChain(spark, s"$dir/perchain")
    assert(back.count() == 4)
    assert(back.select("corporation_name").distinct().count() == 3)

    // J4: broadcast hash equi-join on corporation_name (never a
    // nested-loop theta join — asserted on the physical plan)
    val consolidated = Chains.consolidate(back, chains)
    val plan = consolidated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val acme = consolidated.filter($"name" === "Acme One")
      .select("source_corporation", "corporation_priority").as[(String, Int)].head()
    assert(acme == ("Acme Care", 1))
    // unknown chain keeps null metadata (left join)
    assert(consolidated.filter($"name" === "Unattributed")
      .select("corporation_priority").head().isNullAt(0))

    // host attribution: equi-join + prefix post-filter, no nested loop
    val attributed = Chains.attribute(facilities.drop("corporation_name"), chains)
    assert(!attributed.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val m = attributed.select("name", "corporation_name").as[(String, String)].collect().toMap
    assert(m("Acme One") == "Acme Care" && m("Beta Nine") == "Beta Health")
    assert(m("Unattributed") == null)

    // K6/A1: run-summary counts (main.py:94-104 shape)
    val results = Seq(("Acme Care", true, 2L), ("Beta Health", true, 1L),
      ("Ghost Chain", false, 0L)).toDF("corporation_name", "success", "facilities_count")
    val s = Sinks.runSummary(results)
      .as[(Long, Long, Long, Long)].head()
    assert(s == ((3L, 2L, 1L, 3L)))
  }

  test("seed file scan: comments skipped, https prepended") {
    val dir = tmpDir("seeds")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seeds.txt"),
      "# comment\nexample.com\n\nhttps://x.org/a\n  spaced.net  \n".getBytes)
    val seeds = Chains.loadSeeds(spark, s"$dir/seeds.txt").as[String].collect().toSet
    assert(seeds == Set("https://example.com", "https://x.org/a", "https://spaced.net"))
  }

  test("address line-split fallback (C9) parses street/city/state/zip from text lines") {
    import graft.extract.FieldExtract
    val got = Seq(
      "Sunrise Manor\n123 Oak Street\nSpringfield, KS 66012\nCall us today",
      "1 Elm St\nLakewood CO 80226",
      "Facility\n400 Pine Ave\nSuite 2, Riverton, Texas 75001",
      "no structured address at all")
      .toDF("text")
      .select(FieldExtract.addressLines($"text").as("a"))
      .select("a.street", "a.city", "a.state", "a.zip")
      .as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("123 Oak Street", "Springfield", "KS", "66012"),
      ("1 Elm St", "Lakewood", "CO", "80226"),
      ("400 Pine Ave", "Riverton", "TX", "75001"),
      (null, null, null, null)))
  }

  test("target top-N (W3): confidence/expected-count ordering with deterministic tie-break") {
    import graft.extract.Targets
    val targets = Seq(
      ("https://x.com/a", 0.9, 10), ("https://x.com/b", 0.9, 25),
      ("https://x.com/c", 0.7, 99), ("https://x.com/d", 0.9, 25),
      ("https://x.com/e", 0.5, 1))
      .toDF("url", "confidence", "expected_count")
    val top = Targets.topTargets(targets, 3).select("url").as[String].collect().toSeq
    assert(top == Seq("https://x.com/b", "https://x.com/d", "https://x.com/a"))
  }

  // ---------- sitemap / robots (S4/S5) ----------

  test("sitemap loc explode + classification, robots parse") {
    val xml =
      """<?xml version="1.0"?><urlset><url><loc>https://h.com/locations/springfield/</loc></url>
        |<url><loc> https://h.com/locations/ </loc></url>
        |<url><loc>https://h.com/news/x</loc></url></urlset>""".stripMargin
    val locs = Sitemap.explodeLocs(Seq(("h.com", xml)).toDF("host", "xml"))
      .withColumn("cls", Sitemap.classifyLoc($"loc"))
      .select("loc", "cls").as[(String, String)].collect().toSet
    assert(locs == Set(
      ("https://h.com/locations/springfield/", "facility"),
      ("https://h.com/locations/", "listing"),
      ("https://h.com/news/x", "other")))

    val robots = Sitemap.parseRobots(Seq(("h.com",
      "User-agent: *\nDisallow: /careers/\nDisallow: /tmp/\ncrawl-delay: 2.5\nSitemap: https://h.com/sitemap.xml"))
      .toDF("host", "robots_txt")).collect()(0)
    assert(robots.getSeq[String](1) == Seq("/careers/", "/tmp/"))
    assert(robots.getDouble(2) == 2.5)
    assert(robots.getSeq[String](3) == Seq("https://h.com/sitemap.xml"))
  }

  // ---------- chunker ----------

  test("chunker: 600-token chunks with 10% overlap") {
    val text = (1 to 1500).map(i => s"w$i").mkString(" ")
    val out = Chunker.chunk(Seq((1L, text)).toDF("id", "text"), "text").cache()
    val rows = out.select("chunk_idx", "chunk_start", "chunk_tokens")
      .as[(Int, Int, Int)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(0, 540, 1080)) // stride = 600·0.9
    assert(rows.map(_._3).toSeq == Seq(600, 600, 420))
    // overlap: chunk k starts inside chunk k-1
    assert(rows(1)._2 < rows(0)._2 + 600)
    val first = out.filter($"chunk_idx" === 0).select("chunk_text").as[String].head()
    assert(first.startsWith("w1 w2 ") && first.endsWith(" w600"))
    assert(Chunker.chunk(Seq((1L, "")).toDF("id", "text"), "text").count() == 0)
  }

  // ---------- classification (A5) + completeness (A10) ----------

  test("keyword-frequency type classification argmax") {
    val pages = Seq(
      (1L, "Our skilled nursing facility offers rehabilitation and nursing home care"),
      (2L, "Memory care for dementia and alzheimer patients"),
      (3L, "nothing relevant here")).toDF("id", "text")
    val out = Classify.classify(pages, "id", "text")
      .select("id", "best_type").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("skilled nursing"))
    assert(out(2L).contains("memory care"))
    assert(out(3L).isEmpty)
  }

  test("completeness score weights required 0.7 / optional 0.3") {
    val df = Seq(("A", "addr", "c", "p", "e", "12", Seq("s")),
                 ("B", null, null, null, null, null, null))
      .toDF("name", "address", "city", "phone", "email", "beds", "servicesOffered")
      .withColumn("score", Classify.completenessScore($"name", $"address", $"city",
        $"phone", $"email", $"beds", $"servicesOffered"))
    val scores = df.select("name", "score").as[(String, Double)].collect().toMap
    assert(scores("A") == 1.0)
    assert(scores("B") == math.round(1.0 / 3 * 0.7 * 10000) / 10000.0)
  }

  // ---------- near-dup family ----------

  test("minhash LSH finds planted near-duplicates and passes exact-jaccard verify") {
    // letter-only tokens (TextOps.words splits on non-letters)
    def tok(i: Long, j: Long): String = {
      val h = graft.synth.Synth.mix2(i, j)
      (0 until 5).map(s => ('a' + math.floorMod(h >> (5 * s), 26).toInt).toChar).mkString
    }
    val base = (1 to 40).map { i =>
      (i.toLong, (1 to 60).map(j => tok(i.toLong, j.toLong)).mkString(" "))
    }
    // plant: doc 100+i = doc i with two tokens changed (high jaccard)
    val dups = (1 to 10).map { i =>
      val words = base(i - 1)._2.split(" ").toVector.updated(0, "xq").updated(1, "yq")
      (100L + i, words.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val pairs = NearDup.nearDupPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    (1 to 10).foreach { i =>
      assert(pairs.contains((i.toLong, 100L + i)), s"missed planted pair $i")
    }
    // no pair among the mutually-distinct base docs
    assert(pairs.forall { case (a, b) => b >= 100 })
  }

  test("simhash: identical docs at hamming 0, distinct docs far apart") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
                   (2L, "alpha beta gamma delta epsilon zeta"),
                   (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val pairs = NearDup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("jaccard: exact on known shingle sets") {
    val df = Seq(("a b c d e", "a b c d e"), ("a b c d e", "v w x y z"))
      .toDF("ta", "tb")
      .select(round(NearDup.jaccard($"ta", $"tb"), 4).as("j")).as[Double].collect()
    assert(df(0) == 1.0 && df(1) == 0.0)
  }

  // ---------- similarity search ----------

  test("ann: brute-force topK exact; LSH probe returns subset with query top-1") {
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(d => (graft.synth.Synth.mix2(i, d.toLong) % 1000).toFloat / 1000f))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 7L).select("embedding").as[Array[Float]].head().toSeq
    val exact = Similarity.topK(vecs, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect()
    assert(exact.head == 7L) // self-similarity = 1.0 tops the list
    val lsh = Similarity.annLsh(vecs, "vec_id", "embedding", q, 5, planes = 4)
      .select("vec_id").as[Long].collect()
    assert(lsh.contains(7L)) // query's own bucket contains the query vector
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 8, iters = 1)
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
    assert(assigned.select("centroid").distinct().count() <= 8)
    val ivf = Similarity.annIvf(assigned, "vec_id", "embedding", q, 5, nProbe = 3, cents)
      .select("vec_id").as[Long].collect()
    assert(ivf.nonEmpty)
    // determinism: same result under a different partitioning
    val ivf2 = Similarity.annIvf(assigned.repartition(7), "vec_id", "embedding",
      q, 5, nProbe = 3, cents).select("vec_id").as[Long].collect()
    assert(ivf.toSeq == ivf2.toSeq)

    // persisted index: reopen → identical results, and the probe's
    // centroid IN filter prunes partitions at planning time
    val dir = tmpDir("ivfstore")
    Similarity.writeIndex(assigned, dir)
    val opened = Similarity.openIndex(spark, dir)
    val ivfDisk = Similarity.annIvf(opened, "vec_id", "embedding", q, 5,
      nProbe = 3, cents)
    assert(ivfDisk.select("vec_id").as[Long].collect().toSeq == ivf.toSeq)
    val scan = ivfDisk.queryExecution.executedPlan.toString
    // the centroid filter must be INSIDE the PartitionFilters bracket —
    // a post-scan Filter would leave "PartitionFilters: []" and still
    // contain both substrings
    assert("PartitionFilters: \\[[^\\]]*centroid".r.findFirstIn(scan).isDefined,
      s"expected centroid partition pruning on the index scan:\n$scan")
  }

  // ---------- text ops ----------

  test("langid picks the stopword-dominant language") {
    val df = Seq(
      "the cat and the dog went to the house that was big",
      "el perro y la casa de los gatos por la ciudad",
      "der hund und die katze ist von den nicht da",
      "le chat dans les rues pour une ville sur la table").toDF("text")
      .select(TextOps.langId($"text").as("l")).as[String].collect()
    assert(df.toSeq == Seq("en", "es", "de", "fr"))
    assert(Seq("zzz qqq").toDF("text")
      .select(TextOps.langId($"text")).as[String].head() == "und")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("Hello   World", "hello world", "hello  world ")
      .toDF("text").select(TextOps.fingerprint($"text")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  // ---------- multimodal ----------

  test("media features are deterministic and batch-shaped") {
    val m1 = MediaOps.imageFeatures(MediaOps.synthMedia(spark, 100L)).collect()
      .sortBy(_.media_id)
    val m2 = MediaOps.imageFeatures(MediaOps.synthMedia(spark, 100L)).collect()
      .sortBy(_.media_id)
    assert(m1.length > 10)
    assert(m1.map(f => (f.media_id, f.mean_luma)).toSeq ==
      m2.map(f => (f.media_id, f.mean_luma)).toSeq)
    assert(m1.forall(_.embedding.length == 16))
    // decoded dims come from the actual PNG raster and match metadata
    val metaDims = MediaOps.synthMedia(spark, 100L).filter(_.kind == "image")
      .collect().map(r => r.media_id -> (r.width, r.height)).toMap
    assert(m1.forall(f => metaDims(f.media_id) == (f.width, f.height)))
  }

  test("image decode is real: known PNGs round-trip exact luma") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def png(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val rows = Seq(
      MediaOps.MediaRow(1L, "image", png(0xFFFFFF, 8, 6), 8, 6, 0, 0), // white
      MediaOps.MediaRow(2L, "image", png(0x000000, 5, 5), 5, 5, 0, 0), // black
      MediaOps.MediaRow(3L, "image", Array[Byte](1, 2, 3), 4, 4, 0, 0)) // undecodable
    val feats = MediaOps.imageFeatures(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L)) // bad payload dropped
    val white = feats(0); val black = feats(1)
    assert((white.width, white.height, white.channels) == (8, 6, 3))
    assert(math.abs(white.mean_luma - 1.0) < 1e-9)
    assert(white.embedding.forall(v => math.abs(v - 1.0f) < 1e-6f))
    assert(black.mean_luma == 0.0 && black.embedding.forall(_ == 0f))
  }

  test("video decode is real: GFV1 seek + PNG frame round-trip exact luma") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def png(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    // 5 frames alternating white/black; stride 2 must pick 0,2,4 (all
    // white) — seek correctness shows up as exact per-frame luma
    val vid = MediaOps.Gfv1.encode(
      (0 until 5).map(f => png(if (f % 2 == 0) 0xFFFFFF else 0x000000, 6, 4)))
    val rows = Seq(
      MediaOps.MediaRow(1L, "video", vid, 6, 4, 0, 5),
      MediaOps.MediaRow(2L, "video", Array[Byte](9, 9, 9), 0, 0, 0, 3), // not GFV1
      MediaOps.MediaRow(3L, "image", png(0xFFFFFF, 2, 2), 2, 2, 0, 0))  // filtered
    val all = MediaOps.sampleFrames(spark.createDataset(rows), stride = 1)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(all.map(f => (f.media_id, f.frame_idx)).toSeq ==
      (0 until 5).map(f => (1L, f)))
    assert(all.forall(f =>
      math.abs(f.frame_luma - (if (f.frame_idx % 2 == 0) 1.0 else 0.0)) < 1e-9))
    val strided = MediaOps.sampleFrames(spark.createDataset(rows), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(strided.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(strided.forall(f => math.abs(f.frame_luma - 1.0) < 1e-9))
    // synthetic corpus: deterministic, frame count from the container
    // header (= n_frames metadata for synthMedia rows)
    val frames = MediaOps.sampleFrames(MediaOps.synthMedia(spark, 100L), stride = 2)
    val f1 = frames.collect().sortBy(f => (f.media_id, f.frame_idx))
    val f2 = MediaOps.sampleFrames(MediaOps.synthMedia(spark, 100L), stride = 2)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(f1.length > 0 && f1.map(f => (f.media_id, f.frame_idx, f.frame_luma)).toSeq ==
      f2.map(f => (f.media_id, f.frame_idx, f.frame_luma)).toSeq)
    val meta = MediaOps.synthMedia(spark, 100L).filter(_.kind == "video")
      .collect().map(r => r.media_id -> r.n_frames).toMap
    val perVideo = f1.groupBy(_.media_id).view.mapValues(_.length)
    assert(perVideo.forall { case (id, c) => c == (meta(id) + 1) / 2 })
    // uniform-hash pixels: mean luma of every frame near 0.5
    assert(f1.forall(f => math.abs(f.frame_luma - 0.5) < 0.08))
  }

  test("audio decode is real: known WAVs round-trip exact RMS/ZCR") {
    def wav(samples: Array[Short], sr: Int): Array[Byte] = {
      // independent hand-rolled encoder (mirrors the RIFF spec, not the
      // production synthWav code path)
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + samples.length * 2).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
      bb.put("data".getBytes).putInt(samples.length * 2)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // constant +16384 (= 0.5 amplitude): rms 0.5, zero crossings 0
    val const = Array.fill[Short](100)(16384)
    // alternating ±16384: rms 0.5, a crossing at EVERY step -> zcr 1
    val alt = Array.tabulate[Short](100)(i => if (i % 2 == 0) 16384 else -16384)
    val rows = Seq(
      MediaOps.MediaRow(1L, "audio", wav(const, 8000), 0, 0, 8000, 0),
      MediaOps.MediaRow(2L, "audio", wav(alt, 16000), 0, 0, 16000, 0),
      MediaOps.MediaRow(3L, "audio", Array[Byte](9, 9, 9), 0, 0, 0, 0), // undecodable
      MediaOps.MediaRow(4L, "image", Array[Byte](1), 0, 0, 0, 0))       // filtered out
    val feats = MediaOps.audioFeatures(spark.createDataset(rows), embeddingDim = 4)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L))
    val c = feats(0); val a = feats(1)
    assert((c.sample_rate, c.n_samples, c.channels) == (8000, 100L, 1))
    assert(math.abs(c.rms - 0.5) < 1e-9 && c.zcr == 0.0)
    assert(c.embedding.forall(v => math.abs(v - 0.5f) < 1e-6f))
    assert(a.sample_rate == 16000 && math.abs(a.rms - 0.5) < 1e-9 && a.zcr == 1.0)
    // synthetic corpus decodes deterministically, embeddings sized
    val m1 = MediaOps.audioFeatures(MediaOps.synthMedia(spark, 100L)).collect()
      .sortBy(_.media_id)
    val m2 = MediaOps.audioFeatures(MediaOps.synthMedia(spark, 100L)).collect()
      .sortBy(_.media_id)
    assert(m1.length > 10 && m1.forall(_.embedding.length == 16))
    assert(m1.map(f => (f.media_id, f.rms, f.zcr)).toSeq ==
      m2.map(f => (f.media_id, f.rms, f.zcr)).toSeq)
    // uniform-hash samples: rms near 1/sqrt(3), zcr near 0.5
    assert(m1.forall(f => math.abs(f.rms - 0.577) < 0.05 && math.abs(f.zcr - 0.5) < 0.1))
  }

  // ---------- sinks ----------

  test("csv sink flattens arrays pipe-joined; json sink round-trips") {
    val dir = tmpDir("sinks")
    val df = Seq(("A", Seq("x", "y", "z")), ("B", Seq.empty[String]))
      .toDF("name", "services")
    Sinks.writeCsvFlattened(df, s"$dir/csv")
    val back = spark.read.option("header", true).csv(s"$dir/csv")
      .as[(String, Option[String])].collect().toMap
    assert(back("A").contains("x | y | z"))
    Sinks.writeJson(df, s"$dir/json")
    assert(spark.read.json(s"$dir/json").count() == 2)
  }

  test("embedding near-dup bucket cap truncates a degenerate bucket deterministically") {
    // 50 identical vectors hash to ONE LSH bucket — the all-similar slice
    // that would go quadratic; cap 10 keeps the 10 smallest ids
    val v = Seq.fill(64)(1.0f)
    val vecs = (0L until 50L).map(i => (i, v)).toDF("vec_id", "embedding")
    val capped = Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.99, maxBucketSize = 10)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(capped.size == 45) // C(10,2) — survivors only
    assert(capped.forall { case (a, b) => a < 10 && b < 10 })
    // default cap is far above the bucket: all C(50,2) pairs emitted
    assert(Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.99).count() == 50L * 49 / 2)
  }

  test("workbook sink (K3): one dataset directory per sheet, contents round-trip") {
    val dir = tmpDir("sheets")
    val facilities = Seq(("A", "AL"), ("B", "GA")).toDF("name", "state")
    val summary = Seq(("total", 2L)).toDF("metric", "value")
    Sinks.writeSheets(Map("facilities" -> facilities, "summary" -> summary), dir)
    assert(spark.read.parquet(s"$dir/facilities").as[(String, String)]
      .collect().toSet == Set(("A", "AL"), ("B", "GA")))
    assert(spark.read.parquet(s"$dir/summary").as[(String, Long)]
      .collect().toSeq == Seq(("total", 2L)))
  }

  test("xlsx sink (K3): a real OOXML workbook — zip structure, rels, typed cells") {
    import javax.xml.parsers.DocumentBuilderFactory
    import org.w3c.dom.Element
    val path = tmpDir("xlsx") + "/report.xlsx"
    val facilities = Seq(
      ("St. Mary's <Care> & Rehab", Seq("nursing", "rehab"), 120L, 0.93, true),
      ("Plainview", Seq.empty[String], 45L, 0.51, false))
      .toDF("name", "services", "beds", "confidence", "valid")
    val summary = Seq(("total_sites", 2L)).toDF("metric", "value")
    Sinks.writeXlsx(Seq("facilities" -> facilities, "summary" -> summary), path)

    // read back with JDK zip + DOM only — independent of the writer
    val zf = new java.util.zip.ZipFile(path)
    def xml(name: String): Element = {
      val e = zf.getEntry(name); assert(e != null, s"missing zip part $name")
      DocumentBuilderFactory.newInstance().newDocumentBuilder()
        .parse(zf.getInputStream(e)).getDocumentElement
    }
    try {
      assert(xml("[Content_Types].xml").getElementsByTagName("Override").getLength == 3)
      val sheets = xml("xl/workbook.xml").getElementsByTagName("sheet")
      assert(sheets.getLength == 2)
      assert(sheets.item(0).getAttributes.getNamedItem("name").getNodeValue == "facilities")
      assert(xml("xl/_rels/workbook.xml.rels").getElementsByTagName("Relationship").getLength == 2)
      val rows = xml("xl/worksheets/sheet1.xml").getElementsByTagName("row")
      assert(rows.getLength == 3) // header + 2 data rows
      def cells(r: Int): Seq[Element] = {
        val cs = rows.item(r).asInstanceOf[Element].getElementsByTagName("c")
        (0 until cs.getLength).map(cs.item(_).asInstanceOf[Element])
      }
      assert(cells(0).map(_.getTextContent) ==
        Seq("name", "services", "beds", "confidence", "valid"))
      val r1 = cells(1)
      assert(r1(0).getAttribute("t") == "inlineStr" &&
        r1(0).getTextContent == "St. Mary's <Care> & Rehab") // XML escaping survives
      assert(r1(1).getTextContent == "nursing | rehab")      // arrays pipe-joined
      assert(r1(2).getAttribute("t") == "" && r1(2).getTextContent == "120") // native numeric
      assert(r1(3).getTextContent == "0.93")
      assert(r1(4).getAttribute("t") == "b" && r1(4).getTextContent == "1")
      assert(cells(2)(4).getTextContent == "0")
      val s2 = xml("xl/worksheets/sheet2.xml").getElementsByTagName("row")
      assert(s2.getLength == 2)
    } finally zf.close()
    // the bounded contract refuses oversized sheets instead of truncating
    intercept[IllegalArgumentException] {
      Sinks.writeXlsx(Seq("big" -> facilities), path, maxRowsPerSheet = 2)
    }
    intercept[IllegalArgumentException] {
      Sinks.writeXlsx(Seq("bad[name" -> summary), path)
    }
    assert(Sinks.colLetters(0) == "A" && Sinks.colLetters(25) == "Z" &&
      Sinks.colLetters(26) == "AA" && Sinks.colLetters(701) == "ZZ" &&
      Sinks.colLetters(702) == "AAA")
  }
}
