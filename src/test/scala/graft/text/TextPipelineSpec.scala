package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.dedup.NearDup

/** TextPipeline: the composed prep pipeline (quality → langid → exact
  * dedup → near-dup → chunking) and its one-pass signature+shingle-set
  * aggregate (equivalence vs the standalone NearDup operators). */
class TextPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // 81 words, period 9 → only 9 distinct 5-shingles; en stopword ratio 0.44
  private val enText = Seq.fill(9)("the quick data is good and fast for all").mkString(" ")
  // one appended word adds exactly 1 new 5-shingle → jaccard 9/10 = 0.9
  private val enNear = enText + " extraword"
  private val esText = Seq.fill(5)("el perro de la casa que corre por con una para").mkString(" ")
  private val enOther = "different vocabulary entirely with the unique zebra words making twelve tokens here"
  private val junk = "!? " * 20

  private def corpus = Seq(
    (1L, enText), // survives
    (2L, enText), // exact copy → exact-dedup drop (min id 1 survives)
    (3L, enNear), // near copy of 1 → near-dup drop
    (4L, esText), // quality 0.7 but lang 'es' → language gate
    (5L, junk),   // quality 0.4 → quality gate
    (6L, enOther) // survives (12 tokens, distinct vocabulary)
  ).toDF("doc_id", "text")

  test("pipeline gates: quality, language, exact dedup, near-dup, chunk/token yield") {
    val r = TextPipeline.prepare(corpus, "doc_id", "text")
    assert(r.survivors.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 6L))
    val pairs = r.pairs.select("idA", "idB", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 3L, 0.9))) // 9 shared / 10 distinct shingles

    val row = TextPipeline.stats(r, "text").collect()(0)
    val got = row.getValuesMap[Long](Seq("n_input", "n_quality", "n_lang",
      "n_exact", "n_neardup_pairs", "n_survivors", "n_chunks", "n_tokens"))
    assert(got == Map(
      "n_input" -> 6L, "n_quality" -> 5L, "n_lang" -> 4L, "n_exact" -> 3L,
      "n_neardup_pairs" -> 1L, "n_survivors" -> 2L,
      // doc 1: 81 tokens → ceil-by-stride-45 = 2 chunks; doc 6: 12 → 1
      "n_chunks" -> 3L, "n_tokens" -> 93L))
  }

  test("one-pass signatureShingles ≡ standalone minhashSignatures + shingle sets") {
    val docs = corpus.filter($"doc_id" =!= 5L) // junk has 1 degenerate shingle; fine either way but keep it simple
    val fused = TextPipeline.signatureShingles(docs, "doc_id", "text", numPerms = 16, k = 5)
    val standalone = NearDup.minhashSignatures(docs, "doc_id", "text", numPerms = 16, k = 5)
    val sigCols = (0 until 16).map(i => col(s"m$i"))
    assert(fused.select(col("doc_id") +: sigCols: _*).except(standalone).isEmpty)
    assert(standalone.except(fused.select(col("doc_id") +: sigCols: _*)).isEmpty)
    // carried shingle sets = shingleHashes sets (order-insensitive)
    val fusedSets = fused.select(col("doc_id"), array_sort(col("__shSet")).as("s"))
    val direct = docs.select(col("doc_id"),
      array_sort(NearDup.shingleHashes(col("text"), 5)).as("s"))
    assert(fusedSets.except(direct).isEmpty && direct.except(fusedSets).isEmpty)
  }

  test("fused near-dup pairs ≡ NearDup.nearDupPairs on the same corpus") {
    val docs = corpus
    val sigs = TextPipeline.signatureShingles(docs, "doc_id", "text", numPerms = 64, k = 5)
    val fused = TextPipeline.nearDupPairsFromSigs(sigs, "doc_id",
        numPerms = 64, bands = 16, threshold = 0.8)
      .select("idA", "idB", "jaccard").as[(Long, Long, Double)].collect().sorted.toSeq
    val standalone = NearDup.nearDupPairs(docs, "doc_id", "text",
        threshold = 0.8, numPerms = 64, bands = 16, k = 5)
      .select("idA", "idB", "jaccard").as[(Long, Long, Double)].collect().sorted.toSeq
    assert(fused == standalone)
    // without the exact stage, copy 2 pairs with both 1 and near-copy 3
    assert(fused.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("incremental dedup ≡ one-shot dedup; dups of DROPPED store docs still caught") {
    // base has 9 distinct 5-shingles (period-9 text); appending m words
    // adds exactly m shingles → controllable jaccards:
    //   J(1,2) = 9/11 ≈ 0.818  (batch-1 pair → 2 dropped)
    //   J(1,3) = 9/13 ≈ 0.692  (below threshold)
    //   J(2,3) = 11/13 ≈ 0.846 (3's ONLY over-threshold partner is the
    //                           dropped doc 2 — survivor-only store would leak it)
    val cfg = TextPipeline.PipelineConfig(numPerms = 64, bands = 32)
    val b1 = Seq((1L, enText), (2L, enText + " alpha beta")).toDF("doc_id", "text")
    val b2 = Seq((3L, enText + " alpha beta gamma delta"), (4L, enOther))
      .toDF("doc_id", "text")
    val empty = TextPipeline.signatureShingles(b1.limit(0), "doc_id", "text",
      cfg.numPerms, cfg.k).drop("__shSet")
    val (s1, sig1) = TextPipeline.incrementalDedup(empty, b1.limit(0), b1,
      "doc_id", "text", cfg)
    val (s2, sig2) = TextPipeline.incrementalDedup(sig1, b1, b2,
      "doc_id", "text", cfg)
    // the store is SLIM: signatures only, no carried shingle sets
    assert(!sig1.columns.contains("__shSet") && !sig2.columns.contains("__shSet"))
    assert(s1.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(s2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(4L)) // 3 dropped via 2
    assert(sig1.count() == 2 && sig2.count() == 2) // store keeps dropped docs' sigs
    // exact equivalence with the one-shot operator over the union
    val oneShot = NearDup.dropNearDups(b1.unionByName(b2), "doc_id", "text",
        threshold = cfg.threshold)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert((s1.select("doc_id").as[Long].collect() ++
      s2.select("doc_id").as[Long].collect()).sorted.toSeq == oneShot)

    // scale shape: the store side of the cross-candidate join is probed,
    // never shuffled — batch bands broadcast, no sort-merge join anywhere
    val plan = s2.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcasthashjoin"), s"expected broadcast band join:\n$plan")
    assert(!plan.contains("sortmergejoin"), s"store side must not shuffle:\n$plan")
  }

  test("incremental dedup over any batch split ≡ one-shot dedup (seeded property)") {
    import graft.synth.Synth
    def randText(seed: Long, nWords: Int): String =
      (0 until nWords).map { j =>
        val h = Synth.mix2(seed, j.toLong)
        (0 until 3 + (h & 3).toInt).map(s =>
          ('a' + math.floorMod(h >> (5 * s), 26).toInt).toChar).mkString
      }.mkString(" ")
    val cfg = TextPipeline.PipelineConfig()
    for (seed <- 1L to 5L) {
      // 24 docs; ~1/3 are near-copy chains of their predecessor (1-3
      // appended words → jaccard ≈ 0.92-0.97, chains exercise drops of
      // docs whose only match was itself dropped)
      val texts = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      for (i <- 0 until 24) {
        val h = Synth.mix2(seed, i.toLong)
        val t = if (i > 0 && math.floorMod(h, 3) == 0)
          texts(i - 1)._2 + " " + randText(seed * 100 + i, 1 + math.floorMod(h >> 8, 3).toInt)
        else randText(seed * 1000 + i, 40)
        texts += ((i.toLong, t))
      }
      val df = texts.toSeq.toDF("doc_id", "text")
      // one-shot drop rule over the whole corpus, same LSH parameters
      val dropped = TextPipeline.nearDupPairsFromSigs(
          TextPipeline.signatureShingles(df, "doc_id", "text", cfg.numPerms, cfg.k),
          "doc_id", cfg.numPerms, cfg.bands, cfg.threshold)
        .select("idB").distinct().as[Long].collect().toSet
      val oneShot = texts.map(_._1).filterNot(dropped.contains).sorted.toSeq
      // incremental over a seed-dependent 3-way split
      val cut1 = 4 + math.floorMod(Synth.mix(seed), 8).toInt
      val cut2 = cut1 + 4 + math.floorMod(Synth.mix(seed + 7L), 8).toInt
      var store = TextPipeline.signatureShingles(df.limit(0), "doc_id", "text",
        cfg.numPerms, cfg.k).drop("__shSet")
      var ingested = df.limit(0) // the corpus grown batch-by-batch
      val surv = scala.collection.mutable.ArrayBuffer[Long]()
      Seq(texts.take(cut1), texts.slice(cut1, cut2), texts.drop(cut2).toSeq)
        .filter(_.nonEmpty).foreach { batch =>
          val batchDf = batch.toSeq.toDF("doc_id", "text")
          val (s, sigs) = TextPipeline.incrementalDedup(store, ingested,
            batchDf, "doc_id", "text", cfg)
          surv ++= s.select("doc_id").as[Long].collect()
          store = store.unionByName(sigs)
          ingested = ingested.unionByName(batchDf)
        }
      assert(surv.sorted.toSeq == oneShot, s"seed=$seed cuts=($cut1,$cut2)")
    }
  }
}
