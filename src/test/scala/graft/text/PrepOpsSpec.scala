package graft.text

import graft.SparkTestBase
import graft.ann.SemDedup
import org.apache.spark.sql.functions._

/**
 * Training-data-prep operators added round 2: Gopher repetition filters,
 * PII detect/redact, benchmark decontamination, SemDeDup. Hand-computed
 * expectations on planted corpora (the driver gate cross-checks the same
 * ops against DuckDB / a pinned fixture at sf0.01).
 */
class PrepOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------- Repetition (Gopher §A1.1) ----------

  test("repetition: hand-computed top2/dup5 char fractions") {
    val docs = Seq(
      (1L, "a b a b a b"), // top 2-gram "a b" x3 of 5 grams; 6 word chars
      (2L, "one two three four five one two three four five"),
      (3L, "all unique words here now truly and forever more ok extra pad words again differ"),
      (4L, ""), // no words at all
      (5L, "single")).toDF("doc_id", "text")
    val m = Repetition.metrics(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "top2_char_frac", "dup5_char_frac", "repetitive")
      .as[(Long, Double, Double, Boolean)].collect()
    // doc 1: "a b" cnt=3, gramChars=2 → 6/6 = 1.0; no duplicate 5-gram
    assert(m(0) == ((1L, 1.0, 0.0, true)))
    // doc 2: four 2-grams tie at cnt=2; the (cnt, gramChars, gram)
    // tie-break picks "three four" (9 chars) → 2*9/38 = 0.4737;
    // dup 5-gram "one two three four five" once extra → 19/38 = 0.5
    assert(m(1) == ((2L, 0.4737, 0.5, true)))
    // doc 3: every gram unique → top2 = one occurrence
    assert(m(2)._3 == 0.0 && !m(2)._4)
    assert(m(3) == ((4L, 0.0, 0.0, false)))
    assert(m(4) == ((5L, 0.0, 0.0, false)))
    val kept = Repetition.filterRepetitive(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L, 5L))
  }

  test("repetition kernel == column-pipeline specification (differential)") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "bb", "ccc", "dd", "e", "ffff", "zz", "déjà", "Αθήνα", "x9y")
    val texts = (0 until 50).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", ", ", "  ", "\n")(rnd.nextInt(4)))
    } ++ Seq("", "one", "a b a b a b", "ONLY-punct!!! ???", "word " * 200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for ((tn, dn) <- Seq((2, 5), (3, 4), (1, 2))) {
      val fast = Repetition.metrics(df, "doc_id", "text", tn, dn)
        .orderBy("doc_id").collect().toSeq
      val spec = Repetition.metricsCols(df, "doc_id", "text", tn, dn)
        .orderBy("doc_id").collect().toSeq
      assert(fast == spec, s"topN=$tn dupN=$dn")
    }
  }

  // ---------- PII ----------

  test("pii: counts, byte-exact redaction, pattern disjointness") {
    val t = "mail a@b.co or x.y_z%2+w@sub.domain.org call 555-123-4567 " +
      "ssn 123-45-6789 ip 10.0.0.1 end"
    val row = Seq(t).toDF("text").select(
      Pii.count($"text", "email").as("e"), Pii.count($"text", "ssn").as("s"),
      Pii.count($"text", "phone").as("p"), Pii.count($"text", "ip").as("i"),
      Pii.redact($"text").as("r"), Pii.hasPii($"text").as("h"))
      .as[(Long, Long, Long, Long, String, Boolean)].head()
    assert(row._1 == 2 && row._2 == 1 && row._3 == 1 && row._4 == 1 && row._6)
    assert(row._5 == "mail <EMAIL> or <EMAIL> call <PHONE> ssn <SSN> ip <IP> end")
  }

  test("pii: no false positives on clean text and digit runs") {
    val rows = Seq(
      "just words no identifiers at all",
      "order 1234-567-8901 is not a phone (boundary check)",
      "version 1.2.3 is not an ip").toDF("text")
      .select(Pii.hasPii($"text")).as[Boolean].collect()
    assert(rows.forall(_ == false))
    // ssn is redacted before phone can see its digits; 3-2-4 never
    // matches the 3-3-4 phone pattern
    val ssnOnly = Seq("123-45-6789").toDF("text")
      .select(Pii.count($"text", "phone"), Pii.redact($"text"))
      .as[(Long, String)].head()
    assert(ssnOnly._1 == 0 && ssnOnly._2 == "<SSN>")
  }

  // ---------- Decontamination ----------

  test("decontaminate: distinct shared n-grams; clean() drops hits only") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a tale of the quick brown fox and the quick brown cat"), // 2 distinct shared 3-grams
      (2L, "the quick brown the quick brown"), // repeated shared gram counts once... plus wrap grams
      (3L, "totally unrelated text with zero overlap whatsoever")).toDF("doc_id", "text")
    val hits = Decontaminate.contaminated(train, "doc_id", "text", bench, "text", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // doc 1 shares "the quick brown" + "quick brown fox"; doc 2 shares
    // "the quick brown" (once, distinct) — its other 3-grams ("quick
    // brown the", "brown the quick") are not benchmark grams
    assert(hits == Seq((1L, 2L), (2L, 1L)))
    val kept = Decontaminate.clean(train, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(3L))
  }

  test("decontaminate: docs shorter than n grams never match") {
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val train = Seq((2L, "a b"), (3L, "")).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(train, "doc_id", "text", bench, "text", 3).count() == 0)
    assert(Decontaminate.clean(train, "doc_id", "text", bench, "text", 3).count() == 2)
  }

  // ---------- SemDeDup ----------

  test("semdedup: planted dups dropped, survivors partition the corpus, deterministic") {
    val base = (0L until 120L).map { i =>
      (i, Array.tabulate(16)(d => (graft.synth.Synth.mix2(i, d.toLong) % 1000).toFloat / 1000f))
    }
    val withDups = (base ++ base.map { case (i, v) => (i + 1000L, v) }) // exact copies
      .toDF("vec_id", "embedding")
    val dropped = SemDedup.dropped(withDups, "vec_id", "embedding", k = 8, tau = 0.999)
    val droppedIds = dropped.select("id").as[Long].collect().toSet
    // every exact copy has its original (same cluster: identical vector)
    assert((1000L until 1120L).forall(droppedIds.contains))
    val pairs = dropped.filter($"id" >= 1000L)
      .select("id", "dup_of", "max_cos").as[(Long, Long, Double)].collect()
    assert(pairs.forall { case (id, dupOf, c) => dupOf == id - 1000L && c > 0.9999 })
    val survivors = SemDedup.survivors(withDups, "vec_id", "embedding", k = 8, tau = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.intersect(droppedIds).isEmpty)
    assert(survivors.size + droppedIds.size == 240)
    // determinism across partitionings (the repo's never-arbitrary-row rule)
    val dropped2 = SemDedup.dropped(withDups.repartition(7), "vec_id", "embedding",
      k = 8, tau = 0.999).select("id").as[Long].collect().toSet
    assert(dropped2 == droppedIds)
  }

  // ---------- Line-level boilerplate dedup ----------

  test("line dedup: frequent lines removed, order kept, within-doc dups counted per occurrence") {
    val docs = Seq(
      (1L, "alpha\n  menu  \nbody one\nmenu"), // trim matches "menu"; 2 occurrences
      (2L, "menu\nbody two"),
      (3L, "menu\nbody three\nbody three"), // non-bp within-doc dup is KEPT twice
      (4L, "standalone")).toDF("doc_id", "text")
    val freq = LineDedup.frequentLines(docs, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(freq == Map("menu" -> 3L)) // per-doc distinct: doc 1 counts once
    val c = LineDedup.clean(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(c(0) == ((1L, 4L, 2L, "alpha\nbody one")))
    assert(c(1) == ((2L, 2L, 1L, "body two")))
    assert(c(2) == ((3L, 3L, 1L, "body three\nbody three")))
    assert(c(3) == ((4L, 1L, 0L, "standalone")))
  }

  test("line dedup: all-boilerplate and empty docs survive with empty clean text") {
    val docs = Seq((1L, "menu"), (2L, "menu"), (3L, "menu"), (4L, ""), (5L, "  \n \n"))
      .toDF("doc_id", "text")
    val c = LineDedup.clean(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(c.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L)) // every doc kept
    assert(c.take(3).forall(r => r._2 == 1 && r._3 == 1 && r._4 == ""))
    assert(c(3) == ((4L, 0L, 0L, "")) && c(4) == ((5L, 0L, 0L, "")))
  }

  test("decontaminate bloom variant: ⊇ exact, == exact without collisions") {
    val bench = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val train = (0L until 200L).map { i =>
      val extra = if (i % 9 == 0) " the quick brown" else ""
      (i, s"doc w${i}a w${i}b body text goes here$extra")
    }.toDF("doc_id", "text")
    val exact = Decontaminate.contaminated(train, "doc_id", "text", bench, "text", 3)
      .as[(Long, Long)].collect().toMap
    val bloom = Decontaminate.contaminatedBloom(train, "doc_id", "text", bench, "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(exact.keySet.subsetOf(bloom.keySet)) // never a miss
    assert(exact.forall { case (id, h) => bloom(id) >= h }) // upper bound
    // at 4 bench grams / 1% fpp the planted corpus is collision-free
    assert(bloom == exact)
    assert(exact.keySet == (0L until 200L).filter(_ % 9 == 0).toSet)
  }

  test("weighted mix: per-source rates honored, subset-stable, rate 0/1 exact") {
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val mixed = Sampling.weightedMix(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
    val byS = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(byS("src0") == 1000L)            // rate 1.0 keeps everything
    assert(!byS.contains("src2"))           // rate 0.0 keeps nothing
    assert(math.abs(byS("src1") - 500L) < 80)
    // verdicts are per-id pure: a subset corpus keeps exactly the same ids
    val sub = Sampling.weightedMix(docs.filter($"doc_id" < 1500), "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
      .select("doc_id").as[Long].collect().toSet
    val full = mixed.select("doc_id").as[Long].collect().toSet
    assert(sub == full.filter(_ < 1500))
    // unknown source falls to defaultRate
    assert(Sampling.weightedMix(docs, "doc_id", "source", Map.empty, defaultRate = 1.0)
      .count() == 3000L)
  }

  // ---------- Corpus term weighting ----------

  test("tfidf: hand-computed smoothed scores, rounded-score tie-break") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "cherry cherry cherry")).toDF("doc_id", "text")
    val r = Tfidf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "tf", "df", "score", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    // N=3; idf(apple)=ln(4/2)+1, idf(banana)=idf(cherry)=ln(4/3)+1
    assert(r == Seq(
      (1L, "apple", 2L, 1L, 3.3863, 1), (1L, "banana", 1L, 2L, 1.2877, 2),
      (2L, "banana", 1L, 2L, 1.2877, 1), (2L, "cherry", 1L, 2L, 1.2877, 2), // tie → term asc
      (3L, "cherry", 3L, 2L, 3.863, 1)))
  }

  test("unigram nll: corpus-derived probabilities, wordless doc scores 0") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "cherry cherry cherry"), (4L, "!!!")).toDF("doc_id", "text")
    val r = UnigramLm.score(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // 8 tokens: p(apple)=p(banana)=.25, p(cherry)=.5
    assert(r == Seq((1L, 3L, 1.3863), (2L, 2L, 1.0397), (3L, 3L, 0.6931), (4L, 0L, 0.0)))
  }

  // ---------- Composed prep stack ----------

  test("prep stack: every stage drops exactly its planted victim") {
    def u(i: Int) = s"zz${('a' + i / 10).toChar}${('a' + i % 10).toChar}"
    // 20 distinct words: long enough that one 2-gram occurrence stays
    // under the 0.20 Gopher threshold (max 10 chars / 82 word chars)
    def base(i: Int) = s"the quick ${u(i)} fox and some other valid words " +
      "here more text goes on just fine today again still done"
    val docs = (0 until 60).map { i =>
      val t = i match {
        case 50 => "the fox the fox the fox the fox the fox the fox" // repetition gate
        case 51 => base(1) // exact dup of doc 1 AFTER line-cleaning (1 has the footer)
        case 52 => base(2) + " extraword" // near-dup of doc 2: 5-shingle j = 16/17
        case _ => base(i) +
          (if (i == 5) " reach me@x.org" else "") + // pii stage
          (if (i <= 39) "\nshared footer line" else "") // boilerplate, df = 40
      }
      (i.toLong, t)
    }.toDF("doc_id", "text")
    // bench gram "the quick zzad fox and" exists ONLY in doc 3 (the
    // common base tail would contaminate everything)
    val bench = Seq((0L, s"the quick ${u(3)} fox and")).toDF("doc_id", "text")
    val r = PrepStack.report(docs, "doc_id", "text", bench, "text",
        PrepStack.StackConfig(minDocsLine = 30, decontamN = 5))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // (n_input, n_pii_docs, n_boiler_removed, n_gate_survivors, n_exact,
    //  n_neardup_pairs, n_contaminated, n_survivors, n_tokens)
    assert(r == ((60L, 1L, 40L, 59L, 58L, 1L, 1L, 56L, 55L * 20 + 22)))
  }

  // ---------- Sequence packing ----------

  test("packing: concat-and-chunk offsets, budget boundaries, oversized docs") {
    // one group, budget 10; docs of 4, 4, 4, 25, 2 tokens in id order
    val docs = Seq(
      (1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"),
      (4L, (1 to 25).map(i => s"w$i").mkString(" ")), (5L, "x y"))
      .toDF("doc_id", "text")
    val p = Packing.pack(docs, "doc_id", "text", budget = 10, numGroups = 1,
        groupExpr = Some(lit(0)))
      .orderBy("doc_id")
      .select("doc_id", "tokens", "seq_no", "offset")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // before: 0, 4, 8, 12, 37 → seq floor(b/10): 0, 0, 0, 1, 3
    assert(p == Seq((1L, 4, 0L, 0L), (2L, 4, 0L, 4L), (3L, 4, 0L, 8L),
      (4L, 25, 1L, 2L), (5L, 2, 3L, 7L)))
    // empty doc consumes nothing and never shifts later offsets
    val withEmpty = (Seq((0L, "")) ++ Seq((1L, "a b c d"), (2L, "e f g h")))
      .toDF("doc_id", "text")
    val p2 = Packing.pack(withEmpty, "doc_id", "text", 10, 1, Some(lit(0)))
      .orderBy("doc_id").select("doc_id", "offset").as[(Long, Long)].collect()
    assert(p2.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 4L)))
  }

  test("packing: groups pack independently and union to the whole corpus") {
    val docs = (0L until 200L).map(i => (i, ("tok " * ((i % 7).toInt + 1)).trim))
      .toDF("doc_id", "text")
    val p = Packing.pack(docs, "doc_id", "text", budget = 16, numGroups = 4)
    assert(p.count() == 200)
    // per-group offsets are a valid concat stream: offset of each doc ==
    // (sum of tokens of lower-id docs in the group) mod accounting
    val perGroup = p.orderBy("pack_group", "doc_id")
      .select("pack_group", "tokens", "seq_no", "offset")
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1)
    perGroup.values.foreach { rows =>
      var before = 0L
      rows.foreach { case (_, tok, seqNo, off) =>
        assert(seqNo == before / 16 && off == before % 16)
        before += tok
      }
    }
    val stats = Packing.sequenceStats(docs, "doc_id", "text", 16, 4)
    assert(stats.agg(sum("n_docs_starting")).as[Long].head() == 200L)
  }

  // ---------- Sampling ----------

  test("quota sample: exact per-group caps, stable under appends and partitioning") {
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val s10 = Sampling.quotaSample(docs, "doc_id", "source", 10)
    val byGroup = s10.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(byGroup == Map("src0" -> 10L, "src1" -> 10L, "src2" -> 10L))
    // small group: all rows kept
    val tiny = Sampling.quotaSample(docs.filter($"doc_id" < 5), "doc_id", "source", 10)
    assert(tiny.count() == 5)
    // appending new docs never evicts differently across partitionings —
    // determinism of the md5 rank (bigger corpus CAN displace old picks;
    // the guarantee is determinism, not monotonicity)
    val a = s10.select("doc_id").as[Long].collect().toSet
    val b = Sampling.quotaSample(docs.repartition(13), "doc_id", "source", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("hash split: stable per-id assignment, fractions roughly honored") {
    val docs = (0L until 2000L).map(i => (i, "t")).toDF("doc_id", "text")
    val s = Sampling.hashSplit(docs, "doc_id", 0.8, 0.1)
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 1600L) < 100)
    assert(math.abs(counts("val") - 200L) < 60)
    assert(math.abs(counts("test") - 200L) < 60)
    // a doc's split is a pure function of its id: subset ⇒ same labels
    val sub = Sampling.hashSplit(docs.filter($"doc_id" % 5 === 0), "doc_id", 0.8, 0.1)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = s.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, sp) => full(id) == sp })
  }

  test("shuffle shard: a partition-independent permutation in md5 order, pos contiguous") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = (1L to 500L).toDF("doc_id")
    val a = Sampling.shuffleShard(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)]
      .collect().sortBy(_._1).toSeq
    val b = Sampling.shuffleShard(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Int)]
      .collect().sortBy(_._1).toSeq
    assert(a == b) // partitioning-independent
    assert(a.map(_._1).distinct.size == 500) // a permutation
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    a.groupBy(_._2).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (1 to rows.size), "pos is 1..n per shard")
      val byKey = rows.map(_._1).sortBy(id => (md5hex(id.toString), id))
      assert(byKey.toSeq == byPos.map(_._1).toSeq, "pos order == (md5, id) order")
    }
  }

  test("source quality gate: whole sources dropped on rounded mean, stats carried") {
    // src0 mean = 0.5, src1 mean = 0.9 → gate at 0.7 drops ALL of src0
    val docs = (0L until 40L).map { i =>
      val src = s"src${i % 2}"
      (i, src, if (i % 2 == 0) 0.5 else 0.9)
    }.toDF("doc_id", "source", "q")
    val kept = Sampling.sourceQualityGate(docs, "source",
      round(avg($"q"), 4), minMean = 0.7)
    assert(kept.select("source").distinct().as[String].collect().toSeq == Seq("src1"))
    assert(kept.count() == 20)
    val row = kept.select("src_mean_q", "src_docs").distinct()
      .as[(Double, Long)].head()
    assert(row == ((0.9, 20L)))
    // threshold above every mean → empty; below every mean → everything
    assert(Sampling.sourceQualityGate(docs, "source",
      round(avg($"q"), 4), 0.95).count() == 0)
    assert(Sampling.sourceQualityGate(docs, "source",
      round(avg($"q"), 4), 0.1).count() == 40)
  }

  test("token budget sample: per-stratum budget is the greedy md5-rank prefix") {
    val docs = (0L until 60L).map(i => (i, s"lang${i % 2}", 10L + i % 3))
      .toDF("doc_id", "lang", "tokens")
    val budget = 100L
    val kept = Sampling.tokenBudgetSample(docs, "doc_id", "lang", "tokens", budget)
      .select("doc_id", "lang", "tokens", "tokens_before")
      .as[(Long, String, Long, Long)].collect()
    // budget respected per stratum
    val perLang = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perLang.values.forall(_ <= budget), s"budget exceeded: $perLang")
    // kept set == locally computed greedy prefix in (md5(id), id) order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // strict prefix semantics: the running total counts EVERY ranked row
    // (a too-big doc ends the stratum's intake; nothing later sneaks in)
    val local = (0L until 60L).map(i => (i, s"lang${i % 2}", 10L + i % 3))
      .groupBy(_._2).flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(r => (md5hex(r._1.toString), r._1)).flatMap { r =>
          cum += r._3
          if (cum <= budget) Some(r._1) else None
        }
      }.toSet
    assert(kept.map(_._1).toSet == local)
    // tokens_before is consistent: before + tokens ≤ budget on every row
    assert(kept.forall(r => r._4 + r._3 <= budget))
  }

  test("span scrub: overlapping spans merge, boundaries exact, short docs untouched") {
    // docs 1 and 2 share the 4-gram "aa bb cc dd" at different offsets;
    // doc 1 also shares "cc dd ee ff" with doc 3 → overlapping spans in
    // doc 1 merge into one cover [1..6]; doc 4 is unrelated; doc 5 is
    // shorter than k (no grams, untouched even though it repeats words)
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg"),
      (2L, "xx aa bb cc dd yy"),
      (3L, "cc dd ee ff zz"),
      (4L, "pp qq rr ss tt uu"),
      (5L, "aa bb cc")
    ).toDF("doc_id", "text")
    val out = SpanScrub.scrub(docs, "doc_id", "text", k = 4, minDf = 2)
      .select("doc_id", "n_words", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 7L, 6L, "gg"),             // spans [1..4] ∪ [3..6] merge → keep pos 7
      (2L, 6L, 4L, "xx yy"),          // span [2..5]
      (3L, 5L, 4L, "zz"),             // span [1..4]
      (4L, 6L, 0L, "pp qq rr ss tt uu"),
      (5L, 3L, 0L, "aa bb cc")))      // < k words: no grams, never scrubbed
    // positional grams carry multiplicity and 1-based starts
    val g = SpanScrub.positionalGrams(docs.filter($"doc_id" === 1L),
      "doc_id", "text", 4).select("pos", "gram").as[(Int, String)].collect().toSeq
    assert(g.head == ((1, "aa bb cc dd")) && g.length == 4)
  }

  test("semdedup: cluster cap bounds the quadratic block deterministically") {
    val vecs = (0L until 50L).map(i => (i, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding") // all identical → ONE cluster
    val cents = graft.ann.Similarity.ivfCentroids(vecs, "vec_id", "embedding", 2, iters = 1)
    val assigned = graft.ann.Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
    val dropped = SemDedup.droppedPairs(assigned, "vec_id", "embedding",
      tau = 0.99, maxClusterSize = 10)
    // min-id rows survive the cap: ids 1..9 dropped against 0; 10+ truncated
    assert(dropped.select("id").as[Long].collect().toSet == (1L until 10L).toSet)
  }

  test("temperature mixture: alpha flattens the mixture, rates derived and capped") {
    // skewed corpus: src a = 160 docs, src b = 40 docs
    val docs = (0L until 200L).map(i => (i, if (i < 160) "a" else "b"))
      .toDF("doc_id", "src")
    // alpha = 0.5: w_a = sqrt(160), w_b = sqrt(40) -> p_a ~ 0.6667
    // budget 100: rate_a = 100*.6667/160 = .416667, rate_b = 100*.3333/40 = .833333
    val out = Sampling.temperatureMixture(docs, "doc_id", "src",
      alpha = 0.5, budget = 100L)
    val rates = out.select("src", "rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("a") == 0.416667 && rates("b") == 0.833333)
    // alpha = 1 is proportional sampling: every source gets budget/N
    val prop = Sampling.temperatureMixture(docs, "doc_id", "src",
        alpha = 1.0, budget = 100L)
      .select("src", "rate").distinct().as[(String, Double)].collect().toMap
    assert(prop("a") == 0.5 && prop("b") == 0.5)
    // alpha = 0 is uniform across sources: rate_s = (budget/2)/n_s, capped at 1
    val uni = Sampling.temperatureMixture(docs, "doc_id", "src",
        alpha = 0.0, budget = 100L)
      .select("src", "rate").distinct().as[(String, Double)].collect().toMap
    assert(uni("a") == 0.3125 && uni("b") == 1.0)
    // acceptance is the shared md5 filter: kept set == weightedMix at the same rates
    val viaMix = Sampling.weightedMix(docs, "doc_id", "src",
        Map("a" -> 0.416667, "b" -> 0.833333))
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == viaMix)
  }

  test("length buckets: pow-2 caps, truncation, padding economics") {
    val docs = Seq(
      (1L, "w"),                                  // 1 token  -> cap 1
      (2L, "a b c"),                              // 3 tokens -> cap 4
      (3L, "a b c d"),                            // 4 tokens -> cap 4
      (4L, "a b c d e"),                          // 5 tokens -> cap 8
      (5L, Seq.fill(40)("x").mkString(" ")),      // 40 -> cap 64 (maxLen)
      (6L, Seq.fill(100)("x").mkString(" "))      // 100 -> truncated to 64
    ).toDF("doc_id", "text")
    val got = Packing.lengthBucketStats(docs, "doc_id", "text", maxLen = 64)
      .select("bucket_cap", "n_docs", "sum_tokens", "sum_pad",
        "n_truncated", "tokens_truncated", "pad_frac")
      .as[(Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 1L, 0L, 0L, 0L, 0.0)))
    assert(got(4L) == ((4L, 2L, 7L, 1L, 0L, 0L, 0.125)))
    assert(got(8L) == ((8L, 1L, 5L, 3L, 0L, 0L, 0.375)))
    // cap 64 holds the 40-token doc (pad 24) and the truncated 100-token doc
    assert(got(64L) == ((64L, 2L, 104L, 24L, 1L, 36L, 0.1875)))
    assert(got.size == 4)
  }

  test("overlap fraction: graded contamination, consistent with the binary rule") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta"),      // all 2 grams shared -> 1.0
      (2L, "alpha beta gamma zz alpha"),   // 3 grams, only "alpha beta gamma" hits
      (3L, "xx yy zz ww"),                 // no overlap -> 0.0
      (4L, "xx")                           // < n words: absent from output
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlapFraction(train, "doc_id", "text",
        bench, "text", n = 3)
      .select("doc_id", "n_grams", "n_hits", "overlap_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 3L, 1L, 0.333333)))
    assert(got(3L) == ((3L, 2L, 0L, 0.0)))
    assert(!got.contains(4L) && got.size == 3)
    // any-overlap ids == ids with overlap_frac > 0 (binary rule consistency)
    val binary = Decontaminate.contaminated(train, "doc_id", "text",
      bench, "text", n = 3).select("doc_id").as[Long].collect().toSet
    assert(binary == got.filter(_._2._4 > 0).keySet)
  }
}
