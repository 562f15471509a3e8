package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{gf, UrlScoring}

/**
 * Golden-fixture parity with the reference's own pure modules
 * (SURVEY.md §5.1): fixtures under src/test/resources/fixtures/ were
 * produced by EXECUTING /root/reference/url_scorer.py and
 * /root/reference/deduplicator.py (tools/gen_fixtures.py); these tests
 * assert our Catalyst expressions reproduce them exactly.
 */
class ReferenceParitySpec extends SparkTestBase {
  import spark.implicits._

  private def fixture(name: String): DataFrame =
    spark.read.option("multiLine", true)
      .json(getClass.getResource(s"/fixtures/$name").getPath)

  test("url scores and depths match reference url_scorer.py exactly") {
    val fx = fixture("url_scores.json")
    val computed = fx
      .withColumn("ourScore", UrlScoring.urlScore($"url", $"base"))
      .withColumn("ourDepth", UrlScoring.urlDepth($"url", $"base"))
    val bad = computed.filter($"ourScore" =!= $"score" || $"ourDepth" =!= $"depth")
    val badRows = bad.select("url", "base", "score", "ourScore", "depth", "ourDepth")
      .collect()
    assert(badRows.isEmpty, s"mismatches:\n${badRows.mkString("\n")}")
  }

  test("url_score expression ≡ declarative column tree (differential, fixture corpus)") {
    val fx = fixture("url_scores.json")
    val diff = fx
      .withColumn("e", UrlScoring.urlScore($"url", $"base"))
      .withColumn("t", UrlScoring.urlScoreColumnTree($"url", $"base"))
      .filter(!($"e" <=> $"t"))
      .select("url", "base", "e", "t").collect()
    assert(diff.isEmpty, s"expression/tree mismatches:\n${diff.mkString("\n")}")
  }

  test("ranking by score matches reference rank_urls score sequence") {
    val fx = fixture("url_rank.json").collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Double]("score")))
    // the reference relies on Python stable sort for ties; our engine
    // defines a total order (score desc, url asc) — assert the score
    // sequence (which is tie-order independent) is identical
    val ours = fixture("url_rank.json").select("url").distinct()
      .withColumn("s", UrlScoring.urlScore($"url", lit("https://big.example.com/")))
      .orderBy($"s".desc, $"url".asc)
      .select("s").as[Double].collect()
    assert(ours.toSeq == fx.map(_._2).toSeq)
  }

  test("dedup signatures match reference FacilitySignature md5s") {
    val fx = fixture("dedup_signatures.json")
      .select($"idx", $"facility.*", $"phone_hash", $"address_hash", $"name_hash", $"full_hash")
    val computed = fx
      .withColumn("ourPhone", FieldExtract.phoneSig($"phone"))
      .withColumn("ourAddr", FieldExtract.addressSig($"address", $"city", $"zip_code"))
      .withColumn("ourName", FieldExtract.nameSig($"name"))
      .withColumn("ourFull", FieldExtract.fullSig($"phone", $"address", $"city", $"zip_code", $"name"))
    val bad = computed.filter(
      $"ourPhone" =!= $"phone_hash" || $"ourAddr" =!= $"address_hash" ||
      $"ourName" =!= $"name_hash" || $"ourFull" =!= $"full_hash").collect()
    assert(bad.isEmpty, s"signature mismatches:\n${bad.mkString("\n")}")
  }

  test("pairwise similarity matches reference _calculate_similarity") {
    val facs = fixture("dedup_signatures.json")
      .select($"idx", $"facility.*")
    val pairs = fixture("dedup_similarity.json")
    val a = facs.select($"idx".as("i"), lower(coalesce($"address", lit(""))).as("aAddr"),
      FieldExtract.normKey($"name").as("aName"),
      regexp_replace(coalesce($"phone", lit("")), "[^0-9]", "").as("aPhone"),
      substring(coalesce($"zip_code", lit("")), 1, 5).as("aZip"))
    val b = facs.select($"idx".as("j"), lower(coalesce($"address", lit(""))).as("bAddr"),
      FieldExtract.normKey($"name").as("bName"),
      regexp_replace(coalesce($"phone", lit("")), "[^0-9]", "").as("bPhone"),
      substring(coalesce($"zip_code", lit("")), 1, 5).as("bZip"))
    val sim =
      when($"aPhone" =!= "" && $"aPhone" === $"bPhone", 0.4).otherwise(0.0) +
      when($"aAddr" === "" || $"bAddr" === "", 0.0)
        .when($"aAddr" === $"bAddr", 0.3)
        .when(gf.char_overlap_sim($"aAddr", $"bAddr") >= 0.8, 0.3 * 0.7).otherwise(0.0) +
      when($"aName" === "" || $"bName" === "", 0.0)
        .when($"aName" === $"bName", 0.2)
        .when(gf.char_overlap_sim($"aName", $"bName") >= 0.7, 0.2 * 0.5).otherwise(0.0) +
      when($"aZip" =!= "" && $"aZip" === $"bZip", 0.1).otherwise(0.0)
    val joined = pairs.join(a, Seq("i")).join(b, Seq("j"))
      .withColumn("ourSim", sim)
      .filter(abs($"ourSim" - $"sim") > 1e-9)
    val bad = joined.select("i", "j", "sim", "ourSim").collect()
    assert(bad.isEmpty, s"similarity mismatches:\n${bad.mkString("\n")}")
  }

  test("fuzzy dedup: cross-zip phone+addr+name duplicate is caught (phone block)") {
    // score 0.4 (phone) + 0.3 (addr) + 0.2 (name) = 0.9 ≥ 0.85 with
    // DIFFERENT non-null zips — zip-only blocking missed this pair
    val facs = Seq(
      ("u1", "Sunrise Manor", "12 Oak Street", "Springfield", "11111", "(555) 123-4567"),
      ("u2", "Sunrise Manor", "12 Oak Street", "Springfield", "99999", "(555) 123-4567"),
      ("u3", "Other Place", "99 Elm Avenue", "Shelby", "22222", "(555) 987-6543"))
      .toDF("sourceUrl", "name", "address", "city", "zipCode", "phone")
    val survivors = Dedup.fuzzy(facs).select("sourceUrl").as[String].collect().toSet
    assert(survivors == Set("u1", "u3"))
  }

  test("fuzzy dedup: planted 10k-row hot-zip block completes bounded") {
    // 10 000 distinct facilities in ONE zip: unrefined blocking would pair
    // 5·10⁷ candidates in one task; the name-initial refinement splits the
    // block ~27 ways and the per-block cap bounds the worst case.
    val n = 10000
    val facs = spark.range(n.toLong).selectExpr(
      "format_string('u%05d', id) AS sourceUrl",
      // distinct names spread over initials; no dup pair scores ≥ 0.85
      "concat(chr(97 + CAST(id % 26 AS INT)), 'fac', id) AS name",
      "concat(id, ' Main Street') AS address",
      "'Metropolis' AS city",
      "'10001' AS zipCode",
      "format_string('(555) %03d-%04d', CAST(id / 10000 AS INT), CAST(id % 10000 AS INT)) AS phone")
    val t0 = System.nanoTime()
    assert(Dedup.fuzzy(facs, maxBlockSize = 1000).count() == n.toLong)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 120.0, f"hot-zip fuzzy dedup took $sec%.1f s — block guard not effective")
  }

  test("batch dedup pipeline drops every duplicate the reference drops") {
    val facs = fixture("dedup_signatures.json")
      .select($"idx", $"facility.*")
      .withColumn("sourceUrl", format_string("u%02d", $"idx"))
      .withColumnRenamed("zip_code", "zipCode")
    val survivors = Dedup(facs.select("sourceUrl", "name", "address", "city", "zipCode", "phone"))
      .select("sourceUrl").as[String].collect().map(_.drop(1).toInt).toSet
    val expected = fixture("dedup_survivors.json")
      .select(explode($"survivor_idx").as("i")).as[Long].collect().map(_.toInt).toSet
    assert(survivors == expected,
      s"ours=${survivors.toSeq.sorted} reference=${expected.toSeq.sorted}")
  }
}
