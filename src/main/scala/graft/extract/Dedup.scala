package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.gf

/**
 * Facility deduplication (SURVEY.md J2/J3) — the reference's streaming
 * dedup (/root/reference/deduplicator.py:86-164) re-expressed as set
 * semantics: exact signature dedup is a grouped argmin (not an in-heap
 * seen-set), fuzzy dedup is a *blocked* theta-join (equi-join on a block
 * key, similarity predicate as a column expression) instead of the
 * reference's last-100 ring buffer — exact where the reference was a
 * memory-bound approximation (SURVEY.md W5 note).
 */
object Dedup {

  private[extract] val observeId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Add the reference's signature columns (deduplicator.py:15-52). */
  def withSignatures(facilities: DataFrame): DataFrame =
    facilities
      .withColumn("phoneSig", FieldExtract.phoneSig(col("phone")))
      .withColumn("addressSig", FieldExtract.addressSig(col("address"), col("city"), col("zipCode")))
      .withColumn("fullSig", FieldExtract.fullSig(col("phone"), col("address"),
        col("city"), col("zipCode"), col("name")))

  /**
   * Exact dedup: a facility is a duplicate if its fullSig OR its
   * (phoneSig+addressSig) pair was already emitted (deduplicator.py:86-122).
   * Survivor = deterministic min(sourceUrl) per key. Two grouped argmins,
   * no driver state.
   */
  def exact(facilities: DataFrame): DataFrame = {
    val sigs = withSignatures(facilities)
    val byFull = Window.partitionBy(col("fullSig")).orderBy(col("sourceUrl").asc)
    val pa = when(col("phoneSig") =!= "" && col("addressSig") =!= "",
      concat(col("phoneSig"), lit("|"), col("addressSig"))).otherwise(col("fullSig"))
    val byPhoneAddr = Window.partitionBy(pa).orderBy(col("sourceUrl").asc)
    sigs
      .withColumn("rFull", row_number().over(byFull))
      .withColumn("rPA", row_number().over(byPhoneAddr))
      .filter(col("rFull") === 1 && col("rPA") === 1)
      .drop("rFull", "rPA")
  }

  /**
   * Fuzzy dedup (deduplicator.py:124-164): weighted similarity
   * phone(0.4) + address(0.3) + name(0.2) + zip(0.1) ≥ threshold → dup.
   * Sub-scores: exact phone digits match, char-overlap on address/name
   * (deduplicator.py:166-182), exact zip match.
   *
   * Scaled as a blocked theta-join — candidate pairs only within a block;
   * the full O(n²) cross-join never materializes. Blocking is a UNION of
   * two key projections, with recall derived from the score table
   * (per-component maxima: phone exact 0.4; addr 0.3 / fuzzy 0.21;
   * name 0.2 / fuzzy 0.1; zip 0.1):
   *   - `p:` exact phone digits. Without a shared phone the maximum
   *     score is 0.3+0.2+0.1 = 0.6, so EVERY pair above 0.6 shares this
   *     key — complete candidate recall for threshold > 0.6 (fixes the
   *     cross-zip phone-match miss of zip-only blocking).
   *   - `z:` zip5 + first char of normalized name (zip null → name
   *     prefix-4). The name-initial refinement bounds hot-zip blocks
   *     (a dense metro zip at national scale is 10⁴⁺ rows → 10⁸⁺ pairs
   *     in one task unrefined); pairs it separates score ≤ 0.5.
   *   For threshold ≤ 0.6 recall is bounded by these keys (documented
   *   deviation; the reference's own ring-buffer window was far lossier).
   *
   * Skew guard: blocks are deterministically truncated to `maxBlockSize`
   * rows (min sourceUrl kept); the dropped-row count is published as the
   * `fuzzy_dedup_blocks.truncated_rows` observed metric.
   */
  def fuzzy(facilities: DataFrame, threshold: Double = 0.85,
            maxBlockSize: Int = 4096): DataFrame = {
    val base = facilities
      .withColumn("nameNorm", FieldExtract.normKey(col("name")))       // lower + strip punct (deduplicator.py:152)
      .withColumn("addrNorm", lower(coalesce(col("address"), lit("")))) // lower only (deduplicator.py:141)
      .withColumn("digits", regexp_replace(coalesce(col("phone"), lit("")), "[^0-9]", ""))

    val zKey = concat(lit("z:"), coalesce(
      when(col("zipCode").isNotNull,
        concat(substring(col("zipCode"), 1, 5), lit("|"), substring(col("nameNorm"), 1, 1))),
      substring(col("nameNorm"), 1, 4)))
    val pKey = concat(lit("p:"), col("digits"))

    def keyedAs(key: Column, df: DataFrame) = df.select(key.as("block"),
      col("sourceUrl"), col("nameNorm"), col("addrNorm"), col("digits"), col("zipCode"))
    val keyed0 = keyedAs(zKey, base)
      .unionByName(keyedAs(pKey, base.filter(col("digits") =!= "")))

    // deterministic per-block cap; truncation surfaced as a metric
    // (unique observe name per call — duplicates in one query throw)
    val w = Window.partitionBy("block").orderBy(col("sourceUrl").asc)
    val keyed = keyed0
      .withColumn("__rn", row_number().over(w))
      .observe(s"fuzzy_dedup_blocks_${Dedup.observeId.incrementAndGet()}",
        sum(when(col("__rn") > maxBlockSize, 1L).otherwise(0L)).as("truncated_rows"))
      .filter(col("__rn") <= maxBlockSize).drop("__rn")

    val a = keyed.select(col("block"), col("sourceUrl").as("aUrl"),
      col("nameNorm").as("aName"), col("addrNorm").as("aAddr"),
      col("digits").as("aPhone"), col("zipCode").as("aZip"))
    val b = keyed.select(col("block"), col("sourceUrl").as("bUrl"),
      col("nameNorm").as("bName"), col("addrNorm").as("bAddr"),
      col("digits").as("bPhone"), col("zipCode").as("bZip"))

    // deduplicator.py:128-163: exact field match scores full weight; fuzzy
    // char-overlap ≥ 0.8 (addr) / ≥ 0.7 (name) scores weight·0.7 / weight·0.5
    val phoneScore = when(col("aPhone") =!= "" && col("aPhone") === col("bPhone"), 0.4).otherwise(0.0)
    val addrScore = when(col("aAddr") === "" || col("bAddr") === "", 0.0)
      .when(col("aAddr") === col("bAddr"), 0.3)
      .when(gf.char_overlap_sim(col("aAddr"), col("bAddr")) >= 0.8, 0.3 * 0.7)
      .otherwise(0.0)
    val nameScore = when(col("aName") === "" || col("bName") === "", 0.0)
      .when(col("aName") === col("bName"), 0.2)
      .when(gf.char_overlap_sim(col("aName"), col("bName")) >= 0.7, 0.2 * 0.5)
      .otherwise(0.0)
    val zip5 = (c: Column) => substring(coalesce(c, lit("")), 1, 5)
    val zipScore = when(zip5(col("aZip")) =!= "" && zip5(col("aZip")) === zip5(col("bZip")), 0.1)
      .otherwise(0.0)

    // aUrl < bUrl: each unordered pair once; b is the candidate duplicate
    val dups = a.join(b, Seq("block"))
      .filter(col("aUrl") < col("bUrl"))
      .filter(phoneScore + addrScore + nameScore + zipScore >= threshold)
      .select(col("bUrl").as("sourceUrl")).distinct()

    facilities.join(dups, Seq("sourceUrl"), "left_anti")
  }

  /** Full pipeline: exact signatures first, then fuzzy within blocks. */
  def apply(facilities: DataFrame, threshold: Double = 0.85): DataFrame =
    fuzzy(exact(facilities).drop("phoneSig", "addressSig", "fullSig"), threshold)
}
