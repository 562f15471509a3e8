package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Corporate-chain batch orchestration as data (SURVEY.md §3.3 Spark shape):
 * the reference's CSV loader + filters + statistics + batch slicing
 * (/root/reference/csv_processor.py) become one declarative pipeline; the
 * per-batch sleeps exist only to protect a 4 GB droplet and have no
 * distributed equivalent.
 */
object Chains {

  /** S2: header CSV → chains rows; required-field validation = na.drop
    * (csv_processor.py:71-126). Pipe-separated list fields split. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", false).csv(path)
      .na.drop(Seq("corporation_name", "primary_url"))
      .withColumn("secondary_urls",
        when(col("secondary_urls").isNull, array().cast("array<string>"))
          .otherwise(split(col("secondary_urls"), "\\|")))
      .withColumn("facility_types",
        when(col("facility_types").isNull, array().cast("array<string>"))
          .otherwise(split(col("facility_types"), "\\|")))
      .withColumn("priority", coalesce(col("priority").cast("int"), lit(1)))

  /** S1: seed-URL text file — skip blank/# lines, prepend https:// when
    * schemeless (main.py:118-136). */
  def loadSeeds(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("url"))
      .filter(col("url") =!= "" && !col("url").startsWith("#"))
      .withColumn("url", when(col("url").startsWith("http"), col("url"))
        .otherwise(concat(lit("https://"), col("url"))))

  /** F8/F9/F10: priority ≤ p, facility-type membership, staleness
    * (csv_processor.py:128-142). `asOf` fixes "now" for determinism. */
  def filterChains(chains: DataFrame, maxPriority: Int,
                   facilityType: Option[String], staleDays: Int,
                   asOf: String): DataFrame = {
    val base = chains.filter(col("priority") <= maxPriority)
    val typed = facilityType match {
      case Some(ft) => base.filter(
        exists(col("facility_types"), t => lower(trim(t)) === ft.toLowerCase))
      case None => base
    }
    typed.filter(col("last_updated").isNull ||
      datediff(lit(asOf).cast("date"), to_date(col("last_updated"), "yyyy-MM-dd")) > staleDays)
  }

  /** A2/A3/A4: priority distribution, type distribution, estimated-total
    * sum — one pass each (csv_processor.py:157-190). */
  def priorityDistribution(chains: DataFrame): DataFrame =
    chains.groupBy("priority").agg(count("*").as("cnt")).orderBy("priority")

  def typeDistribution(chains: DataFrame): DataFrame =
    chains.select(explode(col("facility_types")).as("ft"))
      .groupBy(lower(trim(col("ft"))).as("facility_type"))
      .agg(count("*").as("cnt")).orderBy("facility_type")

  def estimatedTotal(chains: DataFrame): DataFrame =
    chains.agg(sum(
      when(regexp_extract(col("estimated_facilities"), "(\\d+)", 1) === "", lit(null))
        .otherwise(regexp_extract(col("estimated_facilities"), "(\\d+)", 1))
        .cast("long")).as("estimated_total"))

  /** W6: deterministic batch slicing (csv_processor.py:144-150).
    * UNPARTITIONED window = single-partition global sort — acceptable
    * ONLY under the reference's input bound of chains <= 10,000 rows
    * (csv_processor.py:68); never apply this to page/frontier-scale
    * tables. PlanGuardSpec flags any new unpartitioned Window. */
  def withBatchId(chains: DataFrame, batchSize: Int): DataFrame = {
    val w = Window.orderBy(col("priority").asc, col("corporation_name").asc)
    chains.withColumn("batch_id",
      floor((row_number().over(w) - 1) / batchSize.toDouble).cast("long"))
  }

  /** J4/K5: consolidate per-chain facility outputs with chain metadata —
    * the reference stamps each facility with its producing chain's
    * metadata keyed by corporation_name (csv_processor.py:496-504).
    * Broadcast hash equi-join (chains ≤ 10 000 rows, csv_processor.py:68);
    * facilities from unknown chains keep null metadata. */
  def consolidate(facilities: DataFrame, chains: DataFrame): DataFrame =
    facilities.join(
      broadcast(chains.select(
        col("corporation_name"),
        col("priority").as("corporation_priority"),
        col("facility_types").as("corporation_facility_types"))),
      Seq("corporation_name"), "left")
      .withColumn("source_corporation", col("corporation_name"))

  /** Attribute facility rows to their producing chain by URL host — a
    * broadcast hash equi-join on host with the reference's url-prefix
    * check (sourceUrl startsWith primary_url) as a cheap post-filter.
    * (A bare startsWith theta-join would plan as BroadcastNestedLoopJoin:
    * O(facilities × chains) predicate evals.) */
  def attribute(facilities: DataFrame, chains: DataFrame): DataFrame = {
    val meta = broadcast(chains.select(
      col("corporation_name"), col("primary_url"),
      graft.functions.gf.url_host(col("primary_url")).as("__chainHost")))
    facilities
      .withColumn("__host", graft.functions.gf.url_host(col("sourceUrl")))
      .join(meta, col("__host") === col("__chainHost"), "left")
      .filter(col("corporation_name").isNull ||
        col("sourceUrl").startsWith(col("primary_url")))
      .drop("__host", "__chainHost", "primary_url")
  }
}
