package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Keyword-frequency facility-type classification (SURVEY.md A5,
 * /root/reference/extractors.py:363-381): per type, 3·exact + partial
 * keyword matches over the page text; argmax per page. Expressed as a
 * keyword-table explode + hash aggregate + window argmax — fully
 * distributed, no per-row dictionary loops.
 */
object Classify {

  /** facility-type keyword table (reference FACILITY_TYPE_KEYWORDS shape). */
  val typeKeywords: Seq[(String, Seq[String])] = Seq(
    "skilled nursing" -> Seq("skilled nursing", "nursing home", "snf", "rehabilitation"),
    "assisted living" -> Seq("assisted living", "personal care", "residential care"),
    "memory care" -> Seq("memory care", "alzheimer", "dementia"),
    "independent living" -> Seq("independent living", "retirement community", "senior apartments"),
    "hospice" -> Seq("hospice", "palliative", "end of life"))

  /**
   * Classify pages: input (keyCol, textCol); output adds best_type +
   * type_score. Exact phrase hit = 3 points, first-word partial hit = 1.
   */
  def classify(pages: DataFrame, keyCol: String, textCol: String): DataFrame =
    classifyWith(pages, keyCol, textCol, typeKeywords)

  /** Same, with a caller-supplied type→keywords table. */
  def classifyWith(pages: DataFrame, keyCol: String, textCol: String,
                   keywords: Seq[(String, Seq[String])]): DataFrame = {
    val kw = keywords.flatMap { case (t, kws) => kws.map(k => (t, k)) }
    val kwDf = pages.sparkSession.createDataFrame(kw).toDF("ftype", "kw")
    val textLc = lower(col(textCol))
    val scored = pages.select(col(keyCol), textLc.as("__t"))
      .crossJoin(broadcast(kwDf))
      .withColumn("pts",
        when(col("__t").contains(col("kw")), 3)
          .when(col("__t").contains(split(col("kw"), " ").getItem(0)), 1)
          .otherwise(0))
      .groupBy(col(keyCol), col("ftype"))
      .agg(sum("pts").as("type_score"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("type_score").desc, col("ftype").asc)
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("type_score") > 0)
      .select(col(keyCol), col("ftype").as("best_type"), col("type_score"))
    pages.join(best, Seq(keyCol), "left")
  }

  /** A10: weighted field-completeness score per facility
    * (/root/reference/hybrid_extractor.py:508-524): required fields
    * (name, address|city, phone) weight 0.7, optional 0.3. */
  def completenessScore(name: Column, address: Column, city: Column,
                        phone: Column, email: Column, beds: Column,
                        services: Column): Column = {
    val req = (when(name.isNotNull && length(trim(name)) > 0, 1).otherwise(0) +
      when(coalesce(address, city).isNotNull, 1).otherwise(0) +
      when(phone.isNotNull, 1).otherwise(0)).cast("double") / 3.0
    val opt = (when(email.isNotNull, 1).otherwise(0) +
      when(beds.isNotNull, 1).otherwise(0) +
      when(services.isNotNull && size(services) > 0, 1).otherwise(0)).cast("double") / 3.0
    round(req * 0.7 + opt * 0.3, 4)
  }
}
