package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Token-window chunking (SURVEY.md §2.10: 600-token chunks with 10 %
 * overlap, /root/reference/crawler_manager.py:155-169,
 * crawl_config.py:35-39) — the LLM-prep / training-data chunker, expressed
 * as sequence + transform + posexplode. Pure Catalyst, one pass, no UDTF.
 */
object Chunker {

  /**
   * Explode each document into overlapping word chunks.
   * stride = chunkTokens·(1-overlap); last partial chunk kept iff nonempty.
   * Output adds (chunk_idx, chunk_start, chunk_text, chunk_tokens).
   */
  def chunk(docs: DataFrame, textCol: String, chunkTokens: Int = 600,
            overlap: Double = 0.10): DataFrame = {
    require(overlap >= 0 && overlap < 1, "overlap in [0,1)")
    val stride = math.max((chunkTokens * (1 - overlap)).toInt, 1)
    val ws = split(trim(col(textCol)), "\\s+")
    val n = when(length(trim(col(textCol))) === 0, 0).otherwise(size(ws))
    // start offsets: 0, stride, 2·stride … < n (at least one chunk for nonempty)
    val starts = when(n === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)))
    docs
      .withColumn("__words", ws)
      .withColumn("__n", n)
      .select(col("*"),
        posexplode(transform(starts, s => struct(
          s.as("start"),
          concat_ws(" ", slice(col("__words"), s + 1, lit(chunkTokens))).as("text"),
          least(col("__n") - s, lit(chunkTokens)).as("tokens"))))
          .as(Seq("chunk_idx", "__c")))
      .withColumn("chunk_start", col("__c.start"))
      .withColumn("chunk_text", col("__c.text"))
      .withColumn("chunk_tokens", col("__c.tokens"))
      .drop("__words", "__n", "__c")
  }
}
