package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.text.TextPipeline

/**
 * Streaming incremental MinHash-LSH near-dup dedup: a `foreachBatch`
 * wrapper over [[TextPipeline.incrementalDedup]] with the SLIM signature
 * store (and the ingested-corpus pointer it rehydrates verify sets from)
 * as the carried state — the same pattern as [[StreamingCrawl]]'s
 * incremental seen state. Each micro-batch of new documents is deduped
 * against every previously processed document; the result is EXACTLY the
 * one-shot drop rule over the union ("∃ earlier doc with J ≥ t"), proven
 * by the stream≡batch test in StreamingCrawlSpec.
 *
 * Layout under `root/`:
 *   batches/            -- watched dir; (doc_id, text) parquet deltas
 *   survivors/batch=k/  -- per-batch surviving docs
 *   docs/batch=k/       -- per-batch ingested docs (corpus pointer for restart)
 *   sigs/batch=k/       -- per-batch slim signature deltas
 *   checkpoint/         -- Spark streaming checkpoint (offsets/commits)
 *
 * Crash/replay safety (the StreamingCrawl lesson): a replayed batch k
 * recomputes bit-identical output — its input files are pinned by the
 * streaming offset log, and the state loaded at query start excludes
 * batch k's own committed snapshots (strictly-before filter), so every
 * overwrite rewrites identical content. Snapshot reads are gated on
 * `_SUCCESS` so an interrupted write is invisible.
 *
 * State growth is the slim store's: ~(numPerms+1)×8 bytes per doc ever
 * seen, carried in memory per query and persisted as per-batch deltas.
 * Docs ids must be monotone across batches (the incrementalDedup
 * contract); within a micro-batch any order is fine.
 */
object StreamingIncrementalDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Committed batch=k dirs under root/sub (same _SUCCESS gate as
    * StreamingCrawl). */
  private def committed(root: String, sub: String): Seq[String] = {
    val dir = new java.io.File(s"$root/$sub")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(_.getPath).toIndexedSeq
  }

  private def batchNo(path: String): Int =
    path.substring(path.lastIndexOf('=') + 1).toInt

  /** Test hook: full store loads performed (must be once per query start —
    * the per-batch path carries the store incrementally). */
  private[streaming] var storeLoads: Int = 0

  private def emptyDocs(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)

  /** Start the streaming dedup over parquet doc deltas in root/batches. */
  def start(spark: SparkSession, root: String,
            cfg: TextPipeline.PipelineConfig = TextPipeline.PipelineConfig()): StreamingQuery = {
    val stream = spark.readStream.schema(docSchema).parquet(s"$root/batches")

    // per-query incremental state (foreachBatch runs sequentially)
    var store: DataFrame = null
    var ingested: DataFrame = null

    stream.writeStream
      .option("checkpointLocation", s"$root/checkpoint")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val k = batchId.toInt + 1
        if (store == null) {
          storeLoads += 1
          val priorSigs = committed(root, "sigs").filter(batchNo(_) < k)
          store = (if (priorSigs.isEmpty)
              TextPipeline.signatureShingles(emptyDocs(s), "doc_id", "text",
                cfg.numPerms, cfg.k).drop("__shSet")
            else s.read.parquet(priorSigs: _*)).localCheckpoint()
          val priorDocs = committed(root, "docs").filter(batchNo(_) < k)
          ingested = (if (priorDocs.isEmpty) emptyDocs(s)
            else s.read.parquet(priorDocs: _*)).localCheckpoint()
        }
        val b = batch.localCheckpoint() // pin the micro-batch input once
        if (!b.isEmpty) {
          val (surv, sigs0) = TextPipeline.incrementalDedup(store, ingested, b,
            "doc_id", "text", cfg)
          val sigs = sigs0.localCheckpoint() // two consumers: write + carry
          surv.write.mode("overwrite").parquet(s"$root/survivors/batch=$k")
          b.write.mode("overwrite").parquet(s"$root/docs/batch=$k")
          sigs.write.mode("overwrite").parquet(s"$root/sigs/batch=$k")
          store = store.unionByName(sigs).localCheckpoint()
          ingested = ingested.unionByName(b).localCheckpoint()
        }
        ()
      }
      .start()
  }

  /** All surviving docs committed by the stream so far. */
  def readSurvivors(spark: SparkSession, root: String): DataFrame = {
    val dirs = committed(root, "survivors")
    if (dirs.isEmpty) emptyDocs(spark)
    else spark.read.option("basePath", s"$root/survivors").parquet(dirs: _*)
      .select("doc_id", "text")
  }
}
