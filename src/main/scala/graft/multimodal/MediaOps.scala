package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.Synth

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, processed in batch-shaped
 * per-partition passes (the Scala analogue of `mapInPandas` batches).
 *
 * The DECODE STEP IS A DETERMINISTIC STUB — the real image/audio codec
 * libraries are not in this container. `StubCodec` derives fake
 * pixels/samples from a seeded hash of the payload bytes, so schema,
 * partitioning, batch shape, and downstream feature plumbing are real and
 * tested while the codec is swappable (marked STUB below).
 */
object MediaOps {

  /** media row: opaque payload + typed metadata, one row per asset. */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],  // opaque encoded bytes
      width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int, channels: Int,
      mean_luma: Double, embedding: Array[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_luma: Double)

  /** Deterministic synthetic media table (payload bytes are seeded noise). */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism).map { id =>
      val kind = (Synth.mix2(1L, id) % 3 + 3) % 3 match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (Synth.mix2(2L, id) & 0x3FF).toInt
      val payload = Array.tabulate[Byte](len)(i => (Synth.mix2(id, i.toLong) & 0xFF).toByte)
      MediaRow(id, kind, payload,
        width = 32 + (Synth.mix2(3L, id) & 0x1F).toInt,
        height = 32 + (Synth.mix2(4L, id) & 0x1F).toInt,
        sample_rate = 16000, n_frames = 8 + (Synth.mix2(5L, id) & 0x7).toInt)
    }
  }

  /** STUB codec: a real build replaces these with actual decoders. The
    * fake is a pure function of the payload bytes — deterministic,
    * cluster-size independent. */
  object StubCodec {
    /** STUB: "decode" → per-pixel luma stream derived from payload hash. */
    def decodeLuma(payload: Array[Byte], nPixels: Int): Array[Double] = {
      var h = 0xCAFEL
      payload.foreach(b => h = Synth.mix(h ^ (b & 0xFFL)))
      Array.tabulate(nPixels)(i => (Synth.mix2(h, i.toLong) & 0xFFFFL).toDouble / 0xFFFF)
    }
    /** STUB: fixed-dim embedding from payload hash. */
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      var h = 0xFEEDL
      payload.foreach(b => h = Synth.mix(h ^ (b & 0xFFL)))
      Array.tabulate(dim)(i => ((Synth.mix2(h, i.toLong) & 0xFFFFL).toFloat / 0xFFFF) - 0.5f)
    }
  }

  /**
   * Feature extraction over image rows — batch-shaped per-partition pass
   * (`mapPartitions`): one codec init per partition, rows streamed
   * through, exactly the execution shape a Pandas-UDF/Arrow batch has.
   */
  def imageFeatures(media: Dataset[MediaRow], embeddingDim: Int = 16): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // per-partition codec/model init happens HERE in a real build
      rows.map { r =>
        val px = StubCodec.decodeLuma(r.payload, math.min(r.width * r.height, 1024))
        ImageFeatures(r.media_id, r.width, r.height, channels = 3,
          mean_luma = if (px.isEmpty) 0.0 else px.sum / px.length,
          embedding = StubCodec.embed(r.payload, embeddingDim))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame, flatMap
    * (1 row in → n frames out), deterministic. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until r.n_frames by stride).map { f =>
        val px = StubCodec.decodeLuma(r.payload :+ f.toByte, 64)
        FrameSample(r.media_id, f, px.sum / px.length)
      }
    }
  }

  /** "Resize" metadata projection: pure column math on typed metadata —
    * shows the pre-decode pushdown (payload column never read when only
    * metadata is needed; Parquet column pruning does the rest). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    media.select(col("media_id"), col("kind"),
      (col("width") * scale).cast("int").as("out_width"),
      (col("height") * scale).cast("int").as("out_height"))
  }
}
