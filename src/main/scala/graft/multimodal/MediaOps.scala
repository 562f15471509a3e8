package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.Synth

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, processed in batch-shaped
 * per-partition passes (the Scala analogue of `mapInPandas` batches).
 *
 * IMAGE decode is REAL: payloads are genuine PNG bytes (encoded by
 * [[synthMedia]] from deterministic pixels) and [[imageFeatures]] decodes
 * them with JDK `javax.imageio` (PNG/JPEG/GIF/BMP ship with the JDK — no
 * external codec needed), computing per-pixel luma statistics and a
 * downsampled-luma-grid embedding from the actual raster.
 *
 * AUDIO/VIDEO decode remains a DETERMINISTIC STUB (`StubCodec`) — no
 * audio/video codec library is in this container. The stub derives fake
 * samples from a seeded hash of the payload bytes, so schema,
 * partitioning, and batch shape are real and tested while the codec is
 * swappable (marked STUB below).
 */
object MediaOps {

  /** media row: opaque payload + typed metadata, one row per asset. */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],  // encoded bytes (real PNG for kind=image)
      width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int, channels: Int,
      mean_luma: Double, embedding: Array[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_luma: Double)

  /** ITU-R BT.601 luma of a packed (A)RGB pixel, normalized to [0,1]. */
  private def luma(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
  }

  /** Deterministic RGB pixel for (image id, pixel index) — pure hash. */
  private def synthPixel(id: Long, i: Long): Int =
    (Synth.mix2(id, i) & 0xFFFFFF).toInt

  /** Encode the deterministic raster for `id` as real PNG bytes. */
  private[multimodal] def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, synthPixel(id, y.toLong * w + x)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table. Image payloads are REAL PNG
    * bytes; audio/video payloads are seeded noise (stub-decoded). */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism).map { id =>
      val kind = (Synth.mix2(1L, id) % 3 + 3) % 3 match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val width = 32 + (Synth.mix2(3L, id) & 0x1F).toInt
      val height = 32 + (Synth.mix2(4L, id) & 0x1F).toInt
      val payload =
        if (kind == "image") synthPng(id, width, height)
        else {
          val len = 256 + (Synth.mix2(2L, id) & 0x3FF).toInt
          Array.tabulate[Byte](len)(i => (Synth.mix2(id, i.toLong) & 0xFF).toByte)
        }
      MediaRow(id, kind, payload, width, height,
        sample_rate = 16000, n_frames = 8 + (Synth.mix2(5L, id) & 0x7).toInt)
    }
  }

  /** STUB codec for AUDIO/VIDEO only (image decode is real — see
    * [[imageFeatures]]). A real build replaces these with actual
    * decoders; the fake is a pure function of the payload bytes —
    * deterministic, cluster-size independent. */
  object StubCodec {
    /** STUB: "decode" → sample stream derived from payload hash. */
    def decodeLuma(payload: Array[Byte], nPixels: Int): Array[Double] = {
      var h = 0xCAFEL
      payload.foreach(b => h = Synth.mix(h ^ (b & 0xFFL)))
      Array.tabulate(nPixels)(i => (Synth.mix2(h, i.toLong) & 0xFFFFL).toDouble / 0xFFFF)
    }
  }

  /**
   * Feature extraction over image rows — batch-shaped per-partition pass
   * (`mapPartitions`): one codec init per partition, rows streamed
   * through, exactly the execution shape a Pandas-UDF/Arrow batch has.
   *
   * REAL decode: `ImageIO.read` on the payload bytes; width/height/
   * channels come from the decoded raster (not the metadata columns),
   * mean_luma is the BT.601 luma mean over actual pixels, and the
   * embedding is a `g×g` downsampled mean-luma grid (g = √dim) — a real,
   * deterministic pixel feature. Rows whose payload fails to decode are
   * dropped (flatMap), never silently faked.
   */
  def imageFeatures(media: Dataset[MediaRow], embeddingDim: Int = 16): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    val g = math.sqrt(embeddingDim.toDouble).toInt
    require(g * g == embeddingDim, s"embeddingDim=$embeddingDim must be a perfect square (luma-grid embedding)")
    media.filter(_.kind == "image").mapPartitions { rows =>
      // per-partition init: disk-backed ImageIO caching off for pure
      // in-memory batch decode on executors
      ImageIO.setUseCache(false)
      rows.flatMap { r =>
        Option(ImageIO.read(new ByteArrayInputStream(r.payload))).map { img =>
          val w = img.getWidth; val h = img.getHeight
          val cells = Array.ofDim[Double](g * g)
          val counts = Array.ofDim[Long](g * g)
          var sum = 0.0
          var y = 0
          while (y < h) {
            val gy = math.min(y * g / h, g - 1)
            var x = 0
            while (x < w) {
              val l = luma(img.getRGB(x, y))
              sum += l
              val c = gy * g + math.min(x * g / w, g - 1)
              cells(c) += l; counts(c) += 1
              x += 1
            }
            y += 1
          }
          val emb = Array.tabulate(g * g)(i =>
            if (counts(i) == 0) 0f else (cells(i) / counts(i)).toFloat)
          ImageFeatures(r.media_id, w, h,
            channels = img.getColorModel.getNumColorComponents,
            mean_luma = if (w * h == 0) 0.0 else sum / (w.toLong * h),
            embedding = emb)
        }
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame, flatMap
    * (1 row in → n frames out), deterministic. STUB decode (no video
    * codec in-container). */
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
