package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media
  * (image/audio/video) travels as opaque `binary` columns next to a
  * typed metadata struct; decode/feature steps run as partition-batched
  * transforms.
  *
  * Image decode is REAL: `javax.imageio` (JDK-built-in PNG/JPEG codecs,
  * no external dependency) reads the bytes and reports true
  * width/height/channels plus per-channel mean features. Audio/video
  * remain metadata-only planning ([[planFrameSample]]) — those codecs
  * are not in the JDK, and a deployment would slot an ffmpeg binding
  * into the same partition-batched shape without touching the
  * distributed plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Deterministic raster parameters for the synthetic corpus: dims and
    * a solid fill color derived from the id. Part of the q90 oracle
    * contract — the DuckDB side restates exactly this arithmetic.
    */
  def synthDims(id: Long): (Int, Int) =
    (16 + ((id * 7) % 48).toInt, 16 + ((id * 13) % 48).toInt)
  def synthColor(id: Long): (Int, Int, Int, Int) =
    ((id % 256).toInt, ((id * 3) % 256).toInt, ((id * 7) % 256).toInt,
      (100 + id % 156).toInt)

  /** Encode one deterministic solid-color image: even ids → PNG with
    * alpha (4 channels, lossless), odd ids → JPEG (3 channels, lossy).
    * Runs on executors inside [[attachMedia]]'s partition loop.
    */
  def synthImageBytes(id: Long): (Array[Byte], String) = {
    val (w, h) = synthDims(id)
    val (r, g, b, a) = synthColor(id)
    val png = id % 2 == 0
    val img = new BufferedImage(w, h,
      if (png) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB)
    val argb = ((if (png) a else 0xff) << 24) | (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, argb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, if (png) "png" else "jpeg", out)
    (out.toByteArray, if (png) "png" else "jpeg")
  }

  /** Build a REAL media column from an id source: deterministic
    * PNG/JPEG bytes per id (in a real corpus this column comes straight
    * from parquet/tar shards). Partition-batched: each task encodes its
    * partition in one iterator pass.
    */
  def attachMedia(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      ImageIO.setUseCache(false) // in-memory streams only; no temp files
      rows.map { row =>
        val id = row.getLong(0)
        val (bytes, format) = synthImageBytes(id)
        Row(id, bytes, format)
      }
    }(enc)
  }

  /** Real image decode for one payload: true header dims, channel count
    * from the color model, and per-channel mean pixel features (length
    * == channels, normalized to [0,1]; `getRGB` is channel-order-safe
    * across the reader's raster layouts).
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "no JDK ImageReader could decode the payload")
    val w = img.getWidth
    val h = img.getHeight
    val channels = img.getColorModel.getNumComponents
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sa += (p >>> 24) & 0xff; sr += (p >>> 16) & 0xff
        sg += (p >>> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h * 255L
    val means = Array((sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat,
      (sb.toDouble / n).toFloat, (sa.toDouble / n).toFloat)
    (w, h, channels, means.take(channels))
  }

  /** Partition-batched decode: one task decodes its whole partition via
    * an iterator (the JVM-side analog of a pandas-UDF `mapInPandas`
    * batch loop — amortizes per-batch setup, never collects to the
    * driver). Repartition upstream to bound batch memory.
    */
  def decodeMedia(media: DataFrame, partitions: Int = 0): DataFrame = {
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    // positional accessors: when chained after another mapPartitions
    // the rows flow object-to-object (GenericRow, no schema attached)
    src.select("media_id", "bytes", "format").mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition codec setup, once
      rows.map { r =>
        val (w, h, c, f) = decodeImage(r.get(1).asInstanceOf[Array[Byte]])
        Row(r.getLong(0), w, h, c, f.toSeq)
      }
    }(enc)
  }

  /** Metadata-only resize planning (no pixel work): target box fit,
    * preserving aspect ratio — the cheap pre-pass that decides which
    * media even need decoding at full size.
    */
  def planResize(decoded: DataFrame, maxDim: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))

  /** Frame sampling plan for video-shaped media: every nth frame index
    * up to a cap (pure metadata; a deployment slots ffprobe here).
    */
  def planFrameSample(media: DataFrame, frameCount: Int, everyN: Int, maxFrames: Int): DataFrame =
    media.withColumn("frame_indices",
      slice(sequence(lit(0), lit(frameCount - 1), lit(everyN)), 1, maxFrames))
}
