package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media
  * (image/audio/video) travels as opaque `binary` columns next to a
  * typed metadata struct; decode/feature steps run as partition-batched
  * transforms.
  *
  * The Spark-side shape — schemas, batching, partition sizing — is
  * real and tested. The actual byte decoding is a clearly-marked
  * deterministic STUB (`fakeDecode`): this container has no image/audio
  * codecs, and a production deployment would replace exactly that one
  * function (e.g. with javax.imageio / ffmpeg bindings) without
  * touching any of the distributed plumbing around it.
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

  /** Simulate a media column from the documents table (deterministic:
    * the "media" is the utf-8 text, the format cycles per id). In a
    * real corpus this column comes straight from parquet/tar shards.
    */
  def attachMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (col(idCol) % 3 + 1).cast("int")).as("format"))

  /** STUB decoder — deterministic dimensions/features derived from the
    * bytes. ??? in spirit: replace with a real codec at deployment.
    */
  private[operators] def fakeDecode(bytes: Array[Byte], format: String): (Int, Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 512)
    val height = 64 + math.abs((h / 512) % 512)
    val channels = if (format == "png") 4 else 3
    val features = Array.tabulate(8)(i => ((h >> i) & 0xff) / 255.0f)
    (width, height, channels, features)
  }

  /** Partition-batched decode: one task decodes its whole partition via
    * an iterator (the JVM-side analog of a pandas-UDF `mapInPandas`
    * batch loop — amortizes per-batch setup, never collects to the
    * driver). Repartition upstream to bound batch memory.
    */
  def decodeMedia(media: DataFrame, partitions: Int = 0): DataFrame = {
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    src.select("media_id", "bytes", "format").mapPartitions { rows =>
      // per-partition setup would open the codec once here
      rows.map { r =>
        val (w, h, c, f) = fakeDecode(r.getAs[Array[Byte]]("bytes"), r.getAs[String]("format"))
        Row(r.getAs[Long]("media_id"), w, h, c, f.toSeq)
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
    * up to a cap (pure metadata; the decode stub stands in for ffprobe).
    */
  def planFrameSample(media: DataFrame, frameCount: Int, everyN: Int, maxFrames: Int): DataFrame =
    media.withColumn("frame_indices",
      slice(sequence(lit(0), lit(frameCount - 1), lit(everyN)), 1, maxFrames))
}
