package graft

import org.apache.spark.sql.functions._

import graft.model.Variant
import graft.operators.Multimodal

/** Multimodal plumbing with the REAL javax.imageio codec (PNG/JPEG
  * encode→decode roundtrips) and variant value encoding + standard
  * order of terms.
  */
class MultimodalVariantSpec extends SparkSpec {
  import spark.implicits._

  test("media attach + partition-batched decode: schema, rows, determinism") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.attachMedia(docs, "doc_id")
    assert(media.schema.fieldNames.sameElements(Array("media_id", "bytes", "format")))
    val decoded = Multimodal.decodeMedia(media, partitions = 8)
    assert(decoded.schema == Multimodal.decodedSchema)
    assert(decoded.count() == docs.count())
    assert(decoded.rdd.getNumPartitions == 8)
    val a = decoded.orderBy("media_id").collect()
    val b = Multimodal.decodeMedia(media, partitions = 8).orderBy("media_id").collect()
    assert(a.sameElements(b), "decode must be deterministic")
  }

  test("decode reads real bytes: dims/channels/pixels roundtrip the encoder contract") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val decoded = Multimodal.decodeMedia(Multimodal.attachMedia(docs, "doc_id"))
      .orderBy("media_id").collect()
    assert(decoded.nonEmpty)
    decoded.foreach { row =>
      val id = row.getAs[Long]("media_id")
      val (w, h) = Multimodal.synthDims(id)
      val (r, g, bl, al) = Multimodal.synthColor(id)
      assert(row.getAs[Int]("width") == w && row.getAs[Int]("height") == h,
        s"header dims mismatch for $id")
      val png = id % 2 == 0
      assert(row.getAs[Int]("channels") == (if (png) 4 else 3))
      val f = row.getAs[scala.collection.Seq[Float]]("features")
      assert(f.size == row.getAs[Int]("channels"))
      if (png) {
        // lossless: per-channel means are the exact fill color
        assert(math.round(f(0) * 255) == r && math.round(f(1) * 255) == g &&
          math.round(f(2) * 255) == bl && math.round(f(3) * 255) == al,
          s"png pixel roundtrip mismatch for $id")
      } else {
        // jpeg is lossy; a solid-color image still decodes close
        assert(math.abs(f(0) * 255 - r) <= 3 && math.abs(f(1) * 255 - g) <= 3 &&
          math.abs(f(2) * 255 - bl) <= 3, s"jpeg pixel drift too large for $id")
      }
    }
  }

  test("audio decode reads real WAV bytes: rate/frames/channels/RMS roundtrip") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val decoded = Multimodal.decodeAudioMedia(
        Multimodal.attachAudio(docs, "doc_id"), partitions = 8)
      .orderBy("media_id").collect()
    assert(decoded.length == docs.count())
    decoded.foreach { row =>
      val id = row.getAs[Long]("media_id")
      val (rate, frames, channels, amp) = Multimodal.synthAudioParams(id)
      assert(row.getAs[Int]("sample_rate") == rate, s"rate mismatch for $id")
      assert(row.getAs[Long]("n_frames") == frames, s"frames mismatch for $id")
      assert(row.getAs[Int]("channels") == channels, s"channels mismatch for $id")
      // constant-amplitude signal: RMS is the amplitude, exactly
      assert(row.getAs[Long]("rms") == amp.toLong, s"rms mismatch for $id")
    }
  }

  test("png gets alpha channel; resize plan preserves aspect and caps dims") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.attachMedia(docs, "doc_id")
    val decoded = Multimodal.decodeMedia(media)
      .join(media.select("media_id", "format"), "media_id")
    assert(decoded.filter($"format" === "png" && $"channels" =!= 4).count() == 0)
    val planned = Multimodal.planResize(decoded, maxDim = 32)
    assert(planned.filter($"out_width" > 32 || $"out_height" > 32).count() == 0)
    // no upscaling
    assert(planned.filter($"scale" > 1.0).count() == 0)
  }

  test("frame sample plan: stride + cap") {
    val media = Seq((1L, 100)).toDF("media_id", "n")
    val planned = Multimodal.planFrameSample(media, frameCount = 100, everyN = 10, maxFrames = 5)
    val idx = planned.select("frame_indices").as[Seq[Long]].head()
    assert(idx == Seq(0L, 10L, 20L, 30L, 40L))
  }

  test("variant round trips types with null on tag mismatch") {
    val df = Seq((1L, 3.5, "hi", true)).toDF("l", "d", "s", "b")
      .select(
        Variant.encodeLong($"l").as("vl"), Variant.encodeDouble($"d").as("vd"),
        Variant.encodeString($"s").as("vs"), Variant.encodeBool($"b").as("vb"))
    val r = df.select(
      Variant.asLong($"vl"), Variant.asDouble($"vd"),
      Variant.asString($"vs"), Variant.asBool($"vb"),
      Variant.asLong($"vs"), Variant.asString($"vl")).head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 3.5)
    assert(r.getString(2) == "hi" && r.getBoolean(3))
    assert(r.isNullAt(4) && r.isNullAt(5), "mismatched tags must read as null")
  }

  test("standard order of terms: numbers < strings < lists, each sorted within") {
    val vals = Seq(
      ("s2", Variant.encodeString(lit("zebra"))),
      ("n10", Variant.encodeDouble(lit(10.0))),
      ("list", Variant.encodeArray(array(lit(1), lit(2)))),
      ("n2", Variant.encodeLong(lit(2))),
      ("s1", Variant.encodeString(lit("apple"))))
    val df = vals.map { case (name, v) =>
      spark.range(1).select(lit(name).as("name"), v.as("v"))
    }.reduce(_ unionAll _)
    val sorted = df.orderBy(Variant.termOrderKey($"v")).select("name").as[String].collect()
    assert(sorted.sameElements(Array("n2", "n10", "s1", "s2", "list")))
  }
}
