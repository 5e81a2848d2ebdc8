package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The ffmpeg-optional video tier — the GEOS-add-on pattern applied to
  * the last media boundary: mp4/webm containers REALLY decode when an
  * ffmpeg binary is deployed, and the same call degrades to the
  * metadata plan when none resolves. The container image ships no
  * ffmpeg, so the deployed-binary path is exercised with an injected
  * FAKE binary (a script emitting a deterministic PPM stream) — which
  * tests everything ours: binary resolution, the subprocess protocol,
  * the PPM parse, the sampling arithmetic, and the partition-batched
  * executor shape. Only the codec math inside real ffmpeg is trusted,
  * exactly as shapely is trusted in the reference's geos oracle.
  */
class FfmpegVideoSpec extends SparkSpec {
  import spark.implicits._

  private def ppmFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val body = Array.fill(w * h)(Array(r.toByte, g.toByte, b.toByte)).flatten
    header ++ body
  }

  test("PPM stream parser: dims and exact means per concatenated frame") {
    val stream = ppmFrame(2, 2, 10, 20, 30) ++ ppmFrame(3, 1, 200, 100, 50)
    assert(Multimodal.parsePpmStream(stream) ==
      Seq((2, 2, 10, 20, 30), (3, 1, 200, 100, 50)))
    assert(Multimodal.parsePpmStream(Array.empty[Byte]).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.parsePpmStream("P5\n1 1\n255\n0".getBytes("US-ASCII"))
    }
  }

  test("no deployed binary: non-gif containers degrade to the metadata plan, " +
      "gif still really decodes") {
    sys.props.remove("graft.ffmpeg")
    assume(Multimodal.ffmpegPath().isEmpty, "container unexpectedly ships ffmpeg")
    val gif = Multimodal.attachVideo(spark.range(2).toDF("id"), "id")
    val mp4 = gif.withColumn("format", lit("mp4")) // same bytes, foreign label
    val out = Multimodal.sampleFramesVideo(gif.unionByName(mp4),
      everyN = 2, maxFrames = 3, plannedFrameCount = 6)
    val (real, planned) = (out.filter(col("decoded")), out.filter(!col("decoded")))
    // gif rows decoded for real: true dims from the JDK reader
    assert(real.count() > 0 && real.filter(col("width").isNull).count() == 0)
    // mp4 rows planned: frame indices 0, 2, 4 of the assumed 6, no dims
    assert(planned.select("media_id", "frame_idx").as[(Long, Int)].collect().toSet ==
      Set((0L, 0), (0L, 2), (0L, 4), (1L, 0), (1L, 2), (1L, 4)))
    assert(planned.filter(col("width").isNotNull).count() == 0)
    assert(planned.select("n_frames").distinct().as[Int].collect().toSeq == Seq(6))
  }

  test("deployed binary: mp4 rows decode through the subprocess protocol, " +
      "sampled with true dims and means") {
    val dir = Files.createTempDirectory(Paths.get("target"), "fake-ffmpeg")
    val frames = ppmFrame(4, 2, 10, 20, 30) ++ ppmFrame(4, 2, 200, 100, 50) ++
      ppmFrame(4, 2, 1, 2, 3)
    val ppm = dir.resolve("frames.ppm")
    Files.write(ppm, frames)
    val bin = dir.resolve("ffmpeg")
    // a stand-in that honors the call shape (args ignored, stream out)
    Files.write(bin, s"#!/bin/sh\ncat $ppm\n".getBytes("US-ASCII"))
    bin.toFile.setExecutable(true)
    sys.props("graft.ffmpeg") = bin.toString
    try {
      assert(Multimodal.ffmpegPath().contains(bin.toString))
      val media = Multimodal.attachVideo(spark.range(2).toDF("id"), "id")
        .withColumn("format", lit("mp4"))
      val out = Multimodal.sampleFramesVideo(media,
        everyN = 2, maxFrames = 5, plannedFrameCount = 99)
      // every row really decoded; frames 0 and 2 of the 3 kept
      assert(out.filter(!col("decoded")).count() == 0)
      val rows = out.select("media_id", "frame_idx", "n_frames", "width",
          "height", "mean_r", "mean_g", "mean_b")
        .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect().toSet
      assert(rows == Set(
        (0L, 0, 3, 4, 2, 10, 20, 30), (0L, 2, 3, 4, 2, 1, 2, 3),
        (1L, 0, 3, 4, 2, 10, 20, 30), (1L, 2, 3, 4, 2, 1, 2, 3)))
    } finally sys.props.remove("graft.ffmpeg")
  }
}
