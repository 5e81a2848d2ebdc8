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
      "argv pushes the sampling into ffmpeg, original indices reconstructed") {
    val dir = Files.createTempDirectory(Paths.get("target"), "fake-ffmpeg")
    // the fake emits the ALREADY-SAMPLED stream, as real ffmpeg would
    // under the select filter: 3 frames = original indices 0, 2, 4
    val frames = ppmFrame(4, 2, 10, 20, 30) ++ ppmFrame(4, 2, 200, 100, 50) ++
      ppmFrame(4, 2, 1, 2, 3)
    val ppm = dir.resolve("frames.ppm")
    Files.write(ppm, frames)
    val bin = dir.resolve("ffmpeg")
    val argvOut = dir.resolve("argv.txt")
    // a stand-in that records its argv (for the pushdown assert) and
    // streams the sampled frames out
    Files.write(bin, s"#!/bin/sh\necho \"$$@\" > $argvOut\ncat $ppm\n".getBytes("US-ASCII"))
    bin.toFile.setExecutable(true)
    sys.props("graft.ffmpeg") = bin.toString
    try {
      assert(Multimodal.ffmpegPath().contains(bin.toString))
      val media = Multimodal.attachVideo(spark.range(2).toDF("id"), "id")
        .withColumn("format", lit("mp4"))
      val out = Multimodal.sampleFramesVideo(media,
        everyN = 2, maxFrames = 5, plannedFrameCount = 99)
      // every row really decoded; result k maps to original index 2k;
      // n_frames is NULL — the bounded decode never saw the clip end
      assert(out.filter(!col("decoded")).count() == 0)
      assert(out.filter(col("n_frames").isNotNull).count() == 0)
      val rows = out.select("media_id", "frame_idx", "width",
          "height", "mean_r", "mean_g", "mean_b")
        .as[(Long, Int, Int, Int, Int, Int, Int)].collect().toSet
      assert(rows == Set(
        (0L, 0, 4, 2, 10, 20, 30), (0L, 2, 4, 2, 200, 100, 50), (0L, 4, 4, 2, 1, 2, 3),
        (1L, 0, 4, 2, 10, 20, 30), (1L, 2, 4, 2, 200, 100, 50), (1L, 4, 4, 2, 1, 2, 3)))
      // the subprocess argv encodes the sampling: select drops frames
      // before the pipe and -frames:v stops the decode at the budget
      val argv = new String(Files.readAllBytes(argvOut), "US-ASCII")
      assert(argv.contains("select=not(mod(n\\,2))"), argv)
      assert(argv.contains("-frames:v 5"), argv)
      assert(argv.contains("-fps_mode vfr"), argv)
    } finally sys.props.remove("graft.ffmpeg")
  }

  test("argv builder: sampling parameters land in the filter and frame cap") {
    val argv = Multimodal.ffmpegArgs("/usr/bin/ffmpeg", "/tmp/in.mp4", 7, 3)
    assert(argv.containsSlice(Seq("-vf", "select=not(mod(n\\,7))")))
    assert(argv.containsSlice(Seq("-frames:v", "3")))
    assert(argv.containsSlice(Seq("-vcodec", "ppm")))
  }

  test("incremental parse: a many-frame stream stops at maxFrames within " +
      "a bounded read, never buffering the remainder") {
    val total = 200
    val one = ppmFrame(64, 32, 9, 8, 7)
    val all = Array.fill(total)(one).flatten
    var readBytes = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(all)
      override def read(): Int = { val v = in.read(); if (v >= 0) readBytes += 1; v }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val k = in.read(b, off, len); if (k > 0) readBytes += k; k
      }
    }
    val got = Multimodal.parsePpmFrames(counting, maxFrames = 3)
    assert(got == Seq.fill(3)((64, 32, 9, 8, 7)))
    // 3 frames read + at most one buffer of lookahead — nowhere near
    // the 200-frame stream (the old readAllBytes shape)
    assert(readBytes <= 3L * one.length + (1 << 16),
      s"read $readBytes of ${all.length} for 3 frames")
  }

  test("a binary that ignores -frames:v cannot overrun the budget: the " +
      "parse stops at maxFrames and the row succeeds") {
    val dir = Files.createTempDirectory(Paths.get("target"), "fake-ffmpeg-many")
    val many = Array.fill(50)(ppmFrame(8, 4, 5, 6, 7)).flatten
    val ppm = dir.resolve("many.ppm")
    Files.write(ppm, many)
    val bin = dir.resolve("ffmpeg")
    Files.write(bin, s"#!/bin/sh\ncat $ppm\n".getBytes("US-ASCII"))
    bin.toFile.setExecutable(true)
    val got = Multimodal.decodeFramesFfmpeg(bin.toString,
      Array[Byte](1, 2, 3), "mp4", everyN = 1, maxFrames = 4)
    assert(got == Seq.fill(4)((8, 4, 5, 6, 7)))
  }

  test("chatty stderr cannot deadlock the pipe: >64KB of error output " +
      "drains concurrently while frames stream") {
    val dir = Files.createTempDirectory(Paths.get("target"), "fake-ffmpeg-err")
    val ppm = dir.resolve("f.ppm")
    Files.write(ppm, ppmFrame(4, 4, 1, 1, 1))
    val bin = dir.resolve("ffmpeg")
    // 200k of stderr BEFORE stdout: with a stderr pipe this wedges at
    // ~64KB; with the redirect-to-file drain it must complete
    Files.write(bin, (s"#!/bin/sh\n" +
      "i=0; while [ $i -lt 3000 ]; do echo 'frame damage damage damage damage damage damage damage' >&2; i=$((i+1)); done\n" +
      s"cat $ppm\n").getBytes("US-ASCII"))
    bin.toFile.setExecutable(true)
    val got = Multimodal.decodeFramesFfmpeg(bin.toString,
      Array[Byte](9), "webm", everyN = 3, maxFrames = 9)
    assert(got == Seq((4, 4, 1, 1, 1)))
  }

  test("a nonzero exit surfaces the stderr tail; a hung binary trips the " +
      "watchdog instead of hanging the task") {
    val dir = Files.createTempDirectory(Paths.get("target"), "fake-ffmpeg-bad")
    val bad = dir.resolve("ffmpeg")
    Files.write(bad, "#!/bin/sh\necho 'moov atom not found' >&2\nexit 1\n".getBytes("US-ASCII"))
    bad.toFile.setExecutable(true)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeFramesFfmpeg(bad.toString, Array[Byte](1), "mp4", 1, 5)
    }
    assert(e.getMessage.contains("moov atom not found"))

    val hung = dir.resolve("ffmpeg-hang")
    // emits one complete frame, then holds the pipe open well past the
    // 1s test deadline — the watchdog must destroy it, EOF the pipe,
    // and fail the call instead of blocking the executor thread
    val ppm = dir.resolve("h.ppm")
    Files.write(ppm, ppmFrame(2, 2, 3, 3, 3))
    Files.write(hung, s"#!/bin/sh\ncat $ppm\nsleep 60\n".getBytes("US-ASCII"))
    hung.toFile.setExecutable(true)
    sys.props("graft.ffmpeg.timeout.sec") = "1"
    val t0 = System.nanoTime()
    try {
      intercept[Exception] {
        Multimodal.decodeFramesFfmpeg(hung.toString, Array[Byte](1), "mp4", 1, 5)
      }
      assert((System.nanoTime() - t0) / 1e9 < 30, "watchdog did not bound the hang")
    } finally sys.props.remove("graft.ffmpeg.timeout.sec")
  }

  test("unlabeled payloads route to the ffmpeg-or-planned tier, never the " +
      "JDK image reader (one bad row must not fail the job)") {
    sys.props.remove("graft.ffmpeg")
    assume(Multimodal.ffmpegPath().isEmpty, "container unexpectedly ships ffmpeg")
    // video-ish bytes with a NULL format: the JDK reader would throw;
    // the planned tier must serve them
    val media = Multimodal.attachVideo(spark.range(2).toDF("id"), "id")
      .withColumn("format", lit(null).cast("string"))
    val out = Multimodal.sampleFramesVideo(media,
      everyN = 2, maxFrames = 2, plannedFrameCount = 4)
    assert(out.filter(col("decoded")).count() == 0)
    assert(out.select("media_id", "frame_idx").as[(Long, Int)].collect().toSet ==
      Set((0L, 0), (0L, 2), (1L, 0), (1L, 2)))
  }
}
