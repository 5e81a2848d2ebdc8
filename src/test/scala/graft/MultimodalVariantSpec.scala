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

  test("resizeImage: exact nearest-neighbor pixels and ceil-div dims") {
    import java.awt.image.BufferedImage
    val src = new BufferedImage(4, 2, BufferedImage.TYPE_INT_ARGB)
    val px = Array.tabulate(4, 2)((x, y) => 0xff000000 | (x * 40 + y) << 16 | x)
    for (x <- 0 until 4; y <- 0 until 2) src.setRGB(x, y, px(x)(y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val (outBytes, ow, oh) = Multimodal.resizeImage(bos.toByteArray, maxDim = 2)
    // dims: g=4 -> ow=(4*2+3)/4=2, oh=(2*2+3)/4=1
    assert((ow, oh) == ((2, 1)))
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(outBytes))
    // nearest-neighbor source indices: x*4/2 -> 0,2; y*2/1 -> 0
    assert(out.getRGB(0, 0) == px(0)(0) && out.getRGB(1, 0) == px(2)(0))
    // no-op when already inside the box
    val (sameBytes, sw, sh) = Multimodal.resizeImage(bos.toByteArray, maxDim = 8)
    assert((sw, sh) == ((4, 2)))
    val same = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(sameBytes))
    assert(same.getRGB(3, 1) == px(3)(1))
  }

  test("resizeImage: gray rasters copy exact samples (no colorspace roundtrip)") {
    import java.awt.image.BufferedImage
    val src = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    val v = Array.tabulate(4, 4)((x, y) => x * 61 + y * 17) // distinct gray levels
    for (x <- 0 until 4; y <- 0 until 4) src.getRaster.setSample(x, y, 0, v(x)(y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val (outBytes, ow, oh) = Multimodal.resizeImage(bos.toByteArray, maxDim = 2)
    assert((ow, oh) == ((2, 2)))
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(out.getColorModel.getNumComponents == 1, "gray must stay 1-channel")
    // nearest-neighbor source indices: x*4/2 -> 0,2 in both axes — the
    // samples must match EXACTLY (setRGB would shift them via sRGB)
    for (x <- 0 until 2; y <- 0 until 2)
      assert(out.getRaster.getSample(x, y, 0) == v(x * 2)(y * 2),
        s"gray sample drift at ($x,$y)")
  }

  test("resizeMedia chains back into decodeMedia with true resized dims") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(24)
    val media = Multimodal.attachMedia(docs, "doc_id")
    val decoded = Multimodal.decodeMedia(Multimodal.resizeMedia(media, maxDim = 16))
    assert(decoded.filter($"width" > 16 || $"height" > 16).count() == 0)
    assert(decoded.count() == 24)
  }

  test("resampleAudio: ceil-div frame count, RMS preserved, pass-through") {
    val hi = Multimodal.synthWavBytes(1L) // id 1 -> 16000 Hz, 411 frames
    val (rate0, n0, ch0, rms0) = Multimodal.decodeAudio(hi)
    assert(rate0 == 16000)
    val down = Multimodal.resampleAudio(hi, 8000)
    val (rate1, n1, ch1, rms1) = Multimodal.decodeAudio(down)
    assert(rate1 == 8000 && ch1 == ch0 && rms1 == rms0)
    assert(n1 == (n0 * 8000 + 16000 - 1) / 16000)
    // at-or-below target: byte-identical pass-through
    val lo = Multimodal.synthWavBytes(0L) // id 0 -> 8000 Hz
    assert(Multimodal.resampleAudio(lo, 8000).sameElements(lo))
  }

  test("band-limited tiers: box filter anti-aliases where NN folds (and matches on DC)") {
    import java.awt.image.BufferedImage
    // image: 2x2 black/white checkerboard, downscaled by 2. NN picks
    // pixel (0,0) of each cell (pure black); the box mean is mid-gray.
    val src = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8)
      src.setRGB(x, y, if ((x + y) % 2 == 0) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val (nnB, _, _) = Multimodal.resizeImage(bos.toByteArray, maxDim = 4)
    val (boxB, bw, bh) = Multimodal.resizeImageArea(bos.toByteArray, maxDim = 4)
    assert((bw, bh) == ((4, 4)), "dims share the ceil-div contract")
    val nn = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(nnB))
    val box = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(boxB))
    assert(nn.getRGB(1, 1) == 0xff000000, "NN aliases the checkerboard to solid")
    assert((box.getRGB(1, 1) & 0xff) == 128, "box filter averages each 2x2 cell")
    // audio: alternating +A/-A samples halved. NN keeps every even
    // sample (RMS = A); the bin mean of (+A, -A) is 0 (RMS = 0).
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val amp = 1000
    val pcm = new Array[Byte](800 * 2)
    for (i <- 0 until 800) {
      val v = if (i % 2 == 0) amp else -amp
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 800)
    val wav = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wav)
    val (_, nnN, _, nnRms) = Multimodal.decodeAudio(
      Multimodal.resampleAudio(wav.toByteArray, 8000))
    val (_, boxN, _, boxRms) = Multimodal.decodeAudio(
      Multimodal.resampleAudioBox(wav.toByteArray, 8000))
    assert(nnN == 400 && boxN == 400, "frame geometry shares the ceil-div contract")
    assert(nnRms == amp, "NN decimation aliases the alternating signal to DC")
    assert(boxRms == 0, "bin mean cancels the above-Nyquist component")
    // DC contract: on a constant signal both tiers agree exactly
    val const = Multimodal.synthWavBytes(1L) // 16 kHz, constant amplitude
    val (_, _, _, r0) = Multimodal.decodeAudio(const)
    val (_, _, _, rNn) = Multimodal.decodeAudio(Multimodal.resampleAudio(const, 8000))
    val (_, _, _, rBox) = Multimodal.decodeAudio(Multimodal.resampleAudioBox(const, 8000))
    assert(rNn == r0 && rBox == r0)
  }

  test("gif multi-frame decode: real frame count, dims, exact per-frame colors") {
    val id = 7L
    val (w, h, nf) = Multimodal.synthVideoParams(id)
    val frames = Multimodal.decodeFrames(Multimodal.synthGifBytes(id))
    assert(frames.size == nf, "reader must see every frame")
    frames.zipWithIndex.foreach { case ((fw, fh, mr, mg, mb), f) =>
      val (r, g, b) = Multimodal.synthFrameColor(id, f)
      assert(fw == w && fh == h, s"frame $f dims")
      assert((mr, mg, mb) == ((r, g, b)),
        s"frame $f color must roundtrip the palette exactly")
    }
    // single-frame edge: id with nf=2 still decodes both; a plain PNG
    // payload reads as one "frame" through the same reader path
    val (pngBytes, _) = Multimodal.synthImageBytes(2L)
    assert(Multimodal.decodeFrames(pngBytes).size == 1)
  }

  test("sampleFrames: stride + cap over real decoded frames") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(40)
    val media = Multimodal.attachVideo(docs, "doc_id")
    val sampled = Multimodal.sampleFrames(media, everyN = 2, maxFrames = 2, partitions = 4)
    assert(sampled.schema == Multimodal.frameSampleSchema)
    val rows = sampled.collect()
    rows.foreach { row =>
      val id = row.getAs[Long]("media_id")
      val (w, h, nf) = Multimodal.synthVideoParams(id)
      val f = row.getAs[Int]("frame_idx")
      assert(row.getAs[Int]("n_frames") == nf)
      assert(f % 2 == 0 && f < 4 && f < nf, s"sampled index $f out of contract")
      assert(row.getAs[Int]("width") == w && row.getAs[Int]("height") == h)
      val (r, g, b) = Multimodal.synthFrameColor(id, f)
      assert(row.getAs[Int]("mean_r") == r && row.getAs[Int]("mean_g") == g &&
        row.getAs[Int]("mean_b") == b)
    }
    // per-media row count: ceil(min(nf, 4) / 2) capped at 2
    val counts = rows.groupBy(_.getAs[Long]("media_id")).view.mapValues(_.length)
    counts.foreach { case (id, c) =>
      val nf = Multimodal.synthVideoParams(id)._3
      assert(c == math.min((nf + 1) / 2, 2), s"row count for $id")
    }
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

  test("dHash64: monotone gradient sets every bit, flat image none, strict-< ties") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y); img.setRGB(x, y, (0xff << 24) | (g << 16) | (g << 8) | g)
      }
      val out = new ByteArrayOutputStream(); ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // 9x8, luma strictly increasing in x → all 64 left<right bits set = -1L
    assert(Multimodal.dHash64(png(9, 8)((x, _) => x * 10)) === -1L)
    // flat → no strict inequality anywhere → 0
    assert(Multimodal.dHash64(png(9, 8)((_, _) => 128)) === 0L)
    // decreasing → also 0 (bit is LEFT < RIGHT only)
    assert(Multimodal.dHash64(png(9, 8)((x, _) => 200 - x * 10)) === 0L)
    // only row 0 has an increase at cell pair (0,1) → bit 0 exactly;
    // 18-wide image: cells are 2px, both pixels of a cell equal
    val oneBit = png(18, 8) { (x, y) => if (y == 0 && x >= 2) 50 else 0 }
    assert(Multimodal.dHash64(oneBit) === 1L)
  }

  test("dhashMedia matches the driver-side hash of the same synthetic bytes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(64)
    val media = Multimodal.attachPatternMedia(docs, "doc_id")
    val out = Multimodal.dhashMedia(media, partitions = 4)
      .orderBy("media_id").as[(Long, Long)].collect()
    out.foreach { case (id, h) =>
      assert(h === Multimodal.dHash64(Multimodal.synthPatternImageBytes(id)),
        s"distributed hash diverged for $id")
    }
    // the gradient corpus must be informative: not all hashes equal
    assert(out.map(_._2).distinct.length > 1)
  }

  test("audioHash64: ramp sets bits, flat is zero, distributed equals driver") {
    // rising pattern waveform: every non-wrap step sets its bit; a
    // CONSTANT signal (the q92 synth corpus) fingerprints to zero
    assert(Multimodal.audioHash64(Multimodal.synthWavBytes(0L)) === 0L)
    val h5 = Multimodal.audioHash64(Multimodal.synthPatternWavBytes(5L))
    assert(h5 !== 0L)
    // distributed path matches the driver-side hash; same-class ids
    // (mod 8192 in the offset) collide exactly
    val docs = spark.range(32).select(col("id").as("doc_id"))
    val out = Multimodal.audioHashMedia(
        Multimodal.attachPatternAudio(docs, "doc_id"), partitions = 4)
      .orderBy("media_id").as[(Long, Long)].collect()
    out.foreach { case (id, h) =>
      assert(h === Multimodal.audioHash64(Multimodal.synthPatternWavBytes(id)))
    }
    assert(out.map(_._2).distinct.length > 1, "fingerprints must be informative")
    // the banded near-dup machinery is fingerprint-agnostic: renaming
    // the column reuses the q167 path for audio
    val stats = Multimodal.dhashNearDupStats(
      Multimodal.audioHashMedia(Multimodal.attachPatternAudio(docs, "doc_id"))
        .withColumnRenamed("ahash", "dhash"), maxHamming = 3)
    assert(stats.columns.sameElements(Array("hamming", "n_pairs")))
  }

  test("dhashNearDupPairs: banding finds every pair <= 3 bits, classes multiply") {
    // distinct hashes: h1; h2 = h1 with 2 low bits flipped (band 0
    // differs, bands 1-3 agree → candidate, hamming 2); h3 = h1 with
    // one bit flipped in EACH band (no shared band → never a
    // candidate; hamming 4 would be filtered anyway)
    val h1 = 0x0123456789abcdefL
    val h2 = h1 ^ 0x3L
    val h3 = h1 ^ 0x0001000100010001L
    // class sizes: h1×3, h2×2, h3×1
    val hashes = (Seq.fill(3)(h1) ++ Seq.fill(2)(h2) ++ Seq(h3))
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("media_id", "dhash")
    val pairs = Multimodal.dhashNearDupPairs(hashes, maxHamming = 3)
      .select("dhash_a", "dhash_b", "hamming", "n_pairs")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs === Set(
      (h1, h1, 0L, 3L),                                  // C(3,2) within h1
      (h2, h2, 0L, 1L),                                  // C(2,2) within h2
      (math.min(h1, h2), math.max(h1, h2), 2L, 6L)))     // 3·2 across
    val stats = Multimodal.dhashNearDupStats(hashes, maxHamming = 3)
      .orderBy("hamming").as[(Long, Long)].collect()
    assert(stats === Array((0L, 4L), (2L, 6L)))
  }
}
