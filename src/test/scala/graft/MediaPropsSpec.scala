package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.operators.Multimodal

/** Property sweeps for the media roundtrips (the geohash-style
  * fixed-seed Gen walk, GeometryPropsSpec): resize→decode and
  * resample→decode over arbitrary dims/rates including the 1-pixel and
  * 1-frame edges. The NN contracts have closed-form ground truth
  * (ceil-div geometry, exact source-index pixel/frame copies), so
  * every property checks against that arithmetic, not against the
  * implementation.
  */
class MediaPropsSpec extends AnyFunSuite {

  /** Deterministic sampling loop (scalatest+scalacheck bridge isn't on
    * the classpath; a fixed-seed Gen walk gives the same coverage).
    */
  private def forAll[A](g: Gen[A], n: Int = 80)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(params, seed).foreach { a => body(a); i += 1 }
      seed = seed.next
    }
  }

  // --- images ---------------------------------------------------------

  private case class Img(w: Int, h: Int, maxDim: Int, seed: Long)
  private val img: Gen[Img] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 40)
    m <- Gen.chooseNum(1, 48)
    s <- Gen.chooseNum(0L, 1L << 40)
  } yield Img(w, h, m, s)

  /** Deterministic pseudo-random opaque-ish ARGB pixel per position. */
  private def pxAt(seed: Long)(x: Int, y: Int): Int = {
    val r = new java.util.Random(seed * 31 + x * 7919 + y * 104729)
    (r.nextInt() & 0x00ffffff) | ((64 + r.nextInt(192)) << 24)
  }

  private def argbPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (x <- 0 until w; y <- 0 until h) im.setRGB(x, y, pxAt(seed)(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("resizeImage property: ceil-div dims and exact NN pixels at any size") {
    forAll(img) { case Img(w, h, m, seed) =>
      val bytes = argbPng(w, h, seed)
      val (out, ow, oh) = Multimodal.resizeImage(bytes, m)
      val g = math.max(w, h)
      if (g <= m) {
        assert((ow, oh) == ((w, h)), s"in-box must keep dims ($w x $h, box $m)")
        assert(out.sameElements(bytes), "in-box PNG must pass through byte-identical")
      } else {
        assert(ow == ((w.toLong * m + g - 1) / g).toInt &&
          oh == ((h.toLong * m + g - 1) / g).toInt,
          s"ceil-div dims for ($w x $h, box $m), got ($ow x $oh)")
        assert(math.max(ow, oh) <= m && ow >= 1 && oh >= 1)
        val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
        for (x <- 0 until ow; y <- 0 until oh)
          assert(dec.getRGB(x, y) ==
            pxAt(seed)((x.toLong * w / ow).toInt, (y.toLong * h / oh).toInt),
            s"NN pixel mismatch at ($x,$y) for ($w x $h -> $ow x $oh)")
      }
    }
  }

  test("resizeImage property: gray rasters keep exact samples at any size") {
    forAll(img, n = 60) { case Img(w, h, m, seed) =>
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      def gAt(x: Int, y: Int) = ((seed + x * 131 + y * 31) % 256).toInt
      for (x <- 0 until w; y <- 0 until h)
        im.getRaster.setSample(x, y, 0, gAt(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      val (out, ow, oh) = Multimodal.resizeImage(bos.toByteArray, m)
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
      assert(dec.getColorModel.getNumComponents == 1)
      for (x <- 0 until ow; y <- 0 until oh)
        assert(dec.getRaster.getSample(x, y, 0) ==
          gAt((x.toLong * w / ow).toInt, (y.toLong * h / oh).toInt))
    }
  }

  test("resizeImageArea property: shares NN dims; equals NN exactly on solid rasters") {
    forAll(img, n = 60) { case Img(w, h, m, seed) =>
      val color = (pxAt(seed)(0, 0) & 0x00ffffff) | 0xff000000
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      for (x <- 0 until w; y <- 0 until h) im.setRGB(x, y, color)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      val (nn, nw, nh) = Multimodal.resizeImage(bos.toByteArray, m)
      val (box, bw, bh) = Multimodal.resizeImageArea(bos.toByteArray, m)
      assert((bw, bh) == ((nw, nh)), "box shares the NN ceil-div geometry")
      val dnn = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(nn))
      val dbox = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(box))
      for (x <- 0 until bw; y <- 0 until bh)
        assert(dbox.getRGB(x, y) == dnn.getRGB(x, y) && dbox.getRGB(x, y) == color,
          "any correct averaging filter is exact on a solid raster")
    }
  }

  // --- audio ----------------------------------------------------------

  private case class Wav(rate: Int, frames: Int, ch: Int, target: Int, seed: Long)
  private val rates = Seq(8000, 11025, 16000, 22050, 44100)
  private val wav: Gen[Wav] = for {
    r <- Gen.oneOf(rates)
    n <- Gen.chooseNum(1, 1200)
    c <- Gen.chooseNum(1, 2)
    t <- Gen.oneOf(rates)
    s <- Gen.chooseNum(0L, 1L << 40)
  } yield Wav(r, n, c, t, s)

  /** Deterministic pseudo-random 16-bit sample per (frame, channel). */
  private def sampleAt(seed: Long)(f: Long, c: Int): Short =
    (((seed * 6364136223846793005L + f * 9007199254740881L + c * 2147483647L)
      >>> 17) & 0xffff).toShort

  private def pcmWav(w: Wav): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(w.rate.toFloat, 16, w.ch, true, false)
    val pcm = new Array[Byte](w.frames * w.ch * 2)
    for (f <- 0 until w.frames; c <- 0 until w.ch) {
      val v = sampleAt(w.seed)(f, c)
      val off = (f * w.ch + c) * 2
      pcm(off) = (v & 0xff).toByte; pcm(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, w.frames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def readSamples(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      val pcm = ais.readAllBytes()
      val out = new Array[Short](pcm.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, out)
    } finally ais.close()
  }

  test("resampleAudio property: ceil-div frames and exact NN samples at any rate/length") {
    forAll(wav) { case w @ Wav(rate, n, ch, target, seed) =>
      val bytes = pcmWav(w)
      val out = Multimodal.resampleAudio(bytes, target)
      if (rate <= target) assert(out.sameElements(bytes),
        "at-or-below target must pass through byte-identical")
      else {
        val (oRate, oCh, samples) = readSamples(out)
        val outN = (n.toLong * target + rate - 1) / rate
        assert(oRate == target && oCh == ch)
        assert(samples.length == outN * ch, s"frames: got ${samples.length / ch}, want $outN")
        for (f <- 0L until outN; c <- 0 until ch)
          assert(samples((f * ch + c).toInt) == sampleAt(seed)(f * n / outN, c),
            s"NN frame mismatch at out-frame $f ch $c ($rate -> $target, n=$n)")
      }
    }
  }

  test("resampleAudioBox property: NN frame geometry; exact on constant signals") {
    forAll(wav, n = 60) { case Wav(rate, n, ch, target, seed) =>
      // constant signal: every bin mean IS the amplitude
      val amp = (seed % 16384).toInt
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch, true, false)
      val pcm = new Array[Byte](n * ch * 2)
      var i = 0
      while (i < pcm.length) {
        pcm(i) = (amp & 0xff).toByte; pcm(i + 1) = ((amp >> 8) & 0xff).toByte
        i += 2
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val bytes = bos.toByteArray
      val out = Multimodal.resampleAudioBox(bytes, target)
      if (rate <= target) assert(out.sameElements(bytes))
      else {
        val (oRate, oCh, samples) = readSamples(out)
        val outN = (n.toLong * target + rate - 1) / rate
        assert(oRate == target && oCh == ch && samples.length == outN * ch)
        assert(samples.forall(_ == amp.toShort),
          "bin means of a constant signal are the constant, exactly")
      }
    }
  }
}
