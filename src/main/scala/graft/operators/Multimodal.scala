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
  * Image decode AND resize are REAL: `javax.imageio` (JDK-built-in
  * PNG/JPEG codecs, no external dependency) reads the bytes and
  * reports true width/height/channels plus per-channel mean features;
  * [[resizeImage]] resamples actual rasters (deterministic
  * nearest-neighbor) and re-encodes. Audio decode is real too
  * (javax.sound.sampled WAV/PCM), and multi-frame video/animation
  * decode is real for GIF ([[decodeFrames]]/[[sampleFrames]] via the
  * JDK's multi-image GIF reader). Containers whose codecs are not in
  * the JDK (mp4/webm) decode through the OPTIONAL ffmpeg binding
  * ([[sampleFramesVideo]]) when a binary is deployed, and keep the
  * metadata plan ([[planFrameSample]]) otherwise — the distributed
  * plumbing is identical either way.
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

  /** The shared partition-batched media transform scaffold: one task
    * processes its whole partition via an iterator (the JVM-side analog
    * of a pandas-UDF `mapInPandas` batch loop — amortizes per-batch
    * codec setup, never collects to the driver). Repartition upstream
    * (`partitions > 0`) to bound batch memory. Rows arrive positional
    * (media_id, bytes, format): when chained after another
    * mapPartitions they flow object-to-object (GenericRow, no schema).
    */
  private def mapMedia(media: DataFrame, partitions: Int,
      schema: StructType)(f: Row => Row): DataFrame = {
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    src.select("media_id", "bytes", "format").mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition codec setup, once
      rows.map(f)
    }(enc)
  }

  /** Partition-batched decode (see [[mapMedia]]). */
  def decodeMedia(media: DataFrame, partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, decodedSchema) { r =>
      val (w, h, c, f) = decodeImage(r.get(1).asInstanceOf[Array[Byte]])
      Row(r.getLong(0), w, h, c, f.toSeq)
    }

  // --- audio: REAL WAV/PCM codec via javax.sound.sampled (JDK) --------

  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("rms", LongType, nullable = false)))

  /** Deterministic audio parameters for the synthetic corpus — the q92
    * oracle contract (the DuckDB side restates exactly this
    * arithmetic): sample rate from a fixed 4-rate set, frame count and
    * channel count from the id, and a CONSTANT sample amplitude so the
    * decoded RMS equals the amplitude exactly (integer-exact: RMS of a
    * constant signal is that constant).
    */
  def synthAudioParams(id: Long): (Int, Long, Int, Int) = {
    val rate = (id % 4) match {
      case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
    }
    (rate, 400L + (id * 11) % 800, 1 + (id % 2).toInt, ((id * 5) % 16384).toInt)
  }

  // --- direct SPI access for the audio codec hot loops --------------
  //
  // AudioSystem's static entry points funnel EVERY call through a
  // synchronized provider lookup (sun.media JDK13Services), which
  // convoys partition-parallel codec maps: measured on the ×8 corpus,
  // 8 threads through AudioSystem ran 3× SLOWER than one thread.
  // Resolving the java.desktop-declared providers ONCE per JVM via the
  // public ServiceLoader SPI and dispatching to them directly keeps
  // the identical real-codec semantics (same provider objects, same
  // parse) with zero shared state between rows.

  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    // WAV-capable readers FIRST: the JDK's provider list includes
    // SoftMidiAudioFileReader, whose probe routes through MidiSystem —
    // the same synchronized registry this cache exists to avoid; tried
    // first it would re-serialize every row's decode
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
      .sortBy(r => if (r.getClass.getSimpleName.startsWith("Wave")) 0 else 1)
  }

  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toSeq
  }

  /** [[javax.sound.sampled.AudioSystem.getAudioInputStream]] without
    * the per-call synchronized registry walk (same providers, cached).
    */
  private def wavInput(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      // fresh stream per provider attempt (wraps the same array, no
      // copy): a provider that mark()s at a non-zero offset and throws
      // without restoring would leave a shared stream mispositioned
      // for the next provider
      try return r.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed provider reads this audio payload")
  }

  /** [[javax.sound.sampled.AudioSystem.write]] (WAVE) without the
    * per-call synchronized registry walk.
    */
  private def writeWave(ais: javax.sound.sampled.AudioInputStream,
      out: java.io.OutputStream): Unit = {
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(wave, ais)) match {
      case Some(w) => w.write(ais, wave, out)
      case None => throw new IllegalArgumentException(
        "no installed provider writes WAVE for this stream")
    }
  }

  /** Encode one deterministic 16-bit signed little-endian PCM WAV.
    * Runs on executors inside [[attachAudio]]'s partition loop.
    */
  def synthWavBytes(id: Long): Array[Byte] = {
    val (rate, frames, channels, amp) = synthAudioParams(id)
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true, false) // signed, little-endian
    val pcm = new Array[Byte]((frames * channels * 2).toInt)
    var i = 0
    while (i < pcm.length) {
      pcm(i) = (amp & 0xff).toByte
      pcm(i + 1) = ((amp >> 8) & 0xff).toByte
      i += 2
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames)
    val out = new ByteArrayOutputStream()
    writeWave(ais, out)
    out.toByteArray
  }

  /** Build a REAL audio media column from an id source (the audio
    * analog of [[attachMedia]]).
    */
  def attachAudio(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(0)
        Row(id, synthWavBytes(id), "wav")
      }
    }(enc)
  }

  /** Real audio decode for one WAV payload: true header sample rate /
    * channel count / frame length from the parsed format, plus the RMS
    * of the 16-bit PCM samples (rounded to a long; exact for the
    * constant-amplitude synth corpus).
    */
  def decodeAudio(bytes: Array[Byte]): (Int, Long, Int, Long) = {
    val ais = wavInput(bytes)
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16, "expected 16-bit PCM")
      val frames = ais.getFrameLength
      val pcm = ais.readAllBytes()
      var sumSq = 0.0
      var n = 0L
      var i = 0
      val le = !fmt.isBigEndian
      while (i + 1 < pcm.length) {
        val v = if (le) ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
                else ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
        sumSq += v.toDouble * v.toDouble
        n += 1
        i += 2
      }
      val rms = if (n == 0) 0L else math.round(math.sqrt(sumSq / n))
      (fmt.getSampleRate.toInt, frames, fmt.getChannels, rms)
    } finally ais.close()
  }

  /** REAL audio resample — read the PCM frames, nearest-neighbor frame
    * decimation to `targetRate` (no upsampling: payloads at or below
    * the target pass through byte-identical), re-encode WAV. Frame
    * mapping is integer arithmetic (`srcFrame = i*n/outN` with
    * `outN = (n*target + rate - 1)/rate` — the audio analog of
    * [[resizeImage]]'s ceil-div/NN contract), so an external oracle
    * re-derives the output geometry exactly; a constant-amplitude
    * signal keeps its RMS bit-for-bit.
    */
  def resampleAudio(bytes: Array[Byte], targetRate: Int): Array[Byte] = {
    val ais = wavInput(bytes)
    try {
      val fmt = ais.getFormat
      val rate = fmt.getSampleRate.toInt
      if (rate <= targetRate) return bytes
      val n = ais.getFrameLength
      val fs = fmt.getFrameSize
      val pcm = ais.readAllBytes()
      val outN = (n * targetRate + rate - 1) / rate
      val out = new Array[Byte]((outN * fs).toInt)
      var i = 0L
      while (i < outN) {
        val src = i * n / outN
        System.arraycopy(pcm, (src * fs).toInt, out, (i * fs).toInt, fs)
        i += 1
      }
      // preserve the input's encoding (PCM_SIGNED vs PCM_UNSIGNED —
      // 8-bit WAV is unsigned; forcing signed would break the writer
      // or mislabel the samples)
      val ofmt = new javax.sound.sampled.AudioFormat(fmt.getEncoding,
        targetRate.toFloat, fmt.getSampleSizeInBits, fmt.getChannels,
        fs, targetRate.toFloat, fmt.isBigEndian)
      val oais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(out), ofmt, outN)
      val bos = new ByteArrayOutputStream()
      writeWave(oais, bos)
      bos.toByteArray
    } finally ais.close()
  }

  /** REAL mean-of-bin audio downsample — the BAND-LIMITED tier beside
    * [[resampleAudio]]'s nearest-neighbor frame decimation. NN is the
    * right deterministic oracle contract but aliases (frequencies above
    * the new Nyquist fold down); averaging each output frame's source
    * bin is the piecewise-constant anti-alias prefilter. Frame geometry
    * shares the NN ceil-div contract (`outN = (n*target + rate - 1)/
    * rate`, bin `[i*n/outN, max(i*n/outN+1, (i+1)*n/outN))`); each
    * output sample is the rounded per-channel bin mean, so a
    * CONSTANT-amplitude signal keeps its RMS exactly (the q103 oracle)
    * while the spec's alternating-sign fixture proves NN and box
    * genuinely differ. 16-bit PCM only (the decode contract).
    */
  def resampleAudioBox(bytes: Array[Byte], targetRate: Int): Array[Byte] = {
    val ais = wavInput(bytes)
    try {
      val fmt = ais.getFormat
      val rate = fmt.getSampleRate.toInt
      if (rate <= targetRate) return bytes
      require(fmt.getSampleSizeInBits == 16, "expected 16-bit PCM")
      val n = ais.getFrameLength
      val ch = fmt.getChannels
      val fs = fmt.getFrameSize
      val le = !fmt.isBigEndian
      val pcm = ais.readAllBytes()
      def sample(frame: Long, c: Int): Int = {
        val off = (frame * fs).toInt + c * 2
        if (le) ((pcm(off + 1) << 8) | (pcm(off) & 0xff)).toShort.toInt
        else ((pcm(off) << 8) | (pcm(off + 1) & 0xff)).toShort.toInt
      }
      val outN = (n * targetRate + rate - 1) / rate
      val out = new Array[Byte]((outN * fs).toInt)
      var i = 0L
      while (i < outN) {
        val f0 = i * n / outN
        val f1 = math.max(f0 + 1, (i + 1) * n / outN)
        var c = 0
        while (c < ch) {
          var s = 0L
          var f = f0
          while (f < f1) { s += sample(f, c); f += 1 }
          val v = math.round(s.toDouble / (f1 - f0)).toInt
          val off = (i * fs).toInt + c * 2
          if (le) { out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte }
          else { out(off) = ((v >> 8) & 0xff).toByte; out(off + 1) = (v & 0xff).toByte }
          c += 1
        }
        i += 1
      }
      val ofmt = new javax.sound.sampled.AudioFormat(fmt.getEncoding,
        targetRate.toFloat, fmt.getSampleSizeInBits, ch, fs,
        targetRate.toFloat, fmt.isBigEndian)
      val oais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(out), ofmt, outN)
      val bos = new ByteArrayOutputStream()
      writeWave(oais, bos)
      bos.toByteArray
    } finally ais.close()
  }

  /** Partition-batched real resample over opaque audio payloads — the
    * q100 surface; chains straight back into [[decodeAudioMedia]].
    */
  def resampleAudioMedia(media: DataFrame, targetRate: Int,
      partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, mediaSchema) { r =>
      Row(r.getLong(0),
        resampleAudio(r.get(1).asInstanceOf[Array[Byte]], targetRate), "wav")
    }

  /** [[resampleAudioMedia]] on the band-limited [[resampleAudioBox]]
    * tier — the q103 surface.
    */
  def resampleAudioMediaBox(media: DataFrame, targetRate: Int,
      partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, mediaSchema) { r =>
      Row(r.getLong(0),
        resampleAudioBox(r.get(1).asInstanceOf[Array[Byte]], targetRate), "wav")
    }

  /** Partition-batched audio decode (see [[mapMedia]]). */
  def decodeAudioMedia(media: DataFrame, partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, decodedAudioSchema) { r =>
      val (rate, frames, ch, rms) = decodeAudio(r.get(1).asInstanceOf[Array[Byte]])
      Row(r.getLong(0), rate, frames, ch, rms)
    }

  /** REAL raster resize — decode, nearest-neighbor resample into the
    * aspect-preserving `maxDim` box, re-encode as (lossless) PNG.
    * Nearest-neighbor with integer source-index arithmetic
    * (`srcX = x*w/ow`) rather than a JDK interpolator, so the resampled
    * raster is bit-deterministic on any JVM; output dims use integer
    * ceil-division (`(w*maxDim + g - 1)/g`, g = max(w,h)) so an
    * external oracle re-derives them without floating point. Channel
    * count is preserved for gray / RGB / ARGB rasters; gray+alpha
    * promotes to ARGB (the JDK has no gray+alpha BufferedImage type).
    * A PNG payload that already fits the box passes through
    * byte-identical (the audio-path contract); other formats re-encode
    * to PNG even when in-box. Returns (png bytes, outWidth, outHeight).
    */
  def resizeImage(bytes: Array[Byte], maxDim: Int): (Array[Byte], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "no JDK ImageReader could decode the payload")
    val w = img.getWidth; val h = img.getHeight
    val g = math.max(w, h)
    val isPng = bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
    if (g <= maxDim && isPng) return (bytes, w, h)
    val (ow, oh) =
      if (g <= maxDim) (w, h)
      else (((w.toLong * maxDim + g - 1) / g).toInt,
            ((h.toLong * maxDim + g - 1) / g).toInt)
    val kind = img.getColorModel.getNumComponents match {
      case 1 => java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      case 3 => java.awt.image.BufferedImage.TYPE_INT_RGB
      case _ => java.awt.image.BufferedImage.TYPE_INT_ARGB
    }
    val out = new java.awt.image.BufferedImage(ow, oh, kind)
    val gray = kind == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    // gray rasters copy raw samples (setRGB would roundtrip each pixel
    // through sRGB<->gray conversion, shifting values by quantization —
    // the exact-pixel NN contract must hold for gray like it does ARGB)
    val ir = if (gray) img.getRaster else null
    val or = if (gray) out.getRaster else null
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * w / ow).toInt
        if (gray) or.setSample(x, y, 0, ir.getSample(sx, sy, 0))
        else out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    (bos.toByteArray, ow, oh)
  }

  /** REAL area-average (box-filter) raster downscale — the BAND-LIMITED
    * tier beside [[resizeImage]]'s nearest-neighbor contract. NN is the
    * right deterministic oracle contract but aliases on real media
    * (high-frequency content folds into the output); the box filter
    * averages each output pixel's source bin, which is the piecewise-
    * constant anti-alias prefilter. Output dims share the NN ceil-div
    * contract; each output pixel is the rounded per-channel mean over
    * the integer source bin `[x*w/ow, max(x*w/ow+1, (x+1)*w/ow))` — on
    * a solid-color raster ANY correct averaging filter is exact, which
    * is what lets q102 share q99's oracle arithmetic while the spec's
    * checkerboard fixture proves the two tiers genuinely differ.
    */
  def resizeImageArea(bytes: Array[Byte], maxDim: Int): (Array[Byte], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "no JDK ImageReader could decode the payload")
    val w = img.getWidth; val h = img.getHeight
    val g = math.max(w, h)
    val isPng = bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
    if (g <= maxDim && isPng) return (bytes, w, h)
    val (ow, oh) =
      if (g <= maxDim) (w, h)
      else (((w.toLong * maxDim + g - 1) / g).toInt,
            ((h.toLong * maxDim + g - 1) / g).toInt)
    val kind = img.getColorModel.getNumComponents match {
      case 1 => java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      case 3 => java.awt.image.BufferedImage.TYPE_INT_RGB
      case _ => java.awt.image.BufferedImage.TYPE_INT_ARGB
    }
    val out = new java.awt.image.BufferedImage(ow, oh, kind)
    val gray = kind == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    val ir = if (gray) img.getRaster else null
    val or = if (gray) out.getRaster else null
    var y = 0
    while (y < oh) {
      val y0 = (y.toLong * h / oh).toInt
      val y1 = math.max(y0 + 1, ((y + 1).toLong * h / oh).toInt)
      var x = 0
      while (x < ow) {
        val x0 = (x.toLong * w / ow).toInt
        val x1 = math.max(x0 + 1, ((x + 1).toLong * w / ow).toInt)
        val cnt = (x1 - x0).toLong * (y1 - y0)
        if (gray) {
          var s = 0L
          var sy = y0
          while (sy < y1) {
            var sx = x0
            while (sx < x1) { s += ir.getSample(sx, sy, 0); sx += 1 }
            sy += 1
          }
          or.setSample(x, y, 0, math.round(s.toDouble / cnt).toInt)
        } else {
          var sa = 0L; var sr = 0L; var sg = 0L; var sb = 0L
          var sy = y0
          while (sy < y1) {
            var sx = x0
            while (sx < x1) {
              val p = img.getRGB(sx, sy)
              sa += (p >>> 24) & 0xff; sr += (p >>> 16) & 0xff
              sg += (p >>> 8) & 0xff; sb += p & 0xff
              sx += 1
            }
            sy += 1
          }
          def m(s: Long) = math.round(s.toDouble / cnt).toInt
          out.setRGB(x, y, (m(sa) << 24) | (m(sr) << 16) | (m(sg) << 8) | m(sb))
        }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    (bos.toByteArray, ow, oh)
  }

  /** Partition-batched real resize over opaque image payloads — the
    * q99 surface. Output rows keep the binary column shape of
    * [[attachMedia]] (media_id, bytes, format) plus the realized dims,
    * so the result chains straight back into [[decodeMedia]].
    */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false)))

  def resizeMedia(media: DataFrame, maxDim: Int, partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, resizedSchema) { r =>
      val (b, ow, oh) = resizeImage(r.get(1).asInstanceOf[Array[Byte]], maxDim)
      Row(r.getLong(0), b, "png", ow, oh)
    }

  /** [[resizeMedia]] on the band-limited [[resizeImageArea]] tier —
    * the q102 surface.
    */
  def resizeMediaArea(media: DataFrame, maxDim: Int, partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, resizedSchema) { r =>
      val (b, ow, oh) = resizeImageArea(r.get(1).asInstanceOf[Array[Byte]], maxDim)
      Row(r.getLong(0), b, "png", ow, oh)
    }

  // --- video/animation: REAL multi-frame decode via the JDK GIF
  // ImageReader (getNumImages/read(i) — the one multi-frame container
  // format the JDK ships a codec for) --------------------------------

  /** Deterministic animation parameters for the synthetic corpus — the
    * q101 oracle contract: frame dims and frame count from the id.
    */
  def synthVideoParams(id: Long): (Int, Int, Int) =
    (8 + ((id * 3) % 24).toInt, 8 + ((id * 5) % 24).toInt, 2 + (id % 4).toInt)

  /** Solid fill color of frame `f` of animation `id` — every frame of
    * one animation differs, so only a real per-frame decode matches.
    */
  def synthFrameColor(id: Long, f: Int): (Int, Int, Int) =
    (((id * 3 + f * 29) % 256).toInt, ((id * 5 + f * 53) % 256).toInt,
      ((id * 7 + f * 71) % 256).toInt)

  /** Encode one deterministic N-frame animated GIF. Frames are written
    * TYPE_BYTE_INDEXED with an explicit one-color palette: GIF is
    * palettized, and handing the writer a truecolor raster would let it
    * quantize — the explicit palette keeps the per-frame colors
    * byte-exact for the oracle. Runs on executors inside
    * [[attachVideo]]'s partition loop.
    */
  def synthGifBytes(id: Long): Array[Byte] = {
    val (w, h, nf) = synthVideoParams(id)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nf) {
        val (r, g, b) = synthFrameColor(id, f)
        val cmap = Array(0xff000000 | (r << 16) | (g << 8) | b, 0xff000000)
        val icm = new java.awt.image.IndexColorModel(1, 2, cmap, 0, false, -1,
          java.awt.image.DataBuffer.TYPE_BYTE)
        // fresh raster is all index 0 -> the frame color everywhere
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Build a REAL animated-media column from an id source (the video
    * analog of [[attachMedia]]).
    */
  def attachVideo(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { row =>
        val id = row.getLong(0)
        Row(id, synthGifBytes(id), "gif")
      }
    }(enc)
  }

  /** Real multi-frame decode for one animated payload: the JDK reader's
    * true frame count, then per frame the dims and the rounded
    * per-channel mean pixel (exact for the solid synth frames).
    */
  def decodeFrames(bytes: Array[Byte]): Seq[(Int, Int, Int, Int, Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no JDK ImageReader could decode the payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).map { i =>
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val np = w.toLong * h
          (w, h, math.round(sr.toDouble / np).toInt,
            math.round(sg.toDouble / np).toInt, math.round(sb.toDouble / np).toInt)
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  val frameSampleSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", IntegerType, nullable = false),
    StructField("mean_g", IntegerType, nullable = false),
    StructField("mean_b", IntegerType, nullable = false)))

  /** Partition-batched REAL frame sampling over animated payloads — the
    * q101 surface: decode every frame, keep every `everyN`-th up to
    * `maxFrames`, one output row per sampled frame with its true dims
    * and mean color. This is what [[planFrameSample]] only planned:
    * for gif the JDK reader closes the loop; other containers keep the
    * metadata plan until a deployment slots an ffmpeg binding into this
    * same partition-batched shape.
    */
  def sampleFrames(media: DataFrame, everyN: Int, maxFrames: Int,
      partitions: Int = 0): DataFrame = {
    require(everyN > 0 && maxFrames > 0, "everyN and maxFrames must be positive")
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSampleSchema)
    src.select("media_id", "bytes", "format").mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val frames = decodeFrames(r.get(1).asInstanceOf[Array[Byte]])
        frames.zipWithIndex.collect {
          case ((w, h, mr, mg, mb), i) if i % everyN == 0 && i / everyN < maxFrames =>
            Row(r.getLong(0), frames.size, i, w, h, mr, mg, mb)
        }
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

  /** Frame sampling PLAN for video-shaped media: every nth frame index
    * up to a cap, pure metadata from a caller-supplied frame count. For
    * gif payloads [[sampleFrames]] supersedes this with the real
    * decode; the plan remains the pre-pass for containers whose codecs
    * are not in the JDK (a deployment slots ffmpeg here — see
    * [[sampleFramesVideo]]).
    */
  def planFrameSample(media: DataFrame, frameCount: Int, everyN: Int, maxFrames: Int): DataFrame =
    media.withColumn("frame_indices",
      slice(sequence(lit(0), lit(frameCount - 1), lit(everyN)), 1, maxFrames))

  // --- optional ffmpeg binding for non-JDK containers (mp4/webm) ------
  //
  // The GEOS-add-on pattern (reference geos/ + tests/geos/oracle.py —
  // an optional native library the core never requires) applied to the
  // last media boundary: when an ffmpeg binary is DEPLOYED, mp4/webm
  // payloads really decode, through the same partition-batched map
  // shape as the JDK GIF tier; with no binary the same call degrades
  // to planFrameSample's metadata rows, flagged so callers can tell
  // which tier served them. Resolution order: `graft.ffmpeg` system
  // property (tests inject a fake binary), GRAFT_FFMPEG env, PATH.

  /** The deployed ffmpeg binary, if any — resolved per call,
    * driver-side (the path is captured into the executor closure).
    */
  def ffmpegPath(): Option[String] =
    sys.props.get("graft.ffmpeg")
      .orElse(sys.env.get("GRAFT_FFMPEG"))
      .orElse(sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
        .map(d => java.nio.file.Paths.get(d, "ffmpeg"))
        .find(p => java.nio.file.Files.isExecutable(p))
        .map(_.toString))
      .filter(p => java.nio.file.Files.isExecutable(java.nio.file.Paths.get(p)))

  /** The exact argv the subprocess runs — exposed so the spec can pin
    * that SAMPLING IS PUSHED INTO FFMPEG: `select=not(mod(n\,everyN))`
    * drops non-sampled frames before they reach stdout and
    * `-frames:v maxFrames` stops the decode entirely once the budget
    * is emitted, so the pipe carries at most `maxFrames` frames no
    * matter how long the clip is (a 1080p multi-minute payload used
    * to stream tens of GB of raw PPM through the old decode-everything
    * argv). `-fps_mode vfr` keeps ffmpeg from re-duplicating the
    * dropped frames to hold the input rate.
    */
  private[graft] def ffmpegArgs(bin: String, input: String, everyN: Int,
      maxFrames: Int): Seq[String] =
    Seq(bin, "-v", "error", "-i", input,
      "-vf", s"select=not(mod(n\\,$everyN))", "-fps_mode", "vfr",
      "-frames:v", maxFrames.toString,
      "-f", "image2pipe", "-vcodec", "ppm", "-")

  /** Wall-clock bound on one payload's decode (a damaged stream can
    * make ffmpeg spin); the watchdog destroys the subprocess when it
    * trips, which EOFs the pipe and fails the parse instead of
    * hanging the executor task forever.
    */
  private def ffmpegTimeoutSec: Long =
    sys.props.get("graft.ffmpeg.timeout.sec").map(_.toLong).getOrElse(600L)

  /** One payload through ffmpeg → per-SAMPLED-frame (w, h, meanR,
    * meanG, meanB), at most `maxFrames` of them (original frame index
    * of result k is k·everyN — the select filter's contract). The
    * container demuxes from a temp FILE (stdin defeats mp4 moov
    * seeking); sampled frames stream back as concatenated binary PPM
    * (P6) on stdout and are folded into per-frame stats INCREMENTALLY
    * off the pipe (fixed 64 KiB buffer — never the whole stream in
    * memory). stderr is redirected to a temp file, draining it
    * concurrently with stdout so a chatty failure can never fill the
    * pipe and deadlock both processes.
    */
  private[graft] def decodeFramesFfmpeg(bin: String, bytes: Array[Byte],
      format: String, everyN: Int, maxFrames: Int): Seq[(Int, Int, Int, Int, Int)] = {
    val tmp = java.nio.file.Files.createTempFile("graft-video",
      "." + Option(format).getOrElse("bin"))
    val errf = java.nio.file.Files.createTempFile("graft-video", ".err")
    try {
      java.nio.file.Files.write(tmp, bytes)
      val pb = new ProcessBuilder(ffmpegArgs(bin, tmp.toString, everyN, maxFrames): _*)
      pb.redirectError(errf.toFile)
      val p = pb.start()
      p.getOutputStream.close()
      val limit = ffmpegTimeoutSec
      // kill the whole tree: a wrapper script's child inherits the
      // stdout pipe, so destroying only the direct process would leave
      // the write end open and the parse blocked short of EOF
      def destroyTree(): Unit = {
        p.descendants().forEach(h => { h.destroyForcibly(); () })
        p.destroyForcibly()
        ()
      }
      val watchdog = new Thread(() => {
        try { if (!p.waitFor(limit, java.util.concurrent.TimeUnit.SECONDS)) destroyTree() }
        catch { case _: InterruptedException => () }
      }, "graft-ffmpeg-watchdog")
      watchdog.setDaemon(true)
      watchdog.start()
      try {
        val frames =
          try parsePpmFrames(p.getInputStream, maxFrames)
          finally p.getInputStream.close()
        if (frames.size >= maxFrames) {
          // budget filled — the subprocess should be exiting on its own
          // (-frames:v), but a binary that ignores the cap must not
          // stall us or fail the row: we have everything we asked for
          destroyTree()
          frames
        } else {
          val done = p.waitFor(limit, java.util.concurrent.TimeUnit.SECONDS)
          if (!done) { destroyTree(); throw new IllegalStateException(
            s"ffmpeg did not exit within ${limit}s") }
          val code = p.exitValue()
          require(code == 0, s"ffmpeg exited $code: " +
            new String(java.nio.file.Files.readAllBytes(errf),
              java.nio.charset.StandardCharsets.UTF_8).take(300))
          frames
        }
      } finally watchdog.interrupt()
    } finally {
      java.nio.file.Files.deleteIfExists(tmp)
      java.nio.file.Files.deleteIfExists(errf)
    }
  }

  /** Whole-array PPM parse (fixtures, tests): the streaming parser
    * over an in-memory stream, no frame cap.
    */
  private[graft] def parsePpmStream(bytes: Array[Byte]): Seq[(Int, Int, Int, Int, Int)] =
    parsePpmFrames(new java.io.ByteArrayInputStream(bytes), Int.MaxValue)

  /** Incrementally parse a concatenated binary-PPM (P6) stream into
    * per-frame dims and rounded mean colors, stopping after
    * `maxFrames` frames WITHOUT reading the rest of the stream.
    * Memory is one 64 KiB buffer regardless of frame size or count —
    * the executor-side half of the sample-bounded decode contract.
    */
  private[graft] def parsePpmFrames(in: java.io.InputStream,
      maxFrames: Int): Seq[(Int, Int, Int, Int, Int)] = {
    val s = new java.io.BufferedInputStream(in, 1 << 16)
    val frames = Seq.newBuilder[(Int, Int, Int, Int, Int)]
    var n = 0
    // reads digits up to and INCLUDING the single terminating
    // non-digit byte (PPM headers end each field with one whitespace)
    def int(first: Int): Int = {
      var c = first
      while (c != -1 && Character.isWhitespace(c)) c = s.read()
      require(c >= '0' && c <= '9', s"bad PPM header byte $c")
      var v = 0
      while (c >= '0' && c <= '9') { v = v * 10 + (c - '0'); c = s.read() }
      v
    }
    val buf = new Array[Byte](1 << 16)
    while (n < maxFrames) {
      var c = s.read()
      while (c != -1 && Character.isWhitespace(c)) c = s.read()
      if (c == -1) return frames.result()
      require(c == 'P' && s.read() == '6', s"expected P6 frame header, got byte $c")
      val w = int(s.read()); val h = int(s.read()); val maxv = int(s.read())
      require(maxv == 255, s"unsupported PPM maxval $maxv")
      val np = w.toLong * h
      var remaining = np * 3
      var sr = 0L; var sg = 0L; var sb = 0L
      var phase = 0
      while (remaining > 0) {
        val k = s.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        require(k > 0, "truncated PPM pixel data")
        var j = 0
        while (j < k) {
          val v = buf(j) & 0xff
          if (phase == 0) sr += v else if (phase == 1) sg += v else sb += v
          phase += 1; if (phase == 3) phase = 0
          j += 1
        }
        remaining -= k
      }
      frames += ((w, h, math.round(sr.toDouble / np).toInt,
        math.round(sg.toDouble / np).toInt, math.round(sb.toDouble / np).toInt))
      n += 1
    }
    frames.result()
  }

  val videoSampleSchema: StructType = StructType(
    frameSampleSchema.fields.map(f =>
      if (f.name == "media_id" || f.name == "frame_idx") f
      else f.copy(nullable = true)) :+ // n_frames nullable: a sample-
      // bounded ffmpeg decode never observes the clip's total count
      StructField("decoded", BooleanType, nullable = false))

  /** Container formats the JDK's ImageIO actually decodes — only
    * these route to [[decodeFrames]]; anything else (including an
    * unlabeled payload, which is overwhelmingly video in this tier)
    * goes through ffmpeg-or-planned, so one unknown row degrades
    * instead of failing the whole job on the JDK reader's require.
    */
  private val jdkImageFormats = Set("gif", "png", "jpg", "jpeg", "bmp", "wbmp")

  /** q101-family frame sampling for ANY container: JDK image formats
    * (gif …) decode through the JDK as in [[sampleFrames]]; other and
    * UNLABELED containers decode through the deployed ffmpeg binary
    * when one resolves ([[ffmpegPath]]) — sample-bounded inside the
    * subprocess, so memory and pipe volume are O(maxFrames), with
    * `n_frames` null because the bounded decode never sees the end of
    * the clip — and otherwise degrade to [[planFrameSample]]'s
    * metadata rows (`plannedFrameCount` frames assumed, null
    * dims/means). One unified schema with a `decoded` flag telling
    * the tiers apart; same partition-batched executor shape each way.
    */
  def sampleFramesVideo(media: DataFrame, everyN: Int, maxFrames: Int,
      plannedFrameCount: Int, partitions: Int = 0): DataFrame = {
    require(everyN > 0 && maxFrames > 0 && plannedFrameCount > 0,
      "everyN, maxFrames and plannedFrameCount must be positive")
    val bin = ffmpegPath() // driver-side resolve, captured by the closure
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoSampleSchema)
    src.select("media_id", "bytes", "format").mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val fmt = Option(r.getString(2)).map(_.toLowerCase).orNull
        if (fmt != null && jdkImageFormats.contains(fmt)) {
          val frames = decodeFrames(r.get(1).asInstanceOf[Array[Byte]])
          frames.zipWithIndex.collect {
            case ((w, h, mr, mg, mb), i) if i % everyN == 0 && i / everyN < maxFrames =>
              Row(id, frames.size, i, w, h, mr, mg, mb, true)
          }
        } else bin match {
          case Some(b) =>
            // sampling pushed into the subprocess; result k IS the
            // k·everyN-th original frame (select filter contract)
            decodeFramesFfmpeg(b, r.get(1).asInstanceOf[Array[Byte]], fmt,
              everyN, maxFrames).zipWithIndex.map {
              case ((w, h, mr, mg, mb), k) =>
                Row(id, null, k * everyN, w, h, mr, mg, mb, true)
            }
          case None =>
            (0 until plannedFrameCount).collect {
              case i if i % everyN == 0 && i / everyN < maxFrames =>
                Row(id, plannedFrameCount, i, null, null, null, null, null, false)
            }
        }
      }
    }(enc)
  }

  // --- perceptual image hashing (dHash) + near-dup detection ----------

  /** Deterministic NON-solid raster for the perceptual-hash corpus: a
    * 72×8 lossless PNG whose gray level at (x, y) is
    * `((id·31) % 256 + 37·y + 17·x) % 256` — a wrapping gradient whose
    * wrap positions depend on the id, so dHash bits are informative
    * (solid fills hash to all-zero). 72 = 8·9 and height 8 make the
    * 9×8 dHash grid integer-aligned: every cell is an exact 8-pixel
    * box, which is what lets the DuckDB oracle replay the hash
    * arithmetic bit for bit. Ids congruent mod 256/gcd(31,256)=256
    * share a raster exactly — natural exact-dup classes — and adjacent
    * intensity offsets differ in few wrap positions — natural
    * NEAR-dups at small Hamming distance.
    */
  def synthPatternImageBytes(id: Long): Array[Byte] = {
    val (w, h) = (72, 8)
    val a = ((id * 31) % 256).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (a + 37 * y + 17 * x) % 256
        img.setRGB(x, y, (0xff << 24) | (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** [[attachMedia]]'s sibling for the gradient-pattern corpus. */
  def attachPatternMedia(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { row =>
        val id = row.getLong(0)
        Row(id, synthPatternImageBytes(id), "png")
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash — the standard public perceptual
    * fingerprint: downscale to a 9×8 luma grid, emit one bit per
    * horizontally adjacent cell pair) over REAL decoded pixels.
    * Bit `y·8 + x` is set iff cell(y, x)'s mean luma is strictly less
    * than cell(y, x+1)'s. Contracts that make the hash engine-exact:
    * luma is integer `(299r + 587g + 114b) div 1000` per pixel; each
    * pixel belongs to grid cell `(y·8 div h, x·9 div w)`; and cell
    * means compare as cross-multiplied INTEGER rationals
    * (`sL·nR < sR·nL`), so no floating division ever happens — exact
    * for any image up to ~500 MP (the cross product stays < 2⁶³).
    */
  def dHash64(bytes: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "no JDK ImageReader could decode the payload")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 9 && h >= 8, s"dHash needs at least 9x8 pixels, got ${w}x$h")
    val sums = Array.ofDim[Long](8, 9)
    val counts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gy = ((y.toLong * 8) / h).toInt
      var x = 0
      while (x < w) {
        val gx = ((x.toLong * 9) / w).toInt
        val p = img.getRGB(x, y)
        val luma = (299 * ((p >>> 16) & 0xff) + 587 * ((p >>> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        sums(gy)(gx) += luma
        counts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (sums(gy)(gx) * counts(gy)(gx + 1) < sums(gy)(gx + 1) * counts(gy)(gx))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Partition-batched perceptual hashing: (media_id, dhash). */
  def dhashMedia(media: DataFrame, partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))) { r =>
      Row(r.getLong(0), dHash64(r.get(1).asInstanceOf[Array[Byte]]))
    }

  /** Near-duplicate image pairs at DISTINCT-FINGERPRINT grain — the
    * at-scale shape: a corpus has far fewer distinct perceptual hashes
    * than images (every re-encode/recrop family collapses), so
    * candidate generation runs over the distinct-hash frame and
    * multiplies class sizes back at the end, never joining the corpus
    * against itself (the semantic-dedup components-over-candidates
    * discipline). Banding makes the candidate join equality-keyed:
    * each 64-bit hash splits into four 16-bit bands, and by pigeonhole
    * any pair within Hamming distance ≤ 3 agrees on at least one whole
    * band — so for `maxHamming` ≤ 3 recall is EXACT, not approximate.
    *
    * Returns distinct-hash pairs (dhash_a < dhash_b, hamming,
    * n_pairs = classA·classB). Same-hash pairs (hamming 0, C(n,2)
    * within a class) are included as their own rows.
    *
    * Scale shape: one groupBy to distinct-hash grain; the band
    * explode carries 4 rows per DISTINCT hash (ids-only, the LSH
    * banding discipline); the band join's fan-out is bounded by band
    * collision classes over distinct hashes; popcount verification is
    * a codegen scalar. No corpus-sized self-join anywhere.
    */
  def dhashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "banded recall is exact only for maxHamming <= 3 (4 bands, pigeonhole)")
    val classes = hashes.groupBy("dhash").agg(count(lit(1)).as("n"))
    val banded = classes.select(col("dhash"), col("n"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("dhash"), i * 16).bitwiseAND(lit(65535L))): _*))
        .as(Seq("band_idx", "band_val")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.dhash") < col("y.dhash"))
      .select(col("x.dhash").as("dhash_a"), col("y.dhash").as("dhash_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .distinct()
    val cross = cand
      .withColumn("hamming", bit_count(expr("dhash_a ^ dhash_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("dhash_a"), col("dhash_b"), col("hamming"),
        (col("na") * col("nb")).as("n_pairs"))
    val within = classes.filter(col("n") >= 2)
      .select(col("dhash").as("dhash_a"), col("dhash").as("dhash_b"),
        lit(0L).as("hamming"), expr("n * (n - 1) div 2").as("n_pairs"))
    cross.unionAll(within)
  }

  /** Deterministic NON-constant waveform for the audio-fingerprint
    * corpus: mono 16-bit PCM at 8 kHz, 520 frames = 65 integer-aligned
    * buckets of 8 frames, bucket k holding the constant amplitude
    * `((id·31) % 8192 + 389·k) % 8192` — the audio twin of
    * [[synthPatternImageBytes]]'s wrapping ramp (a constant signal
    * would fingerprint to all-zero). Same class structure: ids
    * congruent mod 8192/gcd(31,8192)=8192 share a waveform; nearby
    * offsets differ at few wrap positions.
    */
  def synthPatternWavBytes(id: Long): Array[Byte] = {
    val (rate, frames) = (8000, 520)
    val a = ((id * 31) % 8192).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    var f = 0
    while (f < frames) {
      val v = (a + 389 * (f / 8)) % 8192
      pcm(2 * f) = (v & 0xff).toByte
      pcm(2 * f + 1) = ((v >> 8) & 0xff).toByte
      f += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    writeWave(ais, out)
    out.toByteArray
  }

  /** [[attachAudio]]'s sibling for the pattern-waveform corpus. */
  def attachPatternAudio(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(0)
        Row(id, synthPatternWavBytes(id), "wav")
      }
    }(enc)
  }

  /** 64-bit audio difference fingerprint — the dHash idea applied to
    * sound (the public spectral/energy delta-sign family, simplified
    * to the time domain): the decoded PCM's FIRST channel collapses to
    * 65 equal time buckets and bit k is set iff bucket k's mean
    * amplitude is strictly below bucket k+1's. Same engine-exact
    * contracts as [[dHash64]]: integer bucket assignment
    * `k = frame·65 div n`, cross-multiplied integer rational mean
    * compares, no float anywhere. Requires ≥ 65 frames of 16-bit PCM.
    */
  def audioHash64(bytes: Array[Byte]): Long = {
    val ais = wavInput(bytes)
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16, "expected 16-bit PCM")
      val n = ais.getFrameLength
      require(n >= 65, s"audio fingerprint needs >= 65 frames, got $n")
      val pcm = ais.readAllBytes()
      val fs = fmt.getFrameSize
      val le = !fmt.isBigEndian
      val sums = new Array[Long](65)
      val counts = new Array[Long](65)
      var f = 0L
      while (f < n) {
        val i = (f * fs).toInt // first channel of the frame
        val v = if (le) ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
                else ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
        val k = ((f * 65) / n).toInt
        sums(k) += v
        counts(k) += 1
        f += 1
      }
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (sums(k) * counts(k + 1) < sums(k + 1) * counts(k))
          hash |= 1L << k
        k += 1
      }
      hash
    } finally ais.close()
  }

  /** Partition-batched audio fingerprinting: (media_id, ahash). */
  def audioHashMedia(media: DataFrame, partitions: Int = 0): DataFrame =
    mapMedia(media, partitions, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))) { r =>
      Row(r.getLong(0), audioHash64(r.get(1).asInstanceOf[Array[Byte]]))
    }

  /** Media-level exact-duplicate keep-list — (id, rep_id, keep) where
    * the representative is the smallest id sharing the image's
    * perceptual hash: the media analog of the text dedup keep-lists,
    * and shaped exactly like them so it plugs straight into
    * [[graft.operators.Curate]]'s `nearDupKeep` parameter — curation
    * then drops documents whose ATTACHED IMAGE duplicates a kept
    * document's image, not just textual twins.
    *
    * Scale shape: one hash-grain aggregation (min id per distinct
    * fingerprint) joined back ids-only — the q54 exact-dedup shuffle
    * with a 64-bit key.
    */
  def dhashKeepList(hashes: DataFrame): DataFrame =
    fingerprintKeepList(hashes, "dhash")

  /** [[dhashKeepList]] for AUDIO fingerprints ([[audioHashMedia]]'s
    * `ahash` column): min-id representative per perceptual-fingerprint
    * class, so curation drops documents whose ATTACHED AUDIO
    * duplicates a kept document's waveform (the q188 image composition
    * applied to the sound tier).
    */
  def audioKeepList(hashes: DataFrame): DataFrame =
    fingerprintKeepList(hashes, "ahash")

  private def fingerprintKeepList(hashes: DataFrame, hashCol: String): DataFrame = {
    val reps = hashes.groupBy(hashCol).agg(min("media_id").as("rep_id"))
    hashes.join(reps, Seq(hashCol))
      .select(col("media_id").as("id"), col("rep_id"),
        (col("media_id") === col("rep_id")).as("keep"))
  }

  /** Just the ids a media-dedup pass KEEPS — the left-semi side of the
    * curation composition, in ONE pass over the fingerprint frame.
    * The (id, rep_id, keep) triple above references `hashes` twice
    * (per-class reps joined back), which RE-RUNS an expensive codec
    * input once per reference — composing it directly over
    * [[dhashMedia]]/[[audioHashMedia]] triples the decode work (the
    * ×8 ScaleCheck caught q191 at ratio 16 doing exactly that). The
    * keep ids are simply the per-class min: one hash aggregation with
    * map-side partials, no join, codec pass evaluated once.
    */
  def dhashKeepIds(hashes: DataFrame): DataFrame =
    fingerprintKeepIds(hashes, "dhash")

  /** [[dhashKeepIds]] for audio fingerprints. */
  def audioKeepIds(hashes: DataFrame): DataFrame =
    fingerprintKeepIds(hashes, "ahash")

  private def fingerprintKeepIds(hashes: DataFrame, hashCol: String): DataFrame =
    hashes.groupBy(hashCol).agg(min("media_id").as("id")).select("id")

  /** Corpus-level near-dup profile: image-pair counts per Hamming
    * distance 0..`maxHamming`, aggregated from the distinct-hash pairs
    * of [[dhashNearDupPairs]] — the O(1)-sized audit a 100 TB dedup
    * run reports.
    */
  def dhashNearDupStats(hashes: DataFrame, maxHamming: Int): DataFrame =
    dhashNearDupPairs(hashes, maxHamming)
      .groupBy("hamming").agg(sum("n_pairs").as("n_pairs"))
}
