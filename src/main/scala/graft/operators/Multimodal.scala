package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside.
  *
  * The decode/feature-extract step is a clearly-marked STUB — real codec
  * libraries are not in this container — but the Spark-side machinery is
  * real and tested: the schema, the per-partition batch processing shape
  * (`mapPartitions`, the Scala analog of `mapInPandas` batches), the
  * partitioning for parallel decode, and the deterministic fake features
  * that downstream operators (clustering, ANN) consume.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache per read/write —
  // pure overhead (plus temp-file churn across executor threads) when
  // every payload is an in-memory byte array; the memory cache is
  // ~3.6× faster on the small-image kernels (0.54 → 0.15 s for 5000
  // fixture resizes, measured single-threaded). Object init runs once
  // per JVM — on every executor the kernels are first used on.
  javax.imageio.ImageIO.setUseCache(false)

  /** media metadata carried next to the payload */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** Wrap a text table into a multimodal-shaped table: payload = utf-8
    * bytes of the text (a deterministic stand-in for a real media blob),
    * metadata derived from it. Pure column expressions. */
  def asMedia(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("fake/utf8").as("media_type"),
        (length(col(textCol)) % 640 + 1).cast("int").as("width"),
        (length(col(textCol)) % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  /** STUB decoder: a real implementation would decode the codec here
    * (JPEG/PNG/WAV/...) inside the per-partition batch loop. The fake is
    * deterministic — feature i = byte at position i·stride, normalized —
    * so tests and oracles can check the plumbing end-to-end. */
  def stubDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec call goes here (e.g. ImageIO / libsndfile batch)
    val out = new Array[Float](dim)
    if (payload.nonEmpty) {
      val stride = math.max(1, payload.length / dim)
      var i = 0
      while (i < dim) {
        out(i) = (payload(math.min(i * stride, payload.length - 1)) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** REAL decode path behind the same batch interface: `javax.imageio`
    * (PNG/JPEG/GIF/BMP — JDK-public, no external codec libs) decodes
    * the payload and feature i is the mean Rec.601 luminance of the
    * i-th vertical strip, in [0,1] — a deterministic, resolution-
    * independent image signature. Payloads ImageIO cannot decode fall
    * back to [[stubDecodeFeatures]], keeping the operator total (a
    * corrupt blob in 100 TB of crawl data must not kill the job). */
  def imageDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      // NonFatal, not just IOException: corrupt payloads surface
      // RuntimeExceptions from codec internals (IllegalArgumentException,
      // CMMException, IndexOutOfBounds) and the totality posture — a bad
      // blob in 100 TB of crawl must not kill the job — covers those too
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0)
      stubDecodeFeatures(payload, dim)
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val x0 = (i.toLong * w / dim).toInt
        val x1 = math.max(x0 + 1, ((i + 1).toLong * w / dim).toInt)
        var sum = 0.0; var cnt = 0
        var x = x0
        while (x < x1 && x < w) {
          var y = 0
          while (y < h) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000.0 / 255.0
            cnt += 1; y += 1
          }
          x += 1
        }
        out(i) = (sum / cnt).toFloat
        i += 1
      }
      out
    }
  }

  /** REAL resize kernel: nearest-neighbor downscale to `outW` columns
    * (srcX = ⌊x·w/outW⌋ — pure integer picks, no interpolation
    * arithmetic, so the resized image's pixels are EXACT copies of
    * source pixels and the whole decode→resize→re-encode pipeline
    * stays bit-replayable through PNG's lossless roundtrip), height
    * preserved. Payloads ImageIO cannot decode pass through unchanged
    * — the same totality posture as [[imageDecodeFeatures]]. */
  def imageResizeNearest(payload: Array[Byte], outW: Int): Array[Byte] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      // NonFatal, not just IOException: corrupt payloads surface
      // RuntimeExceptions from codec internals (IllegalArgumentException,
      // CMMException, IndexOutOfBounds) and the totality posture — a bad
      // blob in 100 TB of crawl must not kill the job — covers those too
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) payload
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new java.awt.image.BufferedImage(
        outW, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        var y = 0
        while (y < h) {
          out.setRGB(x, y, img.getRGB(sx, y))
          y += 1
        }
        x += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Perceptual average-hash of an image — the visual sibling of
    * SimHash: decode (REAL ImageIO), take every pixel's INTEGER
    * Rec.601 luminance (`(r·299 + g·587 + b·114) / 1000`, integer
    * division — exact on grays), and emit one bit per pixel in
    * row-major order, 1 iff `lum·n ≥ Σlum` (the mean-threshold
    * compare in cross-multiplied integer form, so no float ever
    * enters the hash). Near-identical images agree on most bits, so
    * Hamming distance over the bit string is the image near-dup
    * measure; run [[imageResizeNearest]] first to normalize scale.
    * Payloads ImageIO cannot decode hash to null — the totality
    * posture of [[imageDecodeFeatures]]. */
  def imageAHashBits(payload: Array[Byte]): String = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      // NonFatal, not just IOException: corrupt payloads surface
      // RuntimeExceptions from codec internals (IllegalArgumentException,
      // CMMException, IndexOutOfBounds) and the totality posture — a bad
      // blob in 100 TB of crawl must not kill the job — covers those too
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) null
    else {
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      // lum ≤ 255 < 2⁸, so lum·n needs n < 2⁵⁵ to stay in a long —
      // loud guard instead of silent wraparound on a pathological image
      require(n < (Long.MaxValue >> 8),
        s"image too large for integer aHash: $w x $h pixels")
      val lums = new Array[Long](w * h)
      var total = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
            (rgb & 0xff) * 114L) / 1000L
          lums(y * w + x) = lum
          total += lum
          x += 1
        }
        y += 1
      }
      val sb = new java.lang.StringBuilder(lums.length)
      var i = 0
      while (i < lums.length) {
        sb.append(if (lums(i) * n >= total) '1' else '0')
        i += 1
      }
      sb.toString
    }
  }

  /** Batch aHash over a (media_id, payload) frame — the
    * [[resizeImages]] mapPartitions batch shape. */
  def aHashImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, imageAHashBits(p)) })
      .toDF("media_id", "ahash")
  }

  /** Batch resize over a (media_id, payload) frame — the same
    * mapPartitions batch shape as [[extractFeatures]] (codec setup
    * amortized per partition, schema-stable output), feeding either
    * the feature extractor or a thumbnail sink. */
  def resizeImages(media: org.apache.spark.sql.DataFrame,
      outW: Int): org.apache.spark.sql.DataFrame = {
    require(outW >= 1, s"outW must be >= 1, got $outW")
    val spark = media.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        (id, imageResizeNearest(p, outW))
      })
      .toDF("media_id", "payload")
  }

  /** Deterministic dim×1 grayscale PNG: pixel x has gray level
    * `(id·31 + x·97) mod 251`. One pixel per strip means the decoded
    * strip-mean luminance is EXACTLY `v/255` (a single Rec.601 term on
    * a gray pixel, no accumulation), so the real-decode pipeline has a
    * bit-exact SQL oracle: `CAST(CAST(v AS DOUBLE)/255.0 AS REAL)` —
    * PNG is lossless, so the codec roundtrip preserves every level. */
  def pngPayload(id: Long, dim: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      dim, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < dim) {
      val v = ((id * 31 + x * 97) % 251).toInt
      img.setRGB(x, 0, (v << 16) | (v << 8) | v)
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Recipe gray level of the flat JPEG fixture for `id`. */
  def jpegFlatLevel(id: Long): Int = ((id * 37 + 11) % 251).toInt

  /** Deterministic FLAT-gray dim×1 JPEG — the lossy second container
    * format next to [[pngPayload]]'s lossless one. JPEG quantizes even
    * a flat block's DC coefficient, so per-pixel values are NOT
    * recipe-replayable the way PNG's are; the oracle contract is the
    * one a lossy codec supports: container parses, dimensions survive,
    * and every decoded pixel sits within a small tolerance of the
    * recipe level ([[jpegDecodeAudit]]). A flat field keeps the error
    * to DC quantization only (no ringing), well inside tolerance 8. */
  def jpegPayload(id: Long, dim: Int): Array[Byte] = {
    val v = jpegFlatLevel(id)
    val img = new java.awt.image.BufferedImage(
      dim, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < dim) {
      img.setRGB(x, 0, (v << 16) | (v << 8) | v)
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Decode audit over the flat-JPEG fixture: REAL ImageIO decode of
    * each payload, emitting `(media_id, width, height, within_tol)` —
    * `within_tol` is true iff every decoded channel of every pixel is
    * within `tol` levels of the id's recipe level. A payload ImageIO
    * cannot decode reports (-1, -1, false) — the totality posture.
    * This is the lossy-codec twin of the q109 bit-exact PNG oracle:
    * dimensions + bounded luminance ARE the replayable contract when
    * the codec quantizes. Same mapPartitions batch shape as
    * [[resizeImages]]. */
  def jpegDecodeAudit(media: DataFrame, tol: Int): DataFrame = {
    require(tol >= 0, s"tol must be >= 0, got $tol")
    val spark = media.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null || img.getWidth == 0 || img.getHeight == 0)
          (id, -1, -1, false)
        else {
          val v = jpegFlatLevel(id)
          var ok = true
          var x = 0
          while (x < img.getWidth && ok) {
            var y = 0
            while (y < img.getHeight && ok) {
              val rgb = img.getRGB(x, y)
              ok = math.abs(((rgb >> 16) & 0xff) - v) <= tol &&
                math.abs(((rgb >> 8) & 0xff) - v) <= tol &&
                math.abs((rgb & 0xff) - v) <= tol
              y += 1
            }
            x += 1
          }
          (id, img.getWidth, img.getHeight, ok)
        }
      })
      .toDF("media_id", "width", "height", "within_tol")
  }

  /** Deterministic mono 16-bit PCM WAV: sample j is
    * `(id·7919 + j·104729) mod 65536 − 32768` — the audio twin of
    * [[pngPayload]], replayable in SQL for the q110 oracle. Encoded
    * through `javax.sound.sampled` (JDK-public, like ImageIO), so the
    * decode spec exercises a REAL codec container roundtrip. */
  def wavPayload(id: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var j = 0
    while (j < nSamples) {
      val s = (((id * 7919L + j * 104729L) % 65536L) - 32768L).toInt
      pcm(2 * j) = (s & 0xff).toByte
      pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode behind the same batch interface:
    * `javax.sound.sampled` (WAV/AIFF/AU — JDK-public, no external
    * codec libs) decodes the payload and feature i is the RMS
    * amplitude of the i-th sample strip, in [0,1]. The strip's
    * sum-of-squares accumulates in exact Long arithmetic (order-free),
    * and only the final `sqrt(sumSq / (cnt·32768²))` touches floating
    * point — division and sqrt are both correctly rounded, so the
    * feature is bit-identical to any engine evaluating the same tree
    * (the q110 oracle device). Non-PCM-16/mono payloads and non-audio
    * bytes fall back to [[stubDecodeFeatures]], keeping the operator
    * total — the crawl-data posture of [[imageDecodeFeatures]]. */
  /** Decode a PCM-16/mono/little-endian audio payload to (samples,
    * sampleRate); null when the container or format is anything else —
    * the shared totality gate of [[audioDecodeFeatures]] and
    * [[audioDecimate]]. */
  private def decodePcm16Mono(
      payload: Array[Byte]): (Array[Int], Float) =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var j = 0
          while (j < n) {
            out(j) = ((bytes(2 * j) & 0xff) | (bytes(2 * j + 1) << 8))
            j += 1
          }
          (out, fmt.getSampleRate)
        }
      } finally ais.close()
    } catch {
      // NonFatal: codec internals throw RuntimeExceptions on corrupt
      // payloads, not just the checked decode exceptions
      case scala.util.control.NonFatal(_) => null
    }

  def audioDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val samples: Array[Int] = decodePcm16Mono(payload) match {
      case null => null
      case (s, _) => s
    }
    if (samples == null || samples.isEmpty) stubDecodeFeatures(payload, dim)
    else {
      val n = samples.length
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val j0 = (i.toLong * n / dim).toInt
        val j1 = math.max(j0 + 1, ((i + 1).toLong * n / dim).toInt)
        var sumSq = 0L
        var cnt = 0
        var j = j0
        while (j < j1 && j < n) {
          sumSq += samples(j).toLong * samples(j)
          cnt += 1
          j += 1
        }
        // 32768² = 1073741824; cnt·2³⁰ and sumSq (≤ cnt·2³⁰) are exact
        // doubles, so the quotient and sqrt are correctly rounded
        out(i) = math.sqrt(sumSq / (cnt * 1073741824.0)).toFloat
        i += 1
      }
      out
    }
  }

  /** REAL decimation-resample kernel — the audio twin of
    * [[imageResizeNearest]]: keep every `factor`-th PCM sample (pure
    * index picks, no filtering/interpolation arithmetic, so every
    * output sample is an EXACT copy of a source sample) and re-encode
    * as WAV at `rate/factor`. The WAV container roundtrip is lossless
    * for PCM-16, so decode→decimate→re-encode→decode is bit-replayable
    * (the q136 device applied to audio). Undecodable or non-PCM-16/
    * mono payloads pass through unchanged — the usual totality
    * posture. (A production resampler low-pass-filters first; naked
    * decimation aliases, which is fine for fingerprint/feature feeds
    * and keeps the pipeline exact.) */
  def audioDecimate(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    decodePcm16Mono(payload) match {
      case null => payload
      case (samples, rate) =>
        if (samples.isEmpty) payload
        else {
          val n = (samples.length + factor - 1) / factor
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = samples(i * factor)
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            math.max(1f, rate / factor), 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
    }
  }

  /** Batch decimation over a (media_id, payload) frame — the
    * [[resizeImages]] batch shape for audio. */
  def decimateAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, audioDecimate(p, factor)) })
      .toDF("media_id", "payload")
  }

  /** Per-partition batched feature extraction (the `mapInPandas` shape:
    * one iterator of rows per partition, amortizing any per-batch codec
    * setup across the partition). Output: (media_id, features[dim]).
    * `imageDecode = true` routes through the real ImageIO path,
    * `audioDecode = true` through the real javax.sound one (stub
    * fallback per payload in both); neither flag keeps the
    * deterministic stub twin the oracles replay byte-for-byte. */
  def extractFeatures(
      media: DataFrame,
      dim: Int = 8,
      imageDecode: Boolean = false,
      audioDecode: Boolean = false): DataFrame = {
    require(!(imageDecode && audioDecode),
      "pick one decoder: imageDecode or audioDecode")
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Float])] =
      media.select(col("media_id").cast("long"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // per-partition setup would init the decoder once, here
          it.map { case (id, bytes) =>
            (id,
              if (imageDecode) imageDecodeFeatures(bytes, dim)
              else if (audioDecode) audioDecodeFeatures(bytes, dim)
              else stubDecodeFeatures(bytes, dim))
          }
        }
    ds.toDF("media_id", "features")
  }

  /** Deterministic frame-sampling stub: pick every `stride`-th byte
    * offset as a "frame" pointer — exercises the explode/repartition
    * shape of video-frame pipelines. */
  def sampleFrames(media: DataFrame, stride: Int = 64): DataFrame =
    media.select(
      col("media_id"),
      posexplode(
        transform(
          sequence(lit(0),
            greatest((col("meta.n_bytes") / stride).cast("int") - 1, lit(0))),
          i => i * stride)).as(Seq("frame_idx", "byte_offset")))
}
