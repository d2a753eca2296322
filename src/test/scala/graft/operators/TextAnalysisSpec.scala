package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import TextAnalysis._

  private def one(c: org.apache.spark.sql.Column, text: String): Long = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).head().getLong(0)
  }

  test("tokenCount: words, blanks, empty") {
    assert(one(tokenCount(col("text")), "the quick  brown\tfox") === 4L)
    assert(one(tokenCount(col("text")), "") === 0L)
    assert(one(tokenCount(col("text")), "   ") === 0L)
    assert(one(tokenCount(col("text")), "one") === 1L)
  }

  test("character-class counts") {
    val t = "Ab1, c2!"
    assert(one(punctCount(col("text")), t) === 2L) // , !
    assert(one(digitCount(col("text")), t) === 2L)
    assert(one(alphaCount(col("text")), t) === 3L)
    assert(one(upperCount(col("text")), t) === 1L)
  }

  test("wordTokens + alphaCount are Unicode-aware (\\p{L}, not ASCII)") {
    import spark.implicits._
    def toks(t: String): Seq[String] =
      Seq(t).toDF("text").select(wordTokens(col("text")).as("a"))
        .head().getSeq[String](0)
    // Cyrillic / Greek / Arabic / CJK / accented Latin all tokenize —
    // under the old [^A-Za-z]+ split every one of these came out EMPTY
    assert(toks("привет мир, как дела? 123") ===
      Seq("привет", "мир", "как", "дела"))
    assert(toks("καλημέρα κόσμε — ωραία μέρα") ===
      Seq("καλημέρα", "κόσμε", "ωραία", "μέρα"))
    assert(toks("مرحبا بالعالم اليوم") === Seq("مرحبا", "بالعالم", "اليوم"))
    assert(toks("你好，世界。今天天气很好") === Seq("你好", "世界", "今天天气很好"))
    assert(toks("naïve café über straße") ===
      Seq("naïve", "café", "über", "straße"))
    // digits/punct/underscore still separate; pure-ASCII behavior is
    // UNCHANGED (existing oracle rows stay green)
    assert(toks("ascii-only text_with_underscores 42") ===
      Seq("ascii", "only", "text", "with", "underscores"))
    assert(one(alphaCount(col("text")), "naïve café 42!") === 9L)
    assert(one(upperCount(col("text")), "Über École e") === 2L)
  }

  test("wordOccurrences: whole-word, case-insensitive") {
    assert(one(wordOccurrences(col("text"), "the"), "The theater the THE") === 3L)
  }

  test("langScore: english markers dominate on english text") {
    val en = "the cat and the dog went to the house of the king"
    val s = {
      import spark.implicits._
      Seq(en).toDF("text")
        .select(langScore(col("text"), "en").as("en"),
          langScore(col("text"), "de").as("de")).head()
    }
    assert(s.getLong(0) > s.getLong(1))
  }

  test("fingerprint is deterministic and text-sensitive") {
    import spark.implicits._
    val got = Seq("aaa", "aaa", "aab").toDF("text")
      .select(fingerprint(col("text")).as("fp")).collect().map(_.getLong(0))
    assert(got(0) === got(1))
    assert(got(0) !== got(2))
  }

  test("tokenCountBpeIsh splits punctuation boundaries") {
    assert(one(tokenCountBpeIsh(col("text")), "hi,there") === 3L) // hi , there
    assert(one(tokenCountBpeIsh(col("text")), "") === 0L)
  }
}

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("asMedia: payload bytes and metadata derived from text") {
    import spark.implicits._
    val media = asMedia(Seq((1L, "hello")).toDF("doc_id", "text")).head()
    assert(media.getLong(0) === 1L)
    assert(new String(media.getAs[Array[Byte]]("payload"), "UTF-8") === "hello")
    val meta = media.getStruct(2)
    assert(meta.getAs[Long]("n_bytes") === 5L)
    assert(meta.getAs[Int]("width") === 6) // 5 % 640 + 1
  }

  test("stubDecodeFeatures is deterministic, normalized, dim-sized") {
    val bytes = "some payload bytes".getBytes("UTF-8")
    val a = stubDecodeFeatures(bytes, 8)
    val b = stubDecodeFeatures(bytes, 8)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8)
    assert(a.forall(v => v >= 0f && v <= 1f))
    assert(stubDecodeFeatures(Array.empty[Byte], 4).toSeq === Seq(0f, 0f, 0f, 0f))
  }

  test("extractFeatures: mapPartitions plumbing end-to-end") {
    import spark.implicits._
    val media = asMedia(Seq((1L, "abcdefgh"), (2L, "")).toDF("doc_id", "text"))
    val got = extractFeatures(media, dim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(1L) === stubDecodeFeatures("abcdefgh".getBytes("UTF-8"), 4).toSeq)
    assert(got(2L) === Seq(0f, 0f, 0f, 0f))
  }

  /** a dim-wide, 2-tall PNG whose column x is the gray level levels(x) */
  private def pngBytes(levels: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      levels.size, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    levels.zipWithIndex.foreach { case (g, x) =>
      val rgb = (g << 16) | (g << 8) | g
      img.setRGB(x, 0, rgb); img.setRGB(x, 1, rgb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageDecodeFeatures decodes a real PNG into strip luminances") {
    // columns 0/255 -> strips [0, 1]; gray g -> g/255 (Rec.601 weights
    // sum to 1000/1000 on gray pixels)
    val got = imageDecodeFeatures(pngBytes(Seq(0, 255)), 2)
    assert(math.abs(got(0) - 0f) < 1e-6, got.toSeq)
    assert(math.abs(got(1) - 1f) < 1e-6, got.toSeq)
    // 4 columns into 2 strips -> each strip averages its 2 columns
    val avg = imageDecodeFeatures(pngBytes(Seq(0, 255, 100, 200)), 2)
    assert(math.abs(avg(0) - (0.0 + 255.0) / 2 / 255.0) < 1e-6, avg.toSeq)
    assert(math.abs(avg(1) - (100.0 + 200.0) / 2 / 255.0) < 1e-6, avg.toSeq)
  }

  test("imageDecodeFeatures falls back to the stub on a non-image") {
    val junk = "definitely not a png".getBytes("UTF-8")
    assert(imageDecodeFeatures(junk, 4).toSeq ===
      stubDecodeFeatures(junk, 4).toSeq)
  }

  test("extractFeatures(imageDecode = true) runs ImageIO inside the batch") {
    import spark.implicits._
    val png = pngBytes(Seq(0, 255))
    val media = Seq((7L, png), (8L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = extractFeatures(media, dim = 2, imageDecode = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(7L) === imageDecodeFeatures(png, 2).toSeq)
    assert(got(8L) === stubDecodeFeatures("junk".getBytes("UTF-8"), 2).toSeq)
  }

  test("sampleFrames: one frame per stride bytes, at least one") {
    import spark.implicits._
    val media = asMedia(Seq((1L, "x" * 130), (2L, "y")).toDF("doc_id", "text"))
    val got = sampleFrames(media, stride = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byId = got.groupBy(_._1)
    assert(byId(1L).map(f => (f._2, f._3)).toSeq.sorted === Seq((0, 0), (1, 64)))
    assert(byId(2L).map(f => (f._2, f._3)).toSeq === Seq((0, 0)))
  }

  test("pngPayload roundtrips through the real decoder bit-exactly") {
    // feature i must be EXACTLY ((id·31 + i·97) mod 251)/255 as a
    // correctly-rounded float — the q109 oracle's contract
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val got = imageDecodeFeatures(pngPayload(id, 8), 8)
      val want = (0 until 8).map(i =>
        (((id * 31 + i * 97) % 251) / 255.0).toFloat)
      assert(got.toSeq === want, s"id=$id")
    }
  }

  test("GIF and BMP containers roundtrip the recipe BIT-EXACTLY " +
    "through the real decoder (mixed-format corpora beyond PNG/JPEG)") {
    // both are lossless here: BMP is 24-bit RGB; GIF palettizes, and
    // the 8 distinct grays of the fixture fit any palette exactly —
    // so the PNG contract (feature i == recipe_i/255 as a correctly
    // rounded float) must hold verbatim for both containers
    def payload(id: Long, dim: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        dim, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until dim).foreach { x =>
        val v = ((id * 31 + x * 97) % 251).toInt
        img.setRGB(x, 0, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    for (fmt <- Seq("gif", "bmp"); id <- Seq(0L, 1L, 17L, 499L)) {
      val got = imageDecodeFeatures(payload(id, 8, fmt), 8)
      val want = (0 until 8).map(i =>
        (((id * 31 + i * 97) % 251) / 255.0).toFloat)
      assert(got.toSeq === want, s"fmt=$fmt id=$id")
      // cross-format resize: nearest-neighbor picks exact source pixels
      val resized = imageDecodeFeatures(
        imageResizeNearest(payload(id, 8, fmt), 4), 4)
      val wantR = (0 until 4).map(i =>
        (((id * 31 + (2 * i) * 97) % 251) / 255.0).toFloat)
      assert(resized.toSeq === wantR, s"resize fmt=$fmt id=$id")
    }
  }

  test("jpegPayload decodes through the REAL codec within the lossy " +
    "tolerance: dims survive, pixels near the recipe, junk reports false") {
    // the q188 contract: flat field → only DC quantization error
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val v = jpegFlatLevel(id)
      val feats = imageDecodeFeatures(jpegPayload(id, 8), 8)
      feats.foreach(f =>
        assert(math.abs(f - v / 255.0f) <= 8.0f / 255.0f, s"id=$id f=$f v=$v"))
    }
    import spark.implicits._
    val media = (Seq(0L, 1L, 17L).map(id => (id, jpegPayload(id, 8))) :+
      (99L, Array[Byte](1, 2, 3, 4))).toDF("media_id", "payload")
    val got = jpegDecodeAudit(media, tol = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got === Seq((0L, 8, 1, true), (1L, 8, 1, true),
      (17L, 8, 1, true), (99L, -1, -1, false)))
  }

  test("imageResizeNearest picks exact source pixels; non-images pass through") {
    // resizing the 8-wide fixture to 4 must make strip i EXACTLY the
    // source pixel 2i's luminance — the q136 oracle's contract
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val resized = imageResizeNearest(pngPayload(id, 8), 4)
      val got = imageDecodeFeatures(resized, 4)
      val want = (0 until 4).map(i =>
        (((id * 31 + (2 * i) * 97) % 251) / 255.0).toFloat)
      assert(got.toSeq === want, s"id=$id")
    }
    val junk = Array[Byte](1, 2, 3, 4)
    assert(imageResizeNearest(junk, 4).toSeq === junk.toSeq)
  }

  test("imageAHashBits: fixture bits replay the recipe; 2D row-major; " +
    "junk hashes null") {
    // gray fixture: bit i = 1 iff v_i·8 >= Σv — the q165 oracle's contract
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val vs = (0 until 8).map(i => (id * 31 + i * 97) % 251)
      val want = vs.map(v => if (v * 8 >= vs.sum) '1' else '0').mkString
      assert(imageAHashBits(pngPayload(id, 8)) === want, s"id=$id")
    }
    // 2D: 2x2 with luminances 10,20,30,40 (mean 25) -> row-major 0011
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    def gray(v: Int) = (v << 16) | (v << 8) | v
    img.setRGB(0, 0, gray(10)); img.setRGB(1, 0, gray(20))
    img.setRGB(0, 1, gray(30)); img.setRGB(1, 1, gray(40))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(imageAHashBits(bos.toByteArray) === "0011")
    assert(imageAHashBits(Array[Byte](9, 9, 9)) === null)
  }

  test("wavPayload roundtrips through the real audio decoder bit-exactly") {
    // strip RMS must be EXACTLY sqrt(sumSq/(8·32768²)) over the sample
    // recipe — the q110 oracle's contract
    for (id <- Seq(0L, 1L, 17L, 499L)) {
      val got = audioDecodeFeatures(wavPayload(id, 64), 8)
      val want = (0 until 8).map { i =>
        val sumSq = (8 * i until 8 * (i + 1)).map { j =>
          val s = ((id * 7919L + j * 104729L) % 65536L) - 32768L
          s * s
        }.sum
        math.sqrt(sumSq / (8 * 1073741824.0)).toFloat
      }
      assert(got.toSeq === want, s"id=$id")
    }
  }

  test("audioDecodeFeatures falls back to the stub on non-audio bytes") {
    val junk = "definitely not a wav".getBytes("UTF-8")
    assert(audioDecodeFeatures(junk, 4).toSeq ===
      stubDecodeFeatures(junk, 4).toSeq)
    // and on a real but non-PCM16-mono container (8-bit WAV)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val pcm8 = Array.tabulate[Byte](16)(i => (i * 10).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm8), fmt, 16L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav8 = bos.toByteArray
    assert(audioDecodeFeatures(wav8, 4).toSeq ===
      stubDecodeFeatures(wav8, 4).toSeq)
  }

  test("audioDecimate keeps exact every-nth samples; junk passes through") {
    // decode(decimate(wav, 4)) must be EXACTLY samples 0, 4, 8, ... of
    // the fixture recipe — the q141 oracle's contract
    for (id <- Seq(0L, 17L, 499L)) {
      val dec = audioDecimate(wavPayload(id, 64), 4)
      val got = audioDecodeFeatures(dec, 4)
      val want = (0 until 4).map { i =>
        val sumSq = (4 * i until 4 * (i + 1)).map { j =>
          val s = ((id * 7919L + (4L * j) * 104729L) % 65536L) - 32768L
          s * s
        }.sum
        math.sqrt(sumSq / (4 * 1073741824.0)).toFloat
      }
      assert(got.toSeq === want, s"id=$id")
    }
    // factor 1 is the identity on the decoded samples
    assert(audioDecodeFeatures(audioDecimate(wavPayload(3L, 64), 1), 8).toSeq
      === audioDecodeFeatures(wavPayload(3L, 64), 8).toSeq)
    // non-audio payloads pass through byte-identically
    val junk = "not audio".getBytes("UTF-8")
    assert(audioDecimate(junk, 4).toSeq === junk.toSeq)
  }

  test("extractFeatures(audioDecode = true) runs javax.sound in the batch") {
    import spark.implicits._
    val wav = wavPayload(5L, 64)
    val media = Seq((5L, wav), (6L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = extractFeatures(media, dim = 8, audioDecode = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(5L) === audioDecodeFeatures(wav, 8).toSeq)
    assert(got(6L) === stubDecodeFeatures("junk".getBytes("UTF-8"), 8).toSeq)
  }
}

class SourcesSpec extends SparkSpec {

  test("PointReader parses CSV lines into float arrays") {
    val dir = java.nio.file.Files.createTempDirectory("pr").toFile
    val f = new java.io.File(dir, "pts.txt")
    java.nio.file.Files.writeString(f.toPath, "1.0,2.0,3.0\n4.5, 5.5 ,6.5\n\n")
    val got = graft.sources.PointReader.read(spark, f.getAbsolutePath)
      .collect().map(_.getSeq[Float](0).toSeq)
    assert(got.toSet === Set(Seq(1f, 2f, 3f), Seq(4.5f, 5.5f, 6.5f)))
  }

  test("PointReader rejects ragged input") {
    val dir = java.nio.file.Files.createTempDirectory("pr").toFile
    val f = new java.io.File(dir, "bad.txt")
    java.nio.file.Files.writeString(f.toPath, "1.0,2.0\n3.0\n")
    intercept[IllegalArgumentException] {
      graft.sources.PointReader.read(spark, f.getAbsolutePath)
    }
  }

  test("PointReader rejects non-numeric fields") {
    val dir = java.nio.file.Files.createTempDirectory("pr").toFile
    val f = new java.io.File(dir, "bad2.txt")
    java.nio.file.Files.writeString(f.toPath, "1.0,2.0\n3.0,abc\n")
    intercept[IllegalArgumentException] {
      graft.sources.PointReader.read(spark, f.getAbsolutePath)
    }
  }

  test("CentroidWriter formats the reference's result.txt line format") {
    val s = graft.sources.CentroidWriter.format(
      Array(Array(0.5f, 1.0f), Array(2.25f, 3f)))
    assert(s === "0.5,1.0\n2.25,3.0\n")
  }

  test("Tables normalizes nano timestamps to TimestampType") {
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    assert(li.schema("l_shipdate").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(li.count() > 0)
  }

  test("collocations matches a hand-computed PMI ranking") {
    import spark.implicits._
    // tokens: 10; bigrams: 7; (big,data)=3, (data,big)=3, (x,y)=1;
    // unigrams big=4 data=4 x=1 y=1
    val docs = Seq("big data big data big", "data big data", "x y")
      .toDF("text").repartition(2)
    val got = TextAnalysis.collocations(docs, "text", minCount = 2)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val pmi = BigDecimal(math.log(((3.0 * 10) * 10) / ((7.0 * 4) * 4)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // equal PMIs tie-break on w1
    assert(got === Array(("big", "data", 3L, pmi), ("data", "big", 3L, pmi)))
  }

  test("collocations never pairs tokens across document boundaries") {
    import spark.implicits._
    val docs = Seq("alpha beta", "beta alpha").toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSet === Set(("alpha", "beta", 1L), ("beta", "alpha", 1L)))
  }

  test("vocabularyGrowth: first-seen accounting over id batches") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta alpha"),   // batch 0: 3 occ, 2 distinct, 2 new
      (1L, "beta gamma"),         // batch 0 continues
      (10L, "alpha delta"),       // batch 1: delta is new, alpha isn't
      (11L, "delta delta"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabularyGrowth(
        docs.repartition(3), "doc_id", "text", batchSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq((0L, 5L, 3L, 3L), (1L, 4L, 2L, 1L)))
  }

  test("tokenEntropy: uniform, skewed, and single-token docs") {
    import spark.implicits._
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val docs = Seq(
      (1L, "a b c d"),    // uniform over 4 -> ln 4
      (2L, "a a a b"),    // 3/4, 1/4
      (3L, "x x x"))      // single token -> +0.0 exactly
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs.repartition(2), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val h1 = (0.0 - (Seq.fill(4)(r12(0.25 * math.log(0.25))).sum).toDouble)
    val h2 = (0.0 - (r12(0.75 * math.log(0.75)) +
      r12(0.25 * math.log(0.25))).toDouble)
    assert(got.toSeq === Seq(
      (1L, 4L, 4L, h1), (2L, 4L, 2L, h2), (3L, 3L, 1L, 0.0)))
    assert(math.abs(h1 - math.log(4.0)) < 1e-9)
    // the zero must be POSITIVE zero (bitwise oracle compare)
    assert(1.0 / got(2)._4 === Double.PositiveInfinity)
  }

  test("distributionDrift matches the hand JSD on a two-token shift") {
    import spark.implicits._
    // A: 3 'x', 1 'y' -> p(x)=.75; B: 1 'x', 3 'y' -> q(x)=.25
    val a = Seq("x x x y").toDF("text")
    val b = Seq("x y y y").toDF("text")
    def termOf(p: Double, q: Double): Double = {
      val t = 0.5 * (p * math.log(p / ((p + q) / 2.0))) +
        0.5 * (q * math.log(q / ((p + q) / 2.0)))
      BigDecimal(t).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = TextAnalysis.distributionDrift(a, b).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === Set(
      ("x", 3L, 1L, termOf(0.75, 0.25)),
      ("y", 1L, 3L, termOf(0.25, 0.75))))
  }

  test("distributionDrift: identical corpora score zero, one-sided " +
    "tokens get the ln-2 bound, empty cohorts refuse") {
    import spark.implicits._
    val a = Seq("alpha beta beta").toDF("text")
    val same = TextAnalysis.distributionDrift(a, a).collect()
    assert(same.forall(_.getDouble(3) === 0.0))
    // token only in A at p: term = ½p·ln2 (q = 0 side contributes 0)
    val b = Seq("alpha beta beta only").toDF("text")
    val gotOnly = TextAnalysis.distributionDrift(a, b).collect()
      .find(_.getString(0) == "only").get
    val half = BigDecimal(0.5 * (0.25 * math.log(2.0)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((gotOnly.getLong(1), gotOnly.getLong(2),
      gotOnly.getDouble(3)) === ((0L, 1L, half)))
    val e = intercept[IllegalArgumentException](
      TextAnalysis.distributionDrift(a, Seq("123 456").toDF("text")))
    assert(e.getMessage.contains("non-empty"))
  }

  test("persisted language model: append ≡ rebuild bitwise, classify from disk") {
    import spark.implicits._
    val train = Seq(
      (0L, "en", "the cat sat on the mat"),
      (1L, "en", "a dog ran in the park"),
      (2L, "de", "die katze sass auf der matte"),
      (3L, "de", "ein hund lief durch den park"))
      .toDF("row_id", "lang", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_lm_spec").toString
    try {
      TextAnalysis.writeLangModel(
        TextAnalysis.charNgramLangModel(
          train.where($"row_id" < 2), "lang", "text", 2), 2, base)
      TextAnalysis.appendToLangModel(spark, base,
        train.where($"row_id" >= 2), "lang", "text")
      val appended = spark.read.parquet(
          graft.sources.Artifacts.latestDir(spark, base) + "/model")
        .orderBy("lang", "g").collect().toSeq
      val rebuilt = TextAnalysis.charNgramLangModel(
          train, "lang", "text", 2)
        .orderBy("lang", "g").collect().toSeq
      assert(appended === rebuilt)
      // the pre-append version stays live for concurrent readers
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$base/v1")))
      assert(graft.sources.Artifacts.latestDir(spark, base)
        === s"$base/v2")
      val got = TextAnalysis.charNgramDetectPersisted(spark, base,
          Seq((10L, "der hund und die katze"), (11L, "the dog and the cat"))
            .toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((10L, "de"), (11L, "en")))
      // probing a path with no artifact fails loudly
      val e = intercept[IllegalArgumentException](
        TextAnalysis.charNgramDetectPersisted(spark, s"$base/nope",
          train, "row_id", "text"))
      assert(e.getMessage.contains("no language-model artifact"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }

  test("cjkAwareTokens segments Han per char, leaves alphabets untouched") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hello world"),
      (1L, "你好世界"),
      (2L, "mixed 数据 text"),
      (3L, "καλημέρα κόσμε")).toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        TextAnalysis.cjkAwareTokens($"text").as("a"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    assert(got === Seq(
      (0L, Seq("hello", "world")),
      (1L, Seq("你", "好", "世", "界")),
      (2L, Seq("mixed", "数", "据", "text")),
      (3L, Seq("καλημέρα", "κόσμε"))))
    // plain wordTokens keeps the Han clause as ONE run-token
    val plain = docs.where($"doc_id" === 1)
      .select(TextAnalysis.wordTokens($"text")).head().getSeq[String](0)
    assert(plain === Seq("你好世界"))
  }

  test("scriptProfile counts scripts, routes und/other, breaks ties alphabetically") {
    import spark.implicits._
    val docs = Seq(
      (0L, "привет world"),        // 6 cyrillic vs 5 latin
      (1L, "你好 мир"),             // 2 han vs 3 cyrillic
      (2L, "123 456"),             // no letters at all -> und
      (3L, "안녕하세요"),            // hangul (profiled since r10)
      (4L, "αβ ab"),               // 2 greek vs 2 latin tie -> greek
      (5L, "გამარჯობა"),           // georgian: letters, unprofiled -> other
      (6L, "ひらがな カタカナで"),    // 4 hiragana vs 5 katakana... see below
      (7L, "नमस्ते ไทย שלום"))      // devanagari 6 vs thai 3 vs hebrew 4
      .toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_letters"),
        r.getAs[String]("dominant"))).toSeq
    // doc 6: ひらがな + で = 5 hiragana vs カタカナ = 4 katakana.
    // doc 7: script classes include combining marks (नमस्ते = 6
    // Devanagari chars) while n_letters is \p{L}-only (11) — the
    // dominant argmax runs on the script counts.
    assert(got === Seq((0L, 11L, "cyrillic"), (1L, 5L, "cyrillic"),
      (2L, 0L, "und"), (3L, 5L, "hangul"), (4L, 4L, "greek"),
      (5L, 9L, "other"), (6L, 9L, "hiragana"),
      (7L, 11L, "devanagari")))
    val row0 = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .where($"doc_id" === 0).head()
    assert(row0.getAs[Long]("n_cyrillic") === 6L)
    assert(row0.getAs[Long]("n_latin") === 5L)
    assert(row0.getAs[Long]("n_han") === 0L)
  }

  test("cjkBigramTokens: overlapping Han bigrams; isolated Han char " +
    "stays a unigram; kana/Hangul/Latin pass through as wordTokens") {
    import spark.implicits._
    def toks(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextAnalysis.cjkBigramTokens($"t"))
        .as[Seq[String]].head()
    // L-run -> L-1 overlapping bigrams (Lucene CJKAnalyzer semantics)
    assert(toks("你好世界") === Seq("你好", "好世", "世界"))
    assert(toks("你好") === Seq("你好"))
    // isolated Han char: unigram, not dropped
    assert(toks("中") === Seq("中"))
    // mixed-script token splits at the script boundary, Han side slides
    assert(toks("abc中文字def") === Seq("abc", "中文", "文字", "def"))
    // kana, Hangul, Cyrillic, Latin: identical to the plain tokenizer
    Seq("ひらがな カタカナ", "한글 조선글", "привет мир",
      "the quick fox").foreach { s =>
      val plain = Seq(s).toDF("t")
        .select(TextAnalysis.wordTokens($"t")).as[Seq[String]].head()
      assert(toks(s) === plain, s"passthrough broke on: $s")
    }
    // empty / no letters
    assert(toks("") === Seq.empty)
    assert(toks("123 456") === Seq.empty)
  }

  test("cjkBigramTokensWide (Lucene CJKBigramFilter parity) slides " +
    "kana/Hangul too, and across CJK script boundaries") {
    import spark.implicits._
    def wide(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextAnalysis.cjkBigramTokensWide($"t"))
        .as[Seq[String]].head()
    // pure kana run slides (the Han-only form keeps it whole)
    assert(wide("ひらがな") === Seq("ひら", "らが", "がな"))
    // Hangul run slides
    assert(wide("한글조선") === Seq("한글", "글조", "조선"))
    // kana + Han mix is ONE contiguous CJK run — bigrams cross the
    // script boundary, as Lucene's single CJK class does
    assert(wide("今日はいい") ===
      Seq("今日", "日は", "はい", "いい"))
    // Latin/Cyrillic untouched; isolated CJK char stays a unigram
    assert(wide("abc 中 мир") === Seq("abc", "中", "мир"))
    // Script=Common CJK letters ride inside the run: the prolonged
    // sound mark (every katakana loanword) and the Han iteration mark
    assert(wide("データ") === Seq("デー", "ータ"))
    assert(wide("コンピューター") ===
      Seq("コン", "ンピ", "ピュ", "ュー", "ータ", "ター"))
    assert(wide("人々") === Seq("人々"))
    // the Han-only default is unchanged by the wide twin's existence
    val han = Seq("ひらがな 你好世界").toDF("t")
      .select(TextAnalysis.cjkBigramTokens($"t")).as[Seq[String]].head()
    assert(han === Seq("ひらがな", "你好", "好世", "世界"))
  }

  test("tokenEntropy with the cjkBigramTokens router gives Han text " +
    "real statistics; default tokenizer unchanged") {
    import spark.implicits._
    val docs = Seq(
      (0L, "你好世界你好"),           // one clause: plain = 1 giant token
      (1L, "the the cat")).toDF("doc_id", "text")
    val plain = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // plain: the zh doc is ONE token -> entropy 0
    assert(plain(0).getAs[Long]("n_tokens") === 1L)
    assert(plain(0).getAs[Double]("entropy") === 0.0)
    val bi = TextAnalysis.tokenEntropy(docs, "doc_id", "text",
        TextAnalysis.cjkBigramTokens)
      .orderBy("doc_id").collect()
    // bigrams: 你好,好世,世界,界你,你好 -> 5 tokens, 4 distinct, H > 0
    assert(bi(0).getAs[Long]("n_tokens") === 5L)
    assert(bi(0).getAs[Long]("n_distinct") === 4L)
    assert(bi(0).getAs[Double]("entropy") > 1.0)
    // the alphabetic row is identical under both tokenizers
    assert(bi(1).toSeq === plain(1).toSeq)
  }

  test("asciiFold: A-Z only, non-ASCII untouched; Column and String " +
    "forms agree; folded tokens keep boundaries") {
    import spark.implicits._
    val samples = Seq("The QUICK brØwn", "Éclair İstanbul ß",
      "ДОМ дом 你好", "")
    val got = samples.toDF("t")
      .select(TextAnalysis.asciiFold($"t")).as[String].collect().toSeq
    // ASCII letters fold; Ø É İ ß Д stay exactly as written
    assert(got === Seq("the quick brØwn", "Éclair İstanbul ß",
      "ДОМ дом 你好", ""))
    // the driver-side literal fold is the same map
    samples.zip(got).foreach { case (in, out) =>
      assert(TextAnalysis.asciiFoldStr(in) === out)
    }
    // fold=true tokenization = fold-then-tokenize: same token COUNT
    // (case is not a letter/non-letter property), folded spellings
    val t = Seq("The Cat-and-Dog show").toDF("t")
    val plain = t.select(TextAnalysis.wordTokens($"t"))
      .as[Seq[String]].head()
    val folded = t.select(TextAnalysis.wordTokens($"t", fold = true))
      .as[Seq[String]].head()
    assert(plain === Seq("The", "Cat", "and", "Dog", "show"))
    assert(folded === Seq("the", "cat", "and", "dog", "show"))
    // the generated DuckDB spelling carries the full 26-char map
    assert(TextAnalysis.asciiFoldSql("text") ===
      "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', " +
        "'abcdefghijklmnopqrstuvwxyz')")
  }

  test("encodingQuality counts the three mojibake signatures and " +
    "keeps genuinely-accented text clean") {
    import spark.implicits._
    val docs = Seq(
      (0L, "plain ascii"),
      (1L, s"bad ${0xFFFD.toChar}${0xFFFD.toChar}${0xFFFD.toChar}"),
      // U+0085 NEL is a legitimate newline (EBCDIC/ISO conversions) —
      // excluded from the C1 class; only U+009F counts here
      (2L, s"nel ${0x0085.toChar} and del-range ${0x009F.toChar}"),
      (3L, s"caf${0x00C3.toChar}${0x00A9.toChar} and " +
        s"${0x00E2.toChar}${0x20AC.toChar}${0x2122.toChar}"),
      (4L, s"caf${0x00E9.toChar} na${0x00EF.toChar}ve — clean unicode"),
      (5L, ""),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.encodingQuality(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got === Seq(
      (0L, 0L, 0L, 0L, true),
      (1L, 3L, 0L, 0L, false),
      (2L, 0L, 1L, 0L, false),
      (3L, 0L, 0L, 2L, false),
      (4L, 0L, 0L, 0L, true),
      (5L, 0L, 0L, 0L, true),
      // null text: counts coalesce to 0, verdict is a CONCRETE boolean
      (6L, 0L, 0L, 0L, true)))
  }

  test("collocations fold=true merges case variants of a bigram; " +
    "default stays case-exact") {
    import spark.implicits._
    // "The cat" appears capitalized twice and lowercase thrice —
    // folded they are ONE bigram with count 5
    val docs = Seq(
      "The cat sat", "The cat ran", "the cat is", "the cat was",
      "the cat sleeps", "dogs bark loud dogs bark often").toDF("text")
    val exact = TextAnalysis.collocations(docs, "text", minCount = 2,
        topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(exact.count(p => p._2 == "cat") === 2) // The+cat AND the+cat
    val folded = TextAnalysis.collocations(docs, "text", minCount = 2,
        topK = 10, fold = true)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(folded.filter(p => p._2 == "cat") ===
      Array(("the", "cat", 5L)))
  }
}
