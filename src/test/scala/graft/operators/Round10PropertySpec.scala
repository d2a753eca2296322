package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded random-case invariants for the round-10 kernels: each test
  * replays many generated cases against an independent in-memory
  * replica (the Round8PropertySpec device). */
class Round10PropertySpec extends SparkSpec {

  private def isHan(cp: Int): Boolean =
    Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN

  /** Independent replica of [[TextAnalysis.cjkBigramTokens]]: pad Han
    * RUNS, split on non-letters, slide length-≥2 Han tokens. */
  private def bigramReplica(s: String): Seq[String] = {
    val padded = new StringBuilder
    var i = 0
    var inHan = false
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val han = isHan(cp)
      if (han && !inHan) padded.append(' ')
      if (!han && inHan) padded.append(' ')
      inHan = han
      padded.appendAll(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    padded.toString
      .split("[^\\p{L}]+").toSeq.filter(_.nonEmpty)
      .flatMap { t =>
        if (t.length >= 2 && t.forall(c => isHan(c.toInt)))
          t.sliding(2).toSeq
        else Seq(t)
      }
  }

  test("cjkBigramTokens ≡ independent pad/split/slide replica on " +
    "random mixed-script text") {
    import spark.implicits._
    val rnd = new scala.util.Random(47L)
    // BMP alphabets: ASCII letters, digits/punct, Han, hiragana,
    // Hangul syllables, Cyrillic — mixed freely
    val pools = Seq(
      ('a' to 'z') ++ ('A' to 'Z'),
      "0123456789 .,!? ".toSeq,
      (0x4E00 to 0x4E80).map(_.toChar),
      (0x3041 to 0x3060).map(_.toChar),
      (0xAC00 to 0xAC80).map(_.toChar),
      (0x0410 to 0x0440).map(_.toChar))
    val cases = (0 until 60).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map { _ =>
        val pool = pools(rnd.nextInt(pools.size))
        pool(rnd.nextInt(pool.size))
      }.mkString
    } :+ "" :+ "中" :+ "你好世界" :+ "abc中文字def" :+ "   "
    val got = cases.toDF("t")
      .select(TextAnalysis.cjkBigramTokens(col("t")))
      .as[Seq[String]].collect().toSeq
    cases.zip(got).foreach { case (s, g) =>
      assert(g === bigramReplica(s), s"diverged on: [$s]")
    }
  }

  test("asciiFold: idempotent, per-char, Column ≡ String form, and " +
    "folded tokenization ≡ tokenize-the-folded-string") {
    import spark.implicits._
    val rnd = new scala.util.Random(53L)
    val pool = "AZmzÉéДд中ひ한 .!09aQ"
    val cases = (0 until 80).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length)))
        .mkString
    }
    val folded = cases.toDF("t")
      .select(TextAnalysis.asciiFold(col("t"))).as[String].collect().toSeq
    cases.zip(folded).foreach { case (in, out) =>
      val ref = in.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      assert(out === ref, s"fold diverged on [$in]")
      assert(TextAnalysis.asciiFoldStr(in) === ref)
      assert(TextAnalysis.asciiFoldStr(ref) === ref) // idempotent
    }
    val viaCol = cases.toDF("t")
      .select(TextAnalysis.wordTokens(col("t"), fold = true))
      .as[Seq[String]].collect().toSeq
    val viaStr = cases.map(s => TextAnalysis.asciiFoldStr(s)
      .split("[^\\p{L}]+").toSeq.filter(_.nonEmpty))
    assert(viaCol === viaStr)
  }

  test("jaccardCol ≡ jaccardSorted on random sorted-distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(59L)
    val cases = (0 until 60).map { _ =>
      def arr() = (0 until rnd.nextInt(20))
        .map(_ => rnd.nextInt(30).toLong).distinct.sorted.toArray
      (arr(), arr())
    } :+ ((Array.emptyLongArray, Array.emptyLongArray))
    val got = cases.map { case (a, b) => (a.toSeq, b.toSeq) }
      .toDF("a", "b")
      .select(Dedup.jaccardCol(col("a"), col("b")))
      .as[Double].collect().toSeq
    cases.zip(got).foreach { case ((a, b), g) =>
      // same int-over-int division — bitwise equal, not approximate
      assert(g === Dedup.jaccardSorted(a, b),
        s"diverged on ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("charNgramDetect ≡ independent exact-decimal NB replica on " +
    "random corpora (the per-(gram,lang) term refactor is invisible)") {
    import spark.implicits._
    val rnd = new scala.util.Random(61L)
    // three synthetic "languages" with skewed char distributions
    val alphabets = Map(
      "aa" -> "aabbcx", "bb" -> "bbccdx", "cc" -> "ccddax")
    (0 until 5).foreach { _ =>
      def sentence(lang: String): String = {
        val a = alphabets(lang)
        (0 until 4 + rnd.nextInt(12))
          .map(_ => a(rnd.nextInt(a.length))).mkString
      }
      val train = alphabets.keys.toSeq.sorted
        .flatMap(l => (0 until 4).map(_ => (l, sentence(l))))
      val test = (0 until 10).map { i =>
        (i.toLong, sentence(alphabets.keys.toSeq(rnd.nextInt(3))))
      }
      // independent replica: integer counts, 12-dp HALF_UP rounded ln
      // term per occurrence (the PRE-refactor definition), BigDecimal
      // sums, (score desc, lang asc) argmax
      def grams(s: String): Seq[String] =
        if (s.length < 2) Seq.empty else s.sliding(2).toSeq
      val counts: Map[(String, String), Long] = train
        .flatMap { case (l, t) => grams(t).map(g => (l, g)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val nLang: Map[String, Long] =
        counts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
      val vocab = counts.keys.map(_._2).toSet.size
      def term(l: String, g: String): BigDecimal = {
        val c = counts.getOrElse((l, g), 0L)
        BigDecimal.valueOf(
            math.log((c + 1).toDouble / (nLang(l) + vocab).toDouble))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val expect = test.flatMap { case (id, t) =>
        val gs = grams(t)
        if (gs.isEmpty) None
        else {
          val best = nLang.keys.toSeq.sorted.map { l =>
            (gs.map(g => term(l, g)).sum, l)
          }.minBy { case (s, l) => (-s, l) }(
            Ordering.Tuple2(Ordering[BigDecimal], Ordering[String]))
          Some(id -> best._2)
        }
      }.toMap
      val model = TextAnalysis.charNgramLangModel(
        train.toDF("lang", "text").repartition(3), "lang", "text", n = 2)
      val got = TextAnalysis.charNgramDetect(
          model, test.toDF("doc_id", "text").repartition(2),
          "doc_id", "text", n = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === expect)
    }
  }
}
