package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("repetitionStats: diversity, bigram mode, and gate edges") {
    import spark.implicits._
    val docs = Seq(
      // 6 tokens, 2 distinct; bigrams a-b,b-a,a-b,b-a,a-b -> top 3
      (1L, "a b a b a b"),
      // all-distinct 12 tokens, 11 distinct bigrams (top 1) -> keep
      (2L, "a b c d e f g h i j k l"),
      // diverse but short: 4 tokens, top bigram 1, 10 > 3 -> reject
      (3L, "w x y z"),
      (4L, ""),
      (5L, "solo"))
      .toDF("doc_id", "text")
    val got = Curation.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got === Array(
      (1L, 6L, 2L, 3L, false),   // ttr 1/3 < 0.4, top 3/5 > 0.1
      (2L, 12L, 12L, 1L, true),  // ttr 1, top 1*10 <= 11 bigrams
      (3L, 4L, 4L, 1L, false),   // short-doc cut: 1*10 > 3 bigrams
      (4L, 0L, 0L, 0L, false),   // empty never kept
      (5L, 1L, 1L, 0L, false)))  // single token: below min-length cut
  }

  test("contamination flags gram overlap, counts distinct grams once") {
    import spark.implicits._
    val docs = Seq(
      // test doc
      (0L, "q w e r t y u i o p"),
      // train near-dup: shares 5-grams with doc 0
      (7L, "q w e r t y u i o p extra"),
      // train doc repeating ONE shared 5-gram twice - distinct => 1
      (8L, "q w e r t z q w e r t"),
      // unrelated train doc
      (9L, "m n b v c x l k j h"))
      .toDF("doc_id", "text")
    val flagged = Curation.contamination(docs, "doc_id", "text",
      isTest = col("doc_id") === 0, n = 5, minShared = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 7: windows of "q w e r t y u i o p" -> 6 shared 5-grams;
    // doc 8 shares only "q w e r t" (once, distinct) -> below floor
    assert(flagged === Array((7L, 6L)))

    val floor1 = Curation.contamination(docs, "doc_id", "text",
      isTest = col("doc_id") === 0, n = 5, minShared = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(floor1 === Array((7L, 6L), (8L, 1L)))
  }

  test("tokenChunks: overlap, tail chunk, boundary, and empty docs") {
    import spark.implicits._
    val docs = Seq(
      // 7 tokens, size 4 stride 3: [t0..t3], [t3..t6], [t6]
      (1L, "a b c d e f g"),
      // exactly one full chunk: starts 0 and 3 (3 < 4 tokens)
      (2L, "p q r s"),
      // shorter than one chunk
      (3L, "x y"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = Curation.tokenChunks(docs, "doc_id", "text", 4, 3)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 0L, 4L, "a b c d"),
      (1L, 1L, 4L, "d e f g"),
      (1L, 2L, 1L, "g"),
      (2L, 0L, 4L, "p q r s"),
      (2L, 1L, 1L, "s"),
      (3L, 0L, 2L, "x y")))   // doc 4 (empty) yields no chunks
  }

  test("packSequences: first-fit boundaries, oversized doc, buckets") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      // bucket 0 (ids 0,2,4,6): 6 + 3 fill pack 0; 2 overflows -> pack 1
      (0L, words(6)), (2L, words(3)), (4L, words(2)), (6L, words(1)),
      // bucket 1 (ids 1,3,5): oversized 12 packs alone; 5+5 fits pack 1
      (1L, words(12)), (3L, words(5)), (5L, words(5)))
      .toDF("doc_id", "text")
    val got = Curation.packSequences(docs, "doc_id", "text",
        capacity = 10L, nBuckets = 2)
      .orderBy("bucket", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      (0L, 0L, 6L, 0L), (0L, 2L, 3L, 0L),
      (0L, 4L, 2L, 1L), (0L, 6L, 1L, 1L),
      (1L, 1L, 12L, 0L), (1L, 3L, 5L, 1L), (1L, 5L, 5L, 1L)))
  }

  test("packSequencesGlobal: harmonic classes, determinism, bounds") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // capacity 10 → classes: 12-token doc → cls 0 (own pack);
    // 6,7 → cls 1; 4,5 → cls 2; 3 → cls 3; 1,2 → cls ≥ 5
    val docs = Seq(
      (1L, words(12)), (2L, words(7)), (3L, words(6)), (4L, words(5)),
      (5L, words(5)), (6L, words(4)), (7L, words(3)), (8L, words(3)),
      (9L, words(3)), (10L, words(3)), (11L, words(1)))
    val got = Curation.packSequencesGlobal(
        docs.toDF("doc_id", "text"), "doc_id", "text", capacity = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    // expected: cls 0 (base 0): doc 1 pack 0; cls 1 (base 1): docs 2,7
    //   by (n desc, id): 2→pack 1, 3→pack 2; cls 2 (base 3): 4,5,6 →
    //   packs 3,3,4; cls 3 (base 5): 7,8,9,10 → packs 5,5,5,6;
    //   cls 10 (base 7): 11 → pack 7
    assert(got === Array(
      (0L, 1L, 12L, 0L), (1L, 2L, 7L, 1L), (1L, 3L, 6L, 2L),
      (2L, 4L, 5L, 3L), (2L, 5L, 5L, 3L), (2L, 6L, 4L, 4L),
      (3L, 7L, 3L, 5L), (3L, 8L, 3L, 5L), (3L, 9L, 3L, 5L),
      (3L, 10L, 3L, 6L), (10L, 11L, 1L, 7L)))
    // invariant to input partitioning (the per-bucket greedy is not)
    val re = Curation.packSequencesGlobal(
        docs.toDF("doc_id", "text").repartition(7), "doc_id", "text",
        capacity = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    assert(re === got)
  }

  test("packSequencesGlobal: capacity bound and pack-count guarantee") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val rnd = new scala.util.Random(7)
    val docs = (0L until 500L).map(i => (i, words(1 + rnd.nextInt(120))))
    val cap = 128L
    val got = Curation.packSequencesGlobal(
        docs.toDF("doc_id", "text"), "doc_id", "text", capacity = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 500)
    assert(got.map(_._2).distinct.length === 500)
    // every pack fits (no doc here exceeds the capacity)
    val fills = got.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
    assert(fills.values.forall(_ <= cap))
    // pack ids are dense 0..P-1
    val packs = fills.keys.toSeq.sorted
    assert(packs === (0L until packs.length.toLong))
    // harmonic guarantee: packs ≤ 2·⌈Σn/cap⌉ + #classes
    val total = got.map(_._3).sum
    val nClasses = got.map(_._1).distinct.length
    assert(packs.length <= 2 * ((total + cap - 1) / cap) + nClasses,
      s"${packs.length} packs for total $total, $nClasses classes")
    // uniform-length corpus packs optimally: k docs per pack exactly
    val uni = (0L until 100L).map(i => (i, words(30)))
    val uniPacks = Curation.packSequencesGlobal(
        uni.toDF("doc_id", "text"), "doc_id", "text", capacity = 128L)
      .collect().map(_.getLong(3)).distinct.length
    assert(uniPacks === 25) // 4 per pack (cls = 128/30 = 4), 100/4
  }

  test("normalizeText: NFC composition, control strip, collapse, trim") {
    import spark.implicits._
    val df = Seq(
      // NUL + tab controls, space runs, decomposed e + combining acute
      "  a\u0000b  c\td e\u0301  ",
      "clean text",
      null.asInstanceOf[String]).toDF("t")
    val got = df.select(TextAnalysis.normalizeText(col("t")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) === "a b c d \u00e9") // e-acute composed to ONE codepoint
    assert(got(0).length === 9)          // 10 if NFC had not composed
    assert(got(1) === "clean text")      // idempotent on clean input
    assert(got(2) === null)
  }

  test("normalizeText is one codegen span — graft_nfc expression, " +
    "no ScalaUDF boundary (the engine's last UDF, graduated r14)") {
    // non-foldable input: over a LITERAL, ConstantFolding evaluates
    // graft_nfc at plan time and the executed plan is a LocalTableScan
    // (itself proof the expression is a first-class foldable Catalyst
    // citizen, but not the span we want to assert)
    val q = spark.range(2)
      .select(concat(col("id").cast("string"), lit("e\u0301x")).as("t"))
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("UDF("), p)
    assert(p.toLowerCase.contains("graft_nfc"), p)
    assert(p.contains("*(1) Project"), p) // * = whole-stage codegen
    assert(q.orderBy("n").head().getString(0) === "0\u00e9x") // composed
  }

  test("redactPii scrubs emails and phones, counts spans") {
    import spark.implicits._
    val df = Seq(
      "mail a.b+c@x-y.example now or dial 555-0199 twice 555-0100",
      "no pii here 123-45 12345678 user@nodot",
      // phone-shaped digits inside an email local part: ONE span
      // (the email pass consumes it), so the count must be 1, not 2
      "dial 555-0199@mail.example",
      "").toDF("t")
    val got = df.select(
      TextAnalysis.redactPii(col("t")).as("r"),
      TextAnalysis.piiCount(col("t")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got(0) === (("mail <EMAIL> now or dial <PHONE> twice <PHONE>", 3L)))
    assert(got(1) === (("no pii here 123-45 12345678 user@nodot", 0L)))
    assert(got(2) === (("dial <EMAIL>", 1L)))
    assert(got(3) === (("", 0L)))
  }

  test("lmScore equals a hand-computed Laplace bigram model") {
    import spark.implicits._
    // cb: (a,b)=3 (b,a)=1 (b,c)=1; cu: a=3 b=2; V = 2 contexts
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text").repartition(2)
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(sum: BigDecimal, n: Int) = {
      val v = sum.toDouble / n.toDouble
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val lpAB = r9(math.log(4.0 / (3.0 + 2.0)))
    val lpBA = r9(math.log(2.0 / (2.0 + 2.0)))
    val lpBC = r9(math.log(2.0 / (2.0 + 2.0)))
    val exp = Seq( // (doc, n_bigrams, avg) ordered by avg asc
      (2L, 2L, r6(lpAB + lpBC, 2)),
      (1L, 3L, r6(lpAB + lpBA + lpAB, 3)))
    val got = Curation.lmScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === exp) // doc 3 has no bigram and is excluded
  }

  test("duplicatedGramStats equals a brute-force string-gram replica") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat"), // internal repeat
      (2L, "the cat sat on a red mat today"),          // shares a prefix
      (3L, "entirely different words appear here now"),
      (4L, "too short"),                               // < w tokens
      (5L, ""))
      .toDF("doc_id", "text").repartition(3)
    val w = 3
    val toks: Map[Long, Seq[String]] = Seq(
      1L -> "the cat sat on the mat and the cat sat",
      2L -> "the cat sat on a red mat today",
      3L -> "entirely different words appear here now",
      4L -> "too short", 5L -> "").toMap
      .map { case (id, t) =>
        id -> t.split(TextAnalysis.tokenSplitRe).toSeq.filter(_.nonEmpty) }
    val gramSets: Map[Long, Set[String]] = toks.collect {
      case (id, a) if a.size >= w =>
        id -> a.sliding(w).map(_.mkString(" ")).toSet
    }
    val dfreq: Map[String, Int] = gramSets.values.flatten
      .groupBy(identity).view.mapValues(_.size).toMap
    val exp = gramSets.toSeq.sortBy(_._1).map { case (id, gs) =>
      val dup = gs.count(dfreq(_) >= 2)
      (id, gs.size.toLong, dup.toLong,
        BigDecimal(dup.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Curation.duplicatedGramStats(docs, "doc_id", "text", w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === exp) // docs 4 and 5 fall below the w-token floor
  }

  test("duplicatedGramStats counts within-doc repeats once") {
    import spark.implicits._
    // "a b a b a b": distinct 2-grams {a b, b a}; no other doc shares
    val docs = Seq((1L, "a b a b a b"), (2L, "c d e"))
      .toDF("doc_id", "text")
    val got = Curation.duplicatedGramStats(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Array((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0)))
  }

  // ------------------------------------------------- span-level dedup

  private def spanRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("spanDedup keeps the corpus-wide first occurrence of each span") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g"), // spans(3): "a b c" "d e f" "g"
      (1L, "a b c x y z"),   // "a b c" is doc0's — dropped
      (2L, "p q r p q r"),   // internal repeat — second dropped
      (3L, "d e f"),         // fully duplicated — survives empty
      (4L, "")               // blank — zero spans
    ).toDF("doc_id", "text")
    val got = spanRows(Curation.spanDedup(docs, "doc_id", "text", 3))
    assert(got === Seq(
      (0L, 3L, 3L, "a b c d e f g"),
      (1L, 2L, 1L, "x y z"),
      (2L, 2L, 1L, "p q r"),
      (3L, 1L, 0L, ""),
      (4L, 0L, 0L, "")))
  }

  test("spanDedup is partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val words = Vector("w0", "w1", "w2", "w3", "w4", "w5")
    val docs = (0L until 40L).map(i =>
      (i, Seq.fill(6 + rnd.nextInt(10))(words(rnd.nextInt(6)))
        .mkString(" ")))
    val a = spanRows(Curation.spanDedup(
      docs.toDF("doc_id", "text"), "doc_id", "text", 2))
    val b = spanRows(Curation.spanDedup(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text", 2))
    assert(a === b)
    // and a doc with no duplicated spans round-trips its text
    val solo = spanRows(Curation.spanDedup(
      Seq((9L, "u1 u2 u3 u4 u5")).toDF("doc_id", "text"),
      "doc_id", "text", 2))
    assert(solo === Seq((9L, 3L, 3L, "u1 u2 u3 u4 u5")))
  }

  test("packSequences accepts a real-tokenizer hook (BPE counts) and " +
    "packs by the hook's sizes; default stays whitespace") {
    import spark.implicits._
    val docs = Seq(
      (0L, "low low low low"), // 4 words; BPE(l+o, lo+w): 4 tokens
      (1L, "lower lower"),     // 2 words; [low][e][r] each: 6 tokens
      (2L, "x y z")            // 3 words; 3 unknown single chars
    ).toDF("doc_id", "text")
    val model = Bpe.BpeModel(IndexedSeq(
      Bpe.Merge(0, "l", "o"), Bpe.Merge(1, "lo", "w")))
    val packed = Curation.packSequences(docs, "doc_id", "text",
        capacity = 8, nBuckets = 1,
        tokenCount = Bpe.tokenCountCol(model))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // BPE sizes 4/6/3 -> first-fit at capacity 8 packs each doc alone
    // (4+6 > 8, then 6+3 > 8) — the hook changed the packing, which
    // is the point: whitespace sizes 4/2/3 would all share pack 0
    assert(packed.toSeq == Seq((0L, 4L, 0L), (1L, 6L, 1L), (2L, 3L, 2L)))
    // default hook unchanged: whitespace counts 4/2/3 all fit pack 0
    val ws = Curation.packSequences(docs, "doc_id", "text",
        capacity = 9, nBuckets = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ws.toSeq == Seq((0L, 4L, 0L), (1L, 2L, 0L), (2L, 3L, 0L)))
  }
}
