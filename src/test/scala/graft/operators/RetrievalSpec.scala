package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  private val corpus = Seq(
    1L -> "spark merge join dup dup dup",
    2L -> "spark spark spark merge merge join scan filter",
    3L -> "completely unrelated words only here",
    4L -> "merge",
    5L -> "dup spark")

  private def brute(query: Seq[String], k1: Double, b: Double) = {
    val toks = corpus.map { case (id, t) =>
      id -> t.split(TextAnalysis.tokenSplitRe).filter(_.nonEmpty).toSeq
    }
    val nDocs = corpus.size.toDouble
    val avgdl = toks.map(_._2.size).sum / nDocs
    val dfm = query.map(q =>
      q -> toks.count(_._2.contains(q)).toDouble).toMap
    toks.flatMap { case (id, ts) =>
      val s = query.map { q =>
        val tf = ts.count(_ == q).toDouble
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log((nDocs - dfm(q) + 0.5) / (dfm(q) + 0.5) + 1.0)
          BigDecimal(idf * (tf * (k1 + 1)) /
            (tf + k1 * (1.0 - b + b * ts.size / avgdl)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      if (s == 0) None
      else Some(id -> s.setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }.sortBy { case (id, s) => (-s, id) }
  }

  test("bm25TopK equals an independent in-memory BM25") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text").repartition(3)
    val got = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("dup", "spark", "merge"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === brute(Seq("dup", "spark", "merge"), 1.2, 0.75))
    // rare term dominates: doc 1 (3x dup) outranks doc 2 (3x spark)
    assert(got.head._1 === 1L)
    // doc 3 matches no term and must not appear
    assert(!got.exists(_._1 == 3L))
  }

  test("bm25TopK fold=true matches 'The'/'the' both ways; default " +
    "stays case-exact") {
    import spark.implicits._
    // mixed-case corpus: unfolded, 'The' and 'the' are distinct terms
    val mixed = Seq(
      1L -> "The cat sat",
      2L -> "the cat ran",
      3L -> "THE DOG",
      4L -> "unrelated words").toDF("doc_id", "text")
    // folded: query 'The' reaches docs 1, 2, AND 3
    val folded = Retrieval.bm25TopK(mixed, "doc_id", "text",
        Seq("The"), topK = 10, fold = true)
      .collect().map(_.getLong(0)).toSet
    assert(folded === Set(1L, 2L, 3L))
    // default: query 'The' matches only the exact-case doc 1
    val exact = Retrieval.bm25TopK(mixed, "doc_id", "text",
        Seq("The"), topK = 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact === Set(1L))
    // fold is ASCII-range only: non-ASCII case pairs stay distinct
    val uni = Seq(1L -> "Éclair éclair", 2L -> "Дом дом")
      .toDF("doc_id", "text")
    val gotU = Retrieval.bm25TopK(uni, "doc_id", "text",
        Seq("éclair"), topK = 10, fold = true)
      .collect().map(_.getLong(0)).toSet
    assert(gotU === Set(1L)) // Éclair did NOT fold into éclair
    // and a folded all-lowercase query over all-lowercase text is
    // bit-identical to the unfolded run (existing rows unchanged)
    val df = corpus.toDF("doc_id", "text")
    val a = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("dup", "spark"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bF = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("DUP", "Spark"), topK = 10, fold = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === bF)
  }

  test("bm25TopK with the cjkBigramTokens tokenizer retrieves Han " +
    "text the default tokenizer cannot") {
    import spark.implicits._
    val zh = Seq(
      1L -> "你好世界今天天气很好",    // contains bigram 你好
      2L -> "数据处理需要规划",        // does not
      3L -> "你好朋友").toDF("doc_id", "text")
    // default: each clause is ONE token — the bigram query matches nothing
    val plain = Retrieval.bm25TopK(zh, "doc_id", "text", Seq("你好"),
      topK = 10)
    assert(plain.count() === 0)
    // bigram tokenizer: docs 1 and 3 contain 你好
    val bi = Retrieval.bm25TopK(zh, "doc_id", "text", Seq("你好"),
        topK = 10, tokenizer = TextAnalysis.cjkBigramTokens)
      .collect().map(_.getLong(0)).toSet
    assert(bi === Set(1L, 3L))
    // and on pure-ASCII corpora the hook is a no-op: identical rows
    val df = corpus.toDF("doc_id", "text")
    val a = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("dup", "spark"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val c = Retrieval.bm25TopK(df, "doc_id", "text",
        Seq("dup", "spark"), topK = 10,
        tokenizer = TextAnalysis.cjkBigramTokens)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === c)
  }

  test("rrfFuse matches hand-computed reciprocal-rank fusion") {
    import spark.implicits._
    // sparse ranks: 10->1, 20->2, 30->3; dense ranks: 20->1, 40->2
    val sparse = Seq(10L -> 9.0, 20L -> 5.0, 30L -> 1.0).toDF("id", "score")
    val dense = Seq(20L -> 0.9, 40L -> 0.8).toDF("id", "score")
    val got = Retrieval.rrfFuse(sparse, dense, "id", c = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = Seq(
      20L -> (1.0 / 62 + 1.0 / 61), // in both lists
      10L -> 1.0 / 61,
      40L -> 1.0 / 62,
      30L -> 1.0 / 63)
    assert(got === exp)
  }

  test("rrfFuse breaks equal-score rank ties by id") {
    import spark.implicits._
    val sparse = Seq(7L -> 1.0, 3L -> 1.0).toDF("id", "score")
    val dense = spark.emptyDataset[(Long, Double)].toDF("id", "score")
    val got = Retrieval.rrfFuse(sparse, dense, "id")
      .collect().map(r => r.getLong(0)).toSeq
    assert(got === Seq(3L, 7L)) // id 3 ranks first on the tie
  }

  test("bm25TopK plans the top-k as TakeOrderedAndProject") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val plan = Retrieval.bm25TopK(df, "doc_id", "text", Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
