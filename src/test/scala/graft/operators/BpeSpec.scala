package graft.operators

import graft.SparkSpec
import graft.operators.Bpe._

/** The BPE subword tokenizer: fit determinism (total-order
  * tie-breaks), the apply kernel's leftmost-first/lowest-rank merge
  * discipline, codepoint (not UTF-16 unit) segmentation, the
  * distributed tokenCounts shape, and the versioned model artifact. */
class BpeSpec extends SparkSpec {

  test("fit on the classic corpus merges the most frequent pair first, " +
    "ties broken (count desc, left, right)") {
    // "low":5 "lower":2 "newest":6 "widest":3  (Sennrich et al. shape)
    val counts = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = fitMerges(counts, numMerges = 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8(newest 6 + lower 2), ...
    // (e,s) vs (s,t) tie at 9 -> lexicographically smaller left wins: (e,s)
    assert(merges(0) == Merge(0, "e", "s"))
    // round 2: (es,t)=9 is now the top pair
    assert(merges(1) == Merge(1, "es", "t"))
    assert(merges.map(_.rank) == (0 until merges.length))
  }

  test("fit stops when no pair reaches minPairCount and never emits " +
    "beyond numMerges") {
    val merges = fitMerges(Seq(("abc", 1L), ("xyz", 1L)), numMerges = 10)
    assert(merges.isEmpty) // every pair count is 1 < minPairCount 2
    val some = fitMerges(Seq(("aaaa", 3L)), numMerges = 1)
    assert(some == IndexedSeq(Merge(0, "a", "a")))
  }

  test("apply merges all leftmost-first non-overlapping occurrences of " +
    "the lowest-rank applicable pair, iterating to fixpoint") {
    val m = BpeModel(IndexedSeq(Merge(0, "a", "a"), Merge(1, "aa", "b")))
    // leftmost-first, non-overlapping: aaa -> [aa, a]
    assert(tokenizeWord("aaa", m).toSeq == Seq("aa", "a"))
    assert(tokenizeWord("aaaa", m).toSeq == Seq("aa", "aa"))
    // a pair NEWLY CREATED by a merge is found on the next round:
    // aab -> [aa, b] (rank 0) -> [aab] (rank 1 now applicable)
    assert(tokenizeWord("aab", m).toSeq == Seq("aab"))
    // but leftmost-first merging can strand a suffix: aaab merges the
    // FIRST (a,a) -> [aa, a, b]; neither (aa,a) nor (a,b) is a merge
    assert(tokenizeWord("aaab", m).toSeq == Seq("aa", "a", "b"))
    // unknown material stays codepoint-split
    assert(tokenizeWord("xyz", m).toSeq == Seq("x", "y", "z"))
    assert(tokenizeWord("a", m).toSeq == Seq("a"))
  }

  test("apply rescans ranks after each merge (lower rank re-applies " +
    "when a merge re-exposes its pair)") {
    val m = BpeModel(IndexedSeq(Merge(0, "b", "c"), Merge(1, "a", "bc")))
    assert(tokenizeWord("abc", m).toSeq == Seq("abc"))
    assert(tokenizeWord("abcbc", m).toSeq == Seq("abc", "bc"))
  }

  test("kernel segments by CODEPOINT: surrogate pairs stay whole") {
    val rocket = new String(Character.toChars(0x1F680)) // astral plane
    val toks = codepointTokens(s"a${rocket}b")
    assert(toks.toSeq == Seq("a", rocket, "b"))
    val m = BpeModel(IndexedSeq(Merge(0, "a", rocket)))
    assert(tokenizeWord(s"a${rocket}b", m).toSeq == Seq(s"a$rocket", "b"))
  }

  test("fitBpe + tokenCounts: distributed counts equal a driver replay " +
    "word by word") {
    import spark.implicits._
    val docs = Seq(
      (0L, "low low lower newest"),
      (1L, "newest newest widest low"),
      (2L, "widest lower, newest!"),
      (3L, "")).toDF("doc_id", "text")
    val model = fitBpe(docs, "text", numMerges = 6)
    assert(model.merges.nonEmpty)
    val got = Bpe.tokenCounts(docs, "doc_id", "text", model)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver replay over the same pre-tokenization
    val p = java.util.regex.Pattern.compile(wordPattern)
    val want = Seq(0L, 1L, 2L).map { id =>
      val text = Seq("low low lower newest", "newest newest widest low",
        "widest lower, newest!")(id.toInt)
      val mt = p.matcher(text)
      var nw = 0L; var nt = 0L
      while (mt.find()) { nw += 1; nt += tokenizeWord(mt.group(), model).length }
      (id, nw, nt)
    }
    assert(got.toSeq == want) // doc 3 has no words -> no row
    // real subword accounting: strictly fewer tokens than codepoints,
    // at least as many as words
    got.foreach { case (_, nw, nt) => assert(nt >= nw) }
  }

  test("model artifact roundtrips through the versioned store and " +
    "republish keeps readers on complete versions") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-model").toString
    val m1 = BpeModel(IndexedSeq(Merge(0, "a", "b"), Merge(1, "ab", "c")))
    writeBpeModel(spark, s"$dir/m", m1)
    assert(readBpeModel(spark, s"$dir/m") == m1)
    val m2 = BpeModel(IndexedSeq(Merge(0, "x", "y")))
    writeBpeModel(spark, s"$dir/m", m2)
    assert(readBpeModel(spark, s"$dir/m") == m2)
  }

  test("tokenCountCol hook counts whole-text tokens for pack/chunk " +
    "composition") {
    import spark.implicits._
    val docs = Seq((0L, "low low!"), (1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = BpeModel(IndexedSeq(Merge(0, "l", "o"), Merge(1, "lo", "w")))
    val got = docs.select($"doc_id",
        Bpe.tokenCountCol(model)($"text").as("n"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(3L, 0L)) // [low][low][!] ; null -> 0
  }
}
