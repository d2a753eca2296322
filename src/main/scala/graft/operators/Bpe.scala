package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding subword tokenizer: fit a merges table on the
  * corpus, apply it as a per-distinct-word kernel, count real subword
  * tokens per document — the token accounting a training pipeline
  * sizes context windows with (the `tokenCountBpeIsh` regex estimate
  * stays available as the zero-model fallback, but packing against an
  * estimate mis-sizes every pack).
  *
  * Semantics (the classic Sennrich/GPT-2 apply discipline):
  *   - pre-tokenize text into words with the engine's portable token
  *     regex ([[wordPattern]] — the q39 pattern, Java∩RE2);
  *   - a word starts as its codepoint sequence; repeatedly find the
  *     LOWEST-RANK merge whose pair is adjacent somewhere in the word
  *     and merge ALL its leftmost-first non-overlapping occurrences;
  *     stop when no merge applies. Iterations are word-length-bounded.
  *
  * Scale posture:
  *   - FIT: word counts are a distributed `groupBy` (the shuffle
  *     carries distinct words, never documents); only the top
  *     `maxFitWords` (count desc, word) — a model-sized, Heap's-law-
  *     bounded table — reach the driver, where the greedy merge loop
  *     runs in memory (the industry-standard trainer shape). The
  *     fitted merges table is k rows — a versioned artifact
  *     ([[writeBpeModel]], the scaler/lang-model precedent).
  *   - APPLY: the kernel runs once per DISTINCT word (the term-table
  *     device), never per occurrence; the occurrence stream only
  *     equi-joins the per-word token counts back and sums. The join is
  *     word↔word (short strings), the corpus text never shuffles. The
  *     kernel itself is a UDF by necessity — an iterative,
  *     data-dependent merge loop no builtin or codegen template
  *     expresses — but its input domain is the distinct-word table,
  *     not the corpus (the NFC-normalizer justification, bounded
  *     tighter).
  *
  * Determinism: fit tie-breaks are total ((count desc, left, right) on
  * pairs; (count desc, word) on the fit-vocabulary cut), the apply
  * loop is a pure function of (word, merges), and everything is exact
  * string/integer work — bit-identical under any partitioning, retry,
  * or engine. The oracle replays the apply loop per distinct word in a
  * recursive CTE over the PERSISTED merges table (SparkEntry q189).
  */
object Bpe {

  /** The engine's portable word regex (q39's `tokenCountBpeIsh`
    * pattern): maximal non-space/non-punctuation runs, or one
    * punctuation mark. Java∩RE2-safe, proven hash-exact on this corpus
    * at every scale factor. */
  val wordPattern = "[^\\s.,!?;:]+|[.,!?;:]"

  /** One fitted merge: `rank` is the fit order (lower = applied
    * first), the pair (`l`, `r`) concatenates to the merged token. */
  final case class Merge(rank: Int, l: String, r: String)

  /** A fitted tokenizer model (the merges list, rank-ordered). */
  final case class BpeModel(merges: IndexedSeq[Merge]) {
    /** rank lookup keyed by pair. */
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.map(m => (m.l, m.r) -> m.rank).toMap
  }

  // ------------------------------------------------------------ kernel

  /** A word as its Unicode CODEPOINT sequence (one token per
    * codepoint) — surrogate pairs stay whole, matching engines that
    * index by codepoint (the DuckDB oracle), not UTF-16 code unit. */
  private[operators] def codepointTokens(word: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Apply the fitted merges to one word: repeatedly merge all
    * leftmost-first non-overlapping occurrences of the lowest-rank
    * applicable pair until none applies. Word-length-bounded (every
    * round shrinks the token count by ≥1). */
  def tokenizeWord(word: String, model: BpeModel): Array[String] = {
    var toks = codepointTokens(word)
    var continue = toks.length > 1 && model.merges.nonEmpty
    while (continue) {
      // lowest-rank pair present anywhere in the word
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = model.ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val m = model.merges(best)
        val out = new mutable.ArrayBuffer[String](toks.length)
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == m.l && toks(j + 1) == m.r) {
            out += m.l + m.r
            j += 2
          } else {
            out += toks(j)
            j += 1
          }
        }
        toks = out.toArray
        continue = toks.length > 1
      }
    }
    toks
  }

  // --------------------------------------------------------------- fit

  /** Greedy BPE fit over a weighted word-count table (driver-side —
    * the caller bounds the table via [[fitBpe]]'s top-F cut). Each
    * round counts every adjacent pair across the tokenized vocabulary
    * (weighted by word count), merges the most frequent (ties: count
    * desc, left, right — a total order), and stops at `numMerges` or
    * when no pair reaches `minPairCount`. */
  def fitMerges(
      wordCounts: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L): IndexedSeq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    var words: Array[(Array[String], Long)] =
      wordCounts.iterator.map { case (w, c) => (codepointTokens(w), c) }
        .filter(_._1.length > 1).toArray
    val merges = IndexedSeq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val k = (toks(i), toks(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      // total-order pick: count desc, then (left, right) ascending
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, kv @ (k, c)) =>
          acc match {
            case Some((bk, bc))
                if bc > c || (bc == c &&
                  (bk._1 < k._1 || (bk._1 == k._1 && bk._2 <= k._2))) => acc
            case _ => Some(kv)
          }
      }
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          merges += Merge(rank, l, r)
          words = words.map { case (toks, cnt) =>
            val out = new mutable.ArrayBuffer[String](toks.length)
            var j = 0
            while (j < toks.length) {
              if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
                out += l + r
                j += 2
              } else {
                out += toks(j)
                j += 1
              }
            }
            (out.toArray, cnt)
          }.filter(_._1.length > 1)
          rank += 1
        case _ => exhausted = true
      }
      if (words.isEmpty) exhausted = true
    }
    merges.result()
  }

  /** Fit a BPE model on a corpus: distributed word counts, a bounded
    * (count desc, word) top-`maxFitWords` cut — the fit vocabulary is
    * model-sized however big the corpus (Heap's law gives sublinear
    * distinct-word growth, and the cut caps it outright; the mass the
    * tail contributes to pair statistics is negligible by Zipf) — then
    * the in-memory greedy trainer. */
  def fitBpe(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      maxFitWords: Int = 50000): BpeModel = {
    require(maxFitWords >= 1, s"maxFitWords must be >= 1, got $maxFitWords")
    val counts = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(wordPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word"))
      .limit(maxFitWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    BpeModel(fitMerges(counts, numMerges))
  }

  // ----------------------------------------------------------- apply

  /** Per-document REAL token accounting under a fitted model: returns
    * `(idCol, n_words, n_tokens)` — one row per document with at least
    * one word. The kernel runs per DISTINCT word; the occurrence
    * stream joins the per-word counts back and sums (exact longs). */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: BpeModel): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val kernel = udf { (w: String) =>
      tokenizeWord(w, bc.value).length.toLong
    }
    val words = docs.select(col(idCol),
      explode(regexp_extract_all(col(textCol),
        lit(wordPattern), lit(0))).as("word"))
    // distinct-word table: docs-derived, so it equi-joins (AQE may
    // still broadcast it when genuinely small) — never a forced
    // broadcast of corpus-derived state
    val perWord = words.select("word").distinct()
      .withColumn("n_tok", kernel(col("word")))
    words.join(perWord, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }

  /** Column of real BPE token counts for packing/chunking hooks: a
    * broadcast-model kernel over the text column directly (per-ROW —
    * use [[tokenCounts]] when the per-distinct-word join shape is
    * affordable; this form exists for single-pass composition into
    * operators that need a `Column => Column` hook). */
  def tokenCountCol(model: BpeModel)(text: Column): Column = {
    val spark = SparkSession.active
    val bc = spark.sparkContext.broadcast(model)
    // Compiled once here and serialized with the closure
    // (java.util.regex.Pattern is Serializable) — never per row.
    val pat = java.util.regex.Pattern.compile(wordPattern)
    val kernel = udf { (t: String) =>
      if (t == null) 0L
      else {
        val m = pat.matcher(t)
        var n = 0L
        while (m.find()) n += tokenizeWord(m.group(), bc.value).length
        n
      }
    }
    kernel(text)
  }

  // -------------------------------------------------------- artifacts

  /** Persist a fitted model as a versioned artifact (rank, l, r) —
    * the scaler/lang-model precedent: immutable versions, pinned
    * readers survive a republish. */
  def writeBpeModel(spark: SparkSession, path: String, model: BpeModel): Unit = {
    import spark.implicits._
    graft.sources.Artifacts.publishVersion(spark, path) { vdir =>
      model.merges.map(m => (m.rank, m.l, m.r))
        .toDF("rank", "l", "r")
        .coalesce(1).write.mode("overwrite").parquet(s"$vdir/merges")
    }
  }

  /** Load the latest published model version. */
  def readBpeModel(spark: SparkSession, path: String): BpeModel = {
    val vdir = graft.sources.Artifacts.latestDir(spark, path)
    val rows = spark.read.parquet(s"$vdir/merges")
      .orderBy("rank")
      .collect().map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
    BpeModel(rows.toIndexedSeq)
  }
}
