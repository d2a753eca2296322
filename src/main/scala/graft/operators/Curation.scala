package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: intra-doc
  * repetition quality stats (Gopher-style filters) and train/test
  * decontamination by n-gram overlap.
  *
  * Scale posture: [[repetitionStats]] is a pure per-row computation —
  * every metric depends only on the row's own text, so it runs
  * entirely map-side with ZERO shuffle (the groupBy-bigram formulation
  * would shuffle one row per (doc, bigram) — more than the corpus
  * itself). [[contamination]] joins on 8-byte gram hashes with the
  * (small) held-out side broadcast, so the 100 TB train corpus is
  * never shuffled.
  */
object Curation {

  /** Whitespace tokens of trimmed text; `[]` for blank text. */
  private def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Adjacent word n-grams as space-joined strings; `[]` when the text
    * has fewer than `n` tokens. */
  private def wordGrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document repetition/diversity stats, the Gopher-style quality
    * gate (duplicate-n-gram and type-token-ratio filters):
    * `(id, n_tokens, n_distinct, top_bigram_n, keep)` with
    * `keep = type-token ratio >= 0.4 AND top-bigram fraction <= 0.1`,
    * both as exact integer cross-multiplications (no float rounding to
    * drift across engines). The gate subsumes a min-length cut: 0/1
    * token docs are rejected outright, and below 11 tokens even an
    * all-distinct doc fails `top * 10 <= n_bigrams` — intended; very
    * short docs are rejects in this kind of filter anyway.
    *
    * The most-frequent-bigram count is computed per row by sorting the
    * row's bigram array and taking the longest equal run (`aggregate`
    * HOF) — O(tokens log tokens) per document and no shuffle, where
    * the explode + groupBy(doc, bigram) form ships more rows than the
    * corpus holds. */
  def repetitionStats(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val bgs = array_sort(wordGrams(col(textCol), 2))
    val topRun = aggregate(
      bgs,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    df.select(
      col(idCol),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      topRun.as("top_bigram_n"))
      .withColumn("keep",
        col("n_tokens") > 1 &&
          col("n_distinct") * 5 >= col("n_tokens") * 2 &&
          col("top_bigram_n") * 10 <= greatest(col("n_tokens") - 1, lit(0L)))
  }

  /** Fixed-size overlapping token windows — the context-window prep
    * step that turns curated documents into training sequences. Chunk
    * `c` of a document covers tokens `[c*stride, c*stride + chunkSize)`
    * (half-open, 0-based); the final chunk may be shorter. Documents
    * with zero tokens yield no chunks.
    *
    * Scale posture: entirely map-side — `sequence` + `posexplode` +
    * `slice` are narrow, so a 100 TB corpus chunks with ZERO shuffle
    * and the output fan-out (~n_tokens/stride rows per doc) streams
    * straight to the sink. Returns
    * `(idCol, chunk_id, n_tokens, chunk_text)`. */
  def tokenChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val t = tokens(col(textCol))
    df.select(col(idCol), t.as("_graft_toks"))
      .where(size(col("_graft_toks")) > 0)
      .select(col(idCol), col("_graft_toks"),
        posexplode(sequence(lit(0), size(col("_graft_toks")) - 1,
          lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        slice(col("_graft_toks"), col("col") + 1, lit(chunkSize))
          .as("_graft_chunk"))
      .select(col(idCol), col("chunk_id"),
        size(col("_graft_chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("_graft_chunk")).as("chunk_text"))
  }

  /** Greedy sequence packing: assign documents to fixed-capacity packs
    * (context windows) by first-fit in id order — pack until the next
    * document would overflow `capacity` tokens, then open a new pack.
    * A document longer than `capacity` gets a pack of its own. Returns
    * `(bucket, idCol, n_tokens, pack_id)` with `pack_id` numbered per
    * bucket from 0.
    *
    * Packing is inherently sequential, so the corpus is first split
    * into `nBuckets` hash buckets (`id % nBuckets`) and the greedy scan
    * runs independently per bucket — buckets are the parallelism unit,
    * and the per-bucket state the scan needs is only (id, n_tokens):
    * 16 bytes per doc, so even 10⁵ docs/bucket folds in ~1.6 MB while
    * the text itself never moves — the shuffle carries two longs per
    * document, not the corpus. Deterministic: assignment depends only
    * on bucket membership and id order. */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long,
      nBuckets: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val sized = df.select(
      pmod(col(idCol).cast("long"), lit(nBuckets.toLong)).as("bucket"),
      col(idCol).cast("long").as("id"),
      size(tokens(col(textCol))).cast("long").as("n"))
    sized.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, it) =>
        val docs = it.toArray.sortBy(_._2)
        var pack = 0L
        var fill = 0L
        docs.iterator.map { case (_, id, n) =>
          if (fill > 0 && fill + n > capacity) { pack += 1; fill = 0L }
          fill += n
          (bucket, id, n, pack)
        }
      }
      .toDF("bucket", idCol, "n_tokens", "pack_id")
  }

  /** Train/test decontamination: train documents sharing at least
    * `minShared` distinct word `n`-grams with ANY held-out (test)
    * document — the overlap check run before training on a scraped
    * corpus to keep eval data out of the training set.
    *
    * Shape at scale: grams travel as `xxhash64` 8-byte keys (standard
    * 64-bit no-collision assumption); the test side (eval sets are
    * tiny vs the corpus) is `broadcast()`, so the only shuffle is the
    * final per-train-doc count — the 100 TB train side streams through
    * a broadcast hash join. Returns `(idCol, n_shared)` for flagged
    * train docs. */
  def contamination(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTest: Column,
      n: Int,
      minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val grams = docs.select(col(idCol), isTest.as("_graft_is_test"),
        explode(wordGrams(col(textCol), n)).as("_graft_ng"))
      .select(col(idCol), col("_graft_is_test"),
        xxhash64(col("_graft_ng")).as("_graft_h"))
    val test = grams.where(col("_graft_is_test"))
      .select(col("_graft_h")).distinct()
    val train = grams.where(!col("_graft_is_test"))
      .select(col(idCol), col("_graft_h")).distinct()
    train.join(broadcast(test), "_graft_h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
