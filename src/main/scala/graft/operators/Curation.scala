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

  /** Whitespace tokens of trimmed text; `[]` for blank text. The
    * default tokenizer of the chunk/pack operators (hookable — see
    * [[tokenChunks]]/[[packSequences]] and [[Bpe.tokenCountCol]] for
    * real subword accounting). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Default token COUNT hook: whitespace-token count as a long. */
  def tokenCountWhitespace(text: Column): Column =
    size(tokens(text)).cast("long")

  // ----------------------------------------------- compiled text kernels
  //
  // Like Dedup's MinHash/SimHash kernels: tight compiled loops instead
  // of higher-order Column expressions — Catalyst evaluates HOF lambdas
  // interpreted per element, which measured ~10 s for each of q80/q81
  // at sf0.1 (5000 docs); the same math compiled is ~20× faster and, for
  // grams, shuffles 8-byte hashes instead of strings. mix64 and the
  // FNV-1a char loop are deliberate small copies of Dedup's (shared
  // @inline helpers would couple two independently spec-pinned hash
  // surfaces); isSpaceRe must stay in sync with Dedup.isSpaceRe.

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Regex-`\s` test — EXACTLY `[ \t\n\x0B\f\r]`, the set both Java
    * `\s` and RE2 `\s` match. NOT `Character.isWhitespace`, which
    * additionally accepts U+001C–001F and the Unicode space block and
    * would silently disagree with the declarative `split(trim, "\\s+")`
    * path and the DuckDB oracles. */
  @inline private def isSpaceRe(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** Token spans (start, end exclusive) of maximal non-`\s` runs —
    * identical token boundaries to `split(trim(text), "\\s+")`. */
  private def tokenSpans(text: String): Array[Int] = {
    if (text == null) return Array.emptyIntArray
    val out = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isSpaceRe(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isSpaceRe(text.charAt(i))) i += 1
      if (i > start) { out += start; out += i }
    }
    out.toArray
  }

  /** One compiled pass: (n_tokens, n_distinct_tokens, top_bigram_count)
    * with bigram identity = exact adjacent token strings. */
  def repetitionKernel(text: String): (Long, Long, Long) = {
    val spans = tokenSpans(text)
    val nTokens = spans.length / 2
    if (nTokens == 0) return (0L, 0L, 0L)
    val toks = new Array[String](nTokens)
    var i = 0
    while (i < nTokens) {
      toks(i) = text.substring(spans(2 * i), spans(2 * i + 1)); i += 1
    }
    val distinct = new java.util.HashSet[String]()
    i = 0
    while (i < nTokens) { distinct.add(toks(i)); i += 1 }
    var top = 0
    if (nTokens > 1) {
      val counts = new java.util.HashMap[String, Int]()
      i = 0
      while (i < nTokens - 1) {
        val c = counts.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
        if (c > top) top = c
        i += 1
      }
    }
    (nTokens.toLong, distinct.size.toLong, top.toLong)
  }

  /** [[repetitionKernel]] packed as a 3-element long array — the shape
    * the codegen'd expression form returns (an array slots into
    * `GenericArrayData` directly; a tuple would need a struct writer). */
  def repetitionKernelArr(text: String): Array[Long] = {
    val (n, d, t) = repetitionKernel(text)
    Array(n, d, t)
  }

  /** Distinct hashes of the adjacent word `n`-grams of `text`. Each
    * token's characters are FNV-1a-hashed ONCE; a gram hash is the
    * order-sensitive splitmix chain of its `n` per-token hashes — the
    * same distinct-gram semantics as hashing the joined string, at
    * 1/n-th the char work (an interior token would otherwise be
    * re-hashed once per overlapping window). One compiled pass,
    * per-document distinct applied in-kernel so no downstream
    * `distinct()` shuffle is needed. */
  def wordGramHashSet(text: String, n: Int): Array[Long] = {
    val spans = tokenSpans(text)
    val nTokens = spans.length / 2
    if (nTokens < n) return Array.emptyLongArray
    val tokHash = new Array[Long](nTokens)
    var t = 0
    while (t < nTokens) {
      var h = 0xcbf29ce484222325L
      var p = spans(2 * t)
      val end = spans(2 * t + 1)
      while (p < end) { h ^= text.charAt(p).toLong; h *= 0x100000001b3L; p += 1 }
      tokHash(t) = mix64(h)
      t += 1
    }
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i <= nTokens - n) {
      var h = 0x9e3779b97f4a7c15L
      var j = i
      while (j < i + n) { h = mix64(h ^ tokHash(j)); j += 1 }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
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
    * All three stats come from [[repetitionKernel]], ONE compiled pass
    * per document with zero shuffle — the explode + groupBy(doc,
    * bigram) form ships more rows than the corpus holds, and the
    * HOF-fold form runs interpreted per element (measured 10.4 s vs
    * sub-second at sf0.1). */
  def repetitionStats(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // the codegen'd expression form of the kernel (the round-9
    // TextExpressions precedent) — no ScalaUDF boundary in the scan
    df.select(col(idCol),
        graft.functions.TextKernelFunctions.repetitionCol(col(textCol))
          .as("_graft_rep"))
      .select(
        col(idCol),
        col("_graft_rep").getItem(0).as("n_tokens"),
        col("_graft_rep").getItem(1).as("n_distinct"),
        col("_graft_rep").getItem(2).as("top_bigram_n"))
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
      stride: Int,
      tokenizer: Column => Column = tokens): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val t = tokenizer(col(textCol))
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
      nBuckets: Int,
      tokenCount: Column => Column = tokenCountWhitespace): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val sized = df.select(
      pmod(col(idCol).cast("long"), lit(nBuckets.toLong)).as("bucket"),
      col(idCol).cast("long").as("id"),
      tokenCount(col(textCol)).cast("long").as("n"))
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

  /** GLOBAL deterministic sequence packing — [[packSequences]]'s scale
    * twin. The per-hash-bucket greedy packer's bin quality depends on
    * how ids happened to land in buckets; this form instead packs
    * first-fit-decreasing WITHIN HARMONIC LENGTH CLASSES, which is
    * both globally deterministic (assignment depends only on the
    * (length desc, id) total order, never on partitioning) and
    * closed-form replayable in SQL:
    *
    *  - class of a doc = `capacity div max(n_tokens, 1)` — the largest
    *    k such that k docs of this length always fit one pack (class 0
    *    = docs longer than capacity, each its own overflow pack, the
    *    [[packSequences]] semantics). Within one class, true FFD
    *    degenerates to "k docs per pack in sorted order": every
    *    earlier pack already holds k docs each at least as long, so
    *    first-fit never revisits it.
    *  - rank docs within their class by (n_tokens desc, id), pack =
    *    class base + rank div k.
    *
    * Quality bound (CurationSpec): every pack except the last of each
    * class is > half full (k docs each > capacity/(k+1) → fill >
    * k/(k+1) · capacity ≥ capacity/2), so total packs ≤
    * 2·⌈Σn/capacity⌉ + #classes — the classic harmonic guarantee,
    * independent of partitioning, vs. the per-bucket greedy whose
    * worst case degrades with bucket skew.
    *
    * Shape at scale: the doc texts never move — only (id, n, class)
    * triples (24 bytes) go through ONE range exchange on
    * (class, n desc, id). The within-class global rank is computed
    * WITHOUT a window over the class (a single-partition scale killer
    * when one class dominates): the range-partitioned triples are
    * localCheckpoint'ed (pinning the partition layout), per-partition
    * per-class counts (≤ partitions × classes rows, with #classes ≤
    * capacity — driver-bounded) come back once, prefix sums give each
    * (partition, class) its rank offset, and a second map-only pass
    * assigns packs. Returns `(cls, idCol, n_tokens, pack_id)`. */
  def packSequencesGlobal(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long,
      tokenCount: Column => Column = tokenCountWhitespace): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val sized = df.select(
      col(idCol).cast("long").as("id"),
      tokenCount(col(textCol)).cast("long").as("n"))
      .as[(Long, Long)]
      .map { case (id, n) => (id, n, capacity / math.max(n, 1L)) }
      .toDF("id", "n", "cls")
    // ONE range exchange on the packing order; localCheckpoint pins
    // the materialized partition layout so the count pass and the
    // assign pass see identical (partition -> rows) mappings
    val parted = sized
      .repartitionByRange(col("cls"), col("n").desc, col("id"))
      .sortWithinPartitions(col("cls"), col("n").desc, col("id"))
      .localCheckpoint(eager = true)
    // bounded driver table: (partition, class, count)
    val counts: Array[(Int, Long, Long)] = parted
      .withColumn("pid", spark_partition_id())
      .groupBy("pid", "cls").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val totals = counts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val classes = totals.keys.toArray.sorted
    // global pack-id base per class (classes laid out ascending)
    val classBase: Map[Long, Long] = {
      var acc = 0L
      classes.map { c =>
        val k = math.max(c, 1L)
        val b = c -> acc
        acc += (totals(c) + k - 1) / k
        b
      }.toMap
    }
    // within-class rank offset of each partition: docs of the same
    // class in lower partitions (range partitions are ordered, so
    // lower partition = earlier in the (cls, n desc, id) total order)
    val offsets: Map[(Int, Long), Long] = counts.groupBy(_._2)
      .flatMap { case (c, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, _, cnt) =>
          val o = (pid, c) -> acc
          acc += cnt
          o
        }
      }
    val bOff = spark.sparkContext.broadcast(offsets)
    val bBase = spark.sparkContext.broadcast(classBase)
    parted.as[(Long, Long, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cur = Long.MinValue
      var idx = 0L
      var started = false
      it.map { case (id, n, cls) =>
        if (!started || cls != cur) {
          cur = cls
          idx = bOff.value((pid, cls))
          started = true
        }
        val k = math.max(cls, 1L)
        val pack = bBase.value(cls) + idx / k
        idx += 1
        (cls, id, n, pack)
      }
    }.toDF("cls", idCol, "n_tokens", "pack_id")
  }

  /** Train/test decontamination: train documents sharing at least
    * `minShared` distinct word `n`-grams with ANY held-out (test)
    * document — the overlap check run before training on a scraped
    * corpus to keep eval data out of the training set.
    *
    * Shape at scale: grams travel as 8-byte FNV/splitmix hashes
    * (standard 64-bit no-collision assumption), computed AND
    * per-document-deduplicated in one compiled pass
    * ([[wordGramHashSet]] — no gram strings materialize, and the train
    * side needs no `distinct()` shuffle at all); the test side (eval
    * sets are tiny vs the corpus) is `broadcast()`, so the only
    * shuffle is the final per-train-doc count — the 100 TB train side
    * streams through a broadcast hash join. Returns
    * `(idCol, n_shared)` for flagged train docs. */
  def contamination(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTest: Column,
      n: Int,
      minShared: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val grams = docs.select(col(idCol), isTest.as("_graft_is_test"),
      explode(graft.functions.TextKernelFunctions
        .wordGramsCol(col(textCol), n)).as("_graft_h"))
    val test = grams.where(col("_graft_is_test"))
      .select(col("_graft_h")).distinct()
    val train = grams.where(!col("_graft_is_test"))
      .select(col(idCol), col("_graft_h"))
    train.join(broadcast(test), "_graft_h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Bigram language-model scoring — the model-based quality filter of
    * a curation pipeline (documents whose text the corpus LM finds
    * surprising are OCR garbage, boilerplate soup, or genuinely novel;
    * either way they get reviewed). Scores every document with ≥ 1
    * bigram by its mean Laplace-smoothed bigram log-probability
    * `mean ln( (c(a,b) + 1) / (c(a) + V) )` under counts trained on
    * the corpus itself, lowest first.
    *
    * Scale posture: doc bigrams come off the token array by
    * adjacent-slice zip (no window); the count model is two
    * partial/final aggregates; scoring joins each doc-bigram
    * occurrence to its trained counts on (a,b) then (a) — ordinary
    * hash shuffles on the gram/word, no driver-side model object, so
    * the "model" can be petabyte-scale. The per-doc mean uses the
    * 9-dp-round + DECIMAL-sum device so it is partition-order-exact.
    */
  /** Exact duplicated-span diagnostics: for every document with at
    * least `w` word tokens, the count of its DISTINCT token `w`-grams,
    * how many of those appear in ≥2 documents, and the duplicated
    * fraction — the corpus-health signal behind exact-substring
    * training-data dedup (a high `dup_frac` doc is boilerplate or a
    * copy; the gram inventory is what a suffix-style exact dedup would
    * cut).
    *
    * Scale posture: grams are deduplicated per document MAP-SIDE
    * (`array_distinct` before the explode — no shuffle pays for
    * within-doc repetition) and travel as 8-byte xxhash64 keys, never
    * strings; the document-frequency aggregate and the join back are
    * both keyed on the gram hash. Skew valve: a gram shared by f docs
    * costs f rows in the join — bounded by doc count, not doc length.
    *
    * Determinism: counts are exact longs (hash-gram counts equal
    * string-gram counts absent 64-bit collisions — the q17 argument);
    * `dup_frac` is one long-over-long double division rounded to 6 dp.
    */
  def duplicatedGramStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"gram width must be >= 2, got $w")
    val toks = TextAnalysis.wordTokens(col(textCol))
    val grams = docs
      .select(col(idCol).as("_graft_id"), toks.as("a"))
      .where(size(col("a")) >= w)
      .select(col("_graft_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("a")) - (w - 1)),
          i => xxhash64(concat_ws(" ", slice(col("a"), i, lit(w))))))).as("g"))
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("dfreq"))
    grams.join(dfreq, "g")
      .groupBy("_graft_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("dfreq") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("_graft_id").as(idCol), col("n_grams"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_grams").cast("double"),
          6).as("dup_frac"))
      .orderBy(idCol)
  }

  /** Cross-document span-level exact dedup (the RefinedWeb/C4-style
    * "remove duplicated spans" curation step, on fixed-width token
    * windows): the text is cut into consecutive `spanTokens`-token
    * spans (last span may be shorter), every span occurrence after the
    * corpus-wide FIRST one — ordered by (doc id, span index) — is
    * dropped, and each document is reassembled from its surviving
    * spans in order. A doc's own internal repeats are deduped too
    * (the second occurrence is later in the same order).
    *
    * Scale posture: spans are grouped by their 8-byte xxhash64
    * fingerprint (the q09/q39 exact-dedup device — 24-byte shuffle
    * rows instead of span strings; exact absent 64-bit collisions),
    * first-occurrence is a partial/final `min(struct(doc, idx))`
    * aggregate (skew on a viral span folds map-side — never a
    * corpus-wide window), and reassembly is a per-doc
    * `array_sort(collect_list)` bounded by the document's own length.
    * No driver collect, nothing holds more than one doc's spans.
    *
    * Returns (doc_id, n_spans, n_kept, text_clean) ordered by doc id;
    * a fully-deduplicated document survives with n_kept = 0 and empty
    * text. */
  def spanDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int = 8): DataFrame = {
    require(spanTokens >= 1, s"spanTokens must be >= 1, got $spanTokens")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      tokens(col(textCol)).as("tk"))
      .withColumn("nsp",
        ceil(size(col("tk")) / lit(spanTokens.toDouble)).cast("long"))
    val sp = toks
      .where(col("nsp") > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), col("nsp") - 1),
          i => concat_ws(" ",
            slice(col("tk"), (i * spanTokens + 1).cast("int"),
              lit(spanTokens))))).as(Seq("idx", "span")))
      .withColumn("h", xxhash64(col("span")))
    val firsts = sp.groupBy("h")
      .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
    val kept = sp.join(firsts, "h")
      .where(struct(col("doc_id"), col("idx")) === col("f"))
    val agg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("idx").as("i"),
          col("span").as("s")))),
        x => x.getField("s")), " ").as("text_clean"))
    toks.select(col("doc_id"), col("nsp").as("n_spans"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .orderBy("doc_id")
  }

  def lmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val toksArr = docs.select(col(idCol).as("_graft_id"),
      TextAnalysis.wordTokens(col(textCol)).as("a"))
    val nBi = greatest(size(col("a")) - 1, lit(0))
    def bi = toksArr
      .select(col("_graft_id"), slice(col("a"), lit(1), nBi).as("w1s"),
        slice(col("a"), lit(2), nBi).as("w2s"))
      .select(col("_graft_id"),
        explode(arrays_zip(col("w1s"), col("w2s"))).as("p"))
      .select(col("_graft_id"), col("p.w1s").as("w1"), col("p.w2s").as("w2"))
    // The MODEL (distinct-bigram counts) is vocab-sized, orders of
    // magnitude below the per-occurrence stream — cache IT instead of
    // persisting `bi`, the largest intermediate. A LAZY persist, not
    // an eager localCheckpoint: the v-count action below populates
    // the cache on this same code path, and lineage stays intact so
    // an executor lost mid-query recomputes instead of failing
    // ("checkpoint block not found" has no fallback). cx derives from
    // cb (Σ_w2 cxy), so the model costs one tokenize pass and the
    // scoring join a second — never a pinned corpus-sized cache.
    // Generation-tracked (the handle outlives this call inside the
    // returned plan): the next lmScore call or CachePool.releaseAll
    // frees it — one model cache pinned per session, not per call.
    val cb = graft.CachePool.swap("curation.lmscore.cb",
      bi.groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cu = cb.groupBy("w1").agg(sum(col("cxy")).as("cx"))
    val v = cu.count().toDouble // vocabulary-as-context size

    val lp = log((col("cxy").cast("double") + lit(1.0)) /
      (col("cx").cast("double") + lit(v)))
    // The Laplace term depends ONLY on the (w1, w2) pair — fold the
    // cb⋈cu join and the round(log) into ONE vocab-sized term table,
    // so the occurrence stream takes a single map-side join and never
    // evaluates the transcendental (the q186 NB device, occurrence-sum
    // form: a per-(doc, pair) pre-aggregate was measured SLOWER here —
    // it adds a full shuffle of the occurrence stream to save decimal
    // adds that were already cheap behind a broadcast join).
    val terms = cb.join(cu, Seq("w1"))
      .select(col("w1"), col("w2"),
        round(lp, 9).cast(DecimalType(28, 9)).as("l"))
    bi.join(terms, Seq("w1", "w2"))
      .groupBy("_graft_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("l")).as("s"))
      .select(col("_graft_id").as(idCol), col("n_bigrams"),
        round(col("s").cast("double") /
          col("n_bigrams").cast("double"), 6).as("avg_lp"))
      .orderBy(col("avg_lp"), col(idCol))
  }
}
