package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical retrieval: BM25 scoring of a keyword query over a document
  * corpus with bounded top-k — the sparse half of a RAG retrieval
  * stack (the dense half is `Similarity`'s ANN).
  *
  * Scale posture: the corpus is tokenized once and immediately
  * filtered to the QUERY's terms — an `isin` predicate on a handful
  * of literals that pushes into the scan, so the shuffle carries only
  * the query terms' postings, never the corpus dictionary. Document
  * frequencies (|query| rows) come back as a broadcast; per-document
  * scores are one partial/final aggregate over ≤ |query| rows per
  * doc; the final top-k plans as `TakeOrderedAndProject` (per-
  * partition heaps, no global sort).
  *
  * Determinism: per-term scores are rounded to 9 dp and summed as
  * DECIMAL (exact, associative — partition-order-stable and
  * cross-engine-stable), then the document score is rounded to 6 dp;
  * ties break on doc id. The ln/divide float ops are written with
  * one fixed association so both engines evaluate the identical IEEE
  * expression tree (the q57 TF-IDF device).
  */
object Retrieval {

  /** BM25 top-k: `(doc id, score)` for the `k` best-scoring documents
    * containing at least one query term.
    *
    * @param docs    corpus with `idCol` (long) and `textCol` (string)
    * @param query   query terms (matched exactly against
    *                `\p{L}`-class word tokens —
    *                [[TextAnalysis.tokenSplitRe]])
    * @param k1      BM25 term-frequency saturation (typical 1.2)
    * @param b       BM25 length normalization (typical 0.75)
    * @param topK    result size
    * @param fold    opt-in deterministic ASCII case fold
    *                ([[TextAnalysis.asciiFold]]): corpus tokens AND
    *                query terms fold A-Z → a-z before matching, so
    *                "The" scores with "the" (retrieval quality) while
    *                non-ASCII case stays exact (determinism). Token
    *                boundaries and doc lengths are unchanged.
    * @param tokenizer token definition (default the shared
    *                [[TextAnalysis.wordTokens]]; pass
    *                [[TextAnalysis.cjkBigramTokens]] for retrieval
    *                over unsegmented Han text — under the default a
    *                Han clause is ONE token and no query term can
    *                match it). Applied after the fold; doc length
    *                follows the tokenizer (bigram docs are longer,
    *                as in Lucene's CJK scoring).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20,
      fold: Boolean = false,
      tokenizer: Column => Column = TextAnalysis.wordTokens): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(topK > 0, s"topK must be positive, got $topK")

    val queryTerms =
      if (fold) query.map(TextAnalysis.asciiFoldStr) else query
    val nDocs = docs.count().toDouble
    def text =
      if (fold) TextAnalysis.asciiFold(col(textCol)) else col(textCol)
    def tok = docs.select(col(idCol).as("doc_id"),
        explode(tokenizer(text)).as("term"))
      .where(col("term") =!= "")
    // The doc-length table is doc-sized (one row per doc), orders of
    // magnitude below the exploded token stream — cache IT instead of
    // persisting the token stream. A LAZY persist, not an eager
    // localCheckpoint: the avgdl action below populates the cache on
    // this same code path, and lineage stays intact so an executor
    // lost mid-query recomputes instead of failing. Costs one extra
    // tokenize pass (dl + tf branches) but never pins a corpus-sized
    // cache. The handle outlives this call (the returned plan joins
    // it), so it is generation-tracked: the NEXT bm25TopK call (or
    // CachePool.releaseAll) frees it — at most one doc-length table
    // stays pinned per session, not one per query.
    val dl = graft.CachePool.swap("retrieval.bm25.dl",
      tok.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // avgdl over ALL docs (token-less docs count in the denominator);
    // one long-over-double division, bit-identical in any engine.
    // A fully token-less corpus sums to null -> 0 tokens; the scoring
    // pipeline is then empty and the result has zero rows.
    val totTokens = Option(dl.agg(sum(col("dlen"))).head.get(0))
      .fold(0L)(_.asInstanceOf[Long])
    val avgdl = totTokens / nDocs

    val tf = tok.where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))

    // fixed association: idf * (tf * (k1+1)) / (tf + k1 * (1 - b + b*dlen/avgdl))
    val idf: Column =
      log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) +
        lit(1.0))
    val tscore: Column =
      idf * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dlen") / lit(avgdl)))

    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .select(col("doc_id"), round(tscore, 9).as("ts"))
      .groupBy("doc_id")
      .agg(sum(col("ts").cast(DecimalType(28, 9))).as("ds"))
      .select(col("doc_id").as(idCol),
        round(col("ds").cast("double"), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion of two ranked candidate lists (the
    * standard hybrid-retrieval merge: sparse BM25 + dense ANN).
    *
    * Each input is `(id, score)`; ranks are assigned within each list
    * by `(score desc, id)` and fused as
    * `Σ 1 / (c + rank)` over the lists containing the id (absent ⇒
    * contributes 0). The fusion itself runs on the already-bounded
    * top-N lists — O(N) rows regardless of corpus size, so the
    * single-partition rank windows here are deliberate, not a scale
    * bug: all the heavy lifting happened in the upstream retrievals.
    *
    * Determinism: ranks are integers; each reciprocal is one double
    * division and the fused score sums the two terms in a fixed
    * (sparse + dense) order — bit-identical in any IEEE engine.
    */
  def rrfFuse(
      sparse: DataFrame,
      dense: DataFrame,
      idCol: String,
      scoreCol: String = "score",
      c: Int = 60,
      topK: Int = 20): DataFrame = {
    require(c > 0, s"rrf constant must be positive, got $c")
    require(topK > 0, s"topK must be positive, got $topK")
    import org.apache.spark.sql.expressions.Window

    def ranked(df: DataFrame, rank: String): DataFrame =
      df.select(col(idCol).as("id"),
          col(scoreCol).cast("double").as("s"))
        .withColumn(rank, row_number().over(
          Window.orderBy(desc("s"), col("id"))))
        .select(col("id"), col(rank))

    val rs = ranked(sparse, "r_sparse")
    val rd = ranked(dense, "r_dense")
    rs.join(rd, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        (coalesce(lit(1.0) / (lit(c) + col("r_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("r_dense")), lit(0.0)))
          .as("rrf"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }
}
