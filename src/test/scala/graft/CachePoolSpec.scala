package graft

import org.apache.spark.storage.StorageLevel

/** The one-generation cache registry: operator-internal lazy persists
  * (bm25TopK doc lengths, charNgramDetect model, lmScore bigram model)
  * must not pin one cached table per CALL for the session lifetime —
  * each call releases the previous generation under its tag, and a
  * swapped-out result stays correct (recompute from lineage). */
class CachePoolSpec extends SparkSpec {

  test("swap releases the previous generation under the same tag, " +
    "keeps distinct tags independent, and releaseAll empties the pool") {
    import spark.implicits._
    CachePool.releaseAll()
    val a = Seq(1, 2, 3).toDF("x")
      .persist(StorageLevel.MEMORY_AND_DISK)
    a.count()
    CachePool.swap("spec.tag1", a)
    assert(a.storageLevel != StorageLevel.NONE)

    val other = Seq(9).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    CachePool.swap("spec.tag2", other)

    val b = Seq(4, 5).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    CachePool.swap("spec.tag1", b)
    // previous generation deregistered; the independent tag untouched
    assert(a.storageLevel == StorageLevel.NONE)
    assert(other.storageLevel != StorageLevel.NONE)
    assert(CachePool.liveCount == 2)

    // a swapped-out handle still computes (lineage recompute)
    assert(a.count() == 3)

    CachePool.releaseAll()
    assert(CachePool.liveCount == 0)
    assert(b.storageLevel == StorageLevel.NONE)
    assert(other.storageLevel == StorageLevel.NONE)
  }

  test("repeated bm25TopK calls pin at most one doc-length cache and " +
    "the latest result is unaffected by the swap") {
    import spark.implicits._
    CachePool.releaseAll()
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "the lazy dog sleeps"),
      (2L, "quick quick fox runs")).toDF("doc_id", "text")
    val r1 = operators.Retrieval
      .bm25TopK(docs, "doc_id", "text", Seq("quick"), topK = 3)
      .collect().map(_.getLong(0)).toSeq
    val r2 = operators.Retrieval
      .bm25TopK(docs, "doc_id", "text", Seq("quick"), topK = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(r1 == r2)
    // one live generation for the bm25 tag, not one per call
    assert(CachePool.liveCount == 1)
    CachePool.releaseAll()
  }

  test("swapping in a semantically-equal plan does NOT evict the live " +
    "generation (CacheManager dedupes same-plan persists into one entry)") {
    import spark.implicits._
    CachePool.releaseAll()
    def gen() = Seq((0L, 4L), (1L, 4L), (2L, 4L)).toDF("doc_id", "dlen")
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.sum("dlen"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val g1 = CachePool.swap("spec.sameplan", gen())
    g1.count()
    assert(g1.storageLevel != StorageLevel.NONE)
    // second generation, identical plan: CacheManager reuses g1's entry;
    // the old swap unpersisted g1 and thereby evicted the SHARED entry,
    // leaving the "live" g2 silently uncached
    val g2 = CachePool.swap("spec.sameplan", gen())
    assert(g2.storageLevel != StorageLevel.NONE,
      "live generation was evicted by the same-plan swap")
    assert(g1.storageLevel != StorageLevel.NONE) // one shared entry
    assert(CachePool.liveCount == 1)
    CachePool.releaseAll()
    assert(g2.storageLevel == StorageLevel.NONE)
  }

  test("interleaved bm25 family calls (q92 topK=20 then q93 topK=50) " +
    "keep the shared doc-length cache materialized — no silent recompute") {
    import spark.implicits._
    CachePool.releaseAll()
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "the lazy dog sleeps"),
      (2L, "quick quick fox runs")).toDF("doc_id", "text")
    operators.Retrieval
      .bm25TopK(docs, "doc_id", "text", Seq("quick"), topK = 20).collect()
    assert(!spark.sharedState.cacheManager.isEmpty)
    // same docs, different topK: the internal dl plan is identical, so
    // the swap must not drop the deduped cache entry out from under it
    operators.Retrieval
      .bm25TopK(docs, "doc_id", "text", Seq("quick"), topK = 50).collect()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "q93-style second call lost its doc-length cache to the swap")
    assert(CachePool.liveCount == 1)
    CachePool.releaseAll()
  }
}
