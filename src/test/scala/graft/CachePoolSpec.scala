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
}
