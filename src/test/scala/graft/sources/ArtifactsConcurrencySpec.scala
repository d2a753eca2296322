package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators._

/** Publish/read concurrency contract of the versioned-artifact device,
  * exercised per adopting family (the IvfSpec reader-before-append test
  * generalized): a reader that resolved version k keeps reading k
  * unharmed while a publish lands k+1 (the pointer swap is invisible to
  * pinned readers for `keepVersions − 1` publishes), an in-flight
  * publish (data written, sentinel not yet) is never resolved, and GC
  * reclaims exactly the versions/segments beyond the window. */
class ArtifactsConcurrencySpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val sfDir = "/root/testdata/sf0.001"

  test("core device: pinned version survives one publish, in-flight " +
    "publish is invisible, GC reclaims only beyond the keep window") {
    import spark.implicits._
    val base = tmp("artcore")
    Artifacts.publishVersion(spark, base) { v =>
      Seq(1).toDF("x").write.parquet(s"$v/data")
    }
    val r1 = Artifacts.latestDir(spark, base)
    assert(r1.endsWith("/v1"))
    // a publish crashed before its sentinel: data exists, never resolved
    Seq(99).toDF("x").write.mode("overwrite").parquet(s"$base/v2/data")
    assert(Artifacts.latestDir(spark, base) === r1)
    // a real publish lands v2 (overwriting the orphan) and repoints
    Artifacts.publishVersion(spark, base) { v =>
      Seq(2).toDF("x").write.parquet(s"$v/data")
    }
    val r2 = Artifacts.latestDir(spark, base)
    assert(r2.endsWith("/v2"))
    // the reader pinned at v1 BEFORE the swap still reads v1 complete
    assert(spark.read.parquet(s"$r1/data").head().getInt(0) === 1)
    // third publish: v1 ages out (keepVersions = 2), v2 stays readable
    Artifacts.publishVersion(spark, base) { v =>
      Seq(3).toDF("x").write.parquet(s"$v/data")
    }
    assert(!new java.io.File(s"$base/v1").exists())
    assert(spark.read.parquet(s"$r2/data").head().getInt(0) === 2)
    assert(Artifacts.latestDir(spark, base).endsWith("/v3"))
  }

  // Per-family shape: build v1 → construct the probe/reader AGAINST v1
  // → append publishes v2 → the v1-pinned probe still returns the
  // PRE-append answer (its files are intact); a fresh probe sees v2.

  test("minhash index: probe pinned before an append returns the " +
    "pre-append pair set; a fresh probe sees the appended corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.where(col("doc_id") < 40)
    val extra = docs.where(col("doc_id") >= 40 && col("doc_id") < 80)
    val delta = docs.where(col("doc_id") < 10)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val base = tmp("mhconc")
    Dedup.writeMinhashIndex(corpus, base, n = 8)
    val pinned = Dedup
      .probeMinhashIndex(spark, base, corpus, delta, n = 8,
        threshold = 0.35)
      .orderBy("id_new", "id_old")
    val want = pinned.collect().toSeq // consumed against v1
    Dedup.appendToMinhashIndex(spark, base, extra, n = 8)
    // v1 files still exist (keep window) — the pinned plan re-executes
    // identically even though _latest now points at v2
    assert(pinned.collect().toSeq === want)
    val fresh = Dedup
      .probeMinhashIndex(spark, base, corpus.union(extra), delta, n = 8,
        threshold = 0.35)
      .orderBy("id_new", "id_old").collect().toSeq
    assert(fresh.length >= want.length)
  }

  test("histogram: quantiles pinned before an append replay the " +
    "pre-append counters; a fresh probe folds the appended feed in") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("value"))
    val base = tmp("histconc")
    val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L))
    Quantiles.writeHistogram(
      ev.where(col("event_id") % 10 =!= 0), "value", 5.0, base)
    val pinned = Quantiles.histogramQuantiles(spark, base, qs)
    val want = pinned.collect().toSeq
    Quantiles.appendToHistogram(
      spark, base, ev.where(col("event_id") % 10 === 0), "value")
    assert(pinned.collect().toSeq === want)
    val fresh = Quantiles.histogramQuantiles(spark, base, qs)
      .collect().toSeq
    // appended feed raised the counter totals
    assert(fresh.map(_.getLong(1)).sum > want.map(_.getLong(1)).sum)
  }

  test("countmin: estimates pinned before an append replay the " +
    "pre-append sketch; a fresh probe sees the folded counts") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey"), col("l_orderkey"))
    val base = tmp("cmconc")
    val keys = li.select("l_partkey").distinct().limit(5)
    Frequency.writeCountMin(
      li.where(col("l_orderkey") % 10 =!= 0), "l_partkey",
      depth = 4, width = 256, base)
    val pinned = Frequency.countMinEstimatePersisted(
      spark, base, keys, "l_partkey").orderBy("l_partkey")
    val want = pinned.collect().toSeq
    Frequency.appendToCountMin(spark, base,
      li.where(col("l_orderkey") % 10 === 0), "l_partkey")
    assert(pinned.collect().toSeq === want)
    val fresh = Frequency.countMinEstimatePersisted(
        spark, base, keys, "l_partkey").orderBy("l_partkey")
      .collect().toSeq
    assert(fresh.map(_.getLong(1)).sum >= want.map(_.getLong(1)).sum)
  }

  test("language model: classification pinned before an append scores " +
    "with the pre-append counts; a fresh probe uses the folded model") {
    import spark.implicits._
    val train = Seq(
      ("en", "the cat sat on the mat and the dog barked"),
      ("en", "a quick brown fox jumps over the lazy dog"),
      ("de", "der hund bellt und die katze schläft auf dem sofa"),
      ("de", "ein schneller brauner fuchs springt über den faulen hund"))
      .toDF("lang", "text")
    val more = Seq(
      ("en", "rain falls softly on the quiet village roofs"),
      ("de", "regen fällt leise auf die dächer des dorfes"))
      .toDF("lang", "text")
    val test_ = Seq((0L, "the cat and the fox"), (1L, "der hund und die katze"))
      .toDF("doc_id", "text")
    val base = tmp("lmconc")
    val m0 = TextAnalysis.charNgramLangModel(train, "lang", "text", n = 2)
    TextAnalysis.writeLangModel(m0, n = 2, base)
    val pinned = TextAnalysis.charNgramDetectPersisted(
      spark, base, test_, "doc_id", "text").orderBy("doc_id")
    val want = pinned.collect().toSeq
    TextAnalysis.appendToLangModel(spark, base, more, "lang", "text")
    assert(pinned.collect().toSeq === want)
    val fresh = TextAnalysis.charNgramDetectPersisted(
        spark, base, test_, "doc_id", "text").orderBy("doc_id")
      .collect().toSeq
    assert(fresh.map(_.getString(1)) === Seq("en", "de"))
  }

  test("graph table: a GraphTable pinned before an append iterates " +
    "over the pre-append edges; a fresh read sees the merged graph") {
    import spark.implicits._
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val e2 = Seq((3L, 4L), (4L, 1L)).toDF("src", "dst")
    val base = tmp("gtconc")
    Graph.writeGraphTable(e1, "src", "dst", base, assumeDistinct = true)
    val pinned = Graph.readGraphTable(spark, base)
    val want = pinned.pageRank(iters = 3, danglingCorrection = true)
      .collect().toSeq
    Graph.appendToGraphTable(spark, base, e2, "src", "dst")
    assert(pinned.pageRank(iters = 3, danglingCorrection = true)
      .collect().toSeq === want)
    val fresh = Graph.readGraphTable(spark, base)
    assert(fresh.numNodes === 4)
    assert(want.length === 3)
  }

  test("IVF: segment GC reclaims exactly the segments no LIVE version " +
    "references, and a version-pinned reader keeps probing through " +
    "publishes that age other versions out") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val q = emb.where(col("vec_id") === 5).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val base = tmp("ivfgc")
    def segExists(s: String) =
      new java.io.File(s"$base/segments/$s").exists()
    // v1 = {seg-1}; v2 = {seg-1, seg-2}
    val built = Similarity.buildIvfIndex(
      emb.where(col("vec_id") % 2 === 0), nlist = 4,
      initCentroids = Some(init))
    try {
      Similarity.writeIvfIndex(built, base)
      Similarity.appendToIvfIndex(spark, base,
        emb.where(col("vec_id") % 2 === 1))
      // rebuild publishes v3 = {seg-3}; v1 ages out (keep window 2),
      // but seg-1/seg-2 stay — the LIVE v2 manifest still names them
      Similarity.writeIvfIndex(built, base)
      assert(segExists("seg-1") && segExists("seg-2") && segExists("seg-3"))
      val pinned = Similarity.readIvfIndex(spark, base) // pins v3
      val want = pinned.probe(q, 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // v4 = {seg-3, seg-4}: v2 ages out and seg-1/seg-2 become
      // unreferenced by every live manifest — reclaimed; the reader
      // pinned at v3 (seg-3 only) is untouched
      Similarity.appendToIvfIndex(spark, base,
        emb.where(col("vec_id") % 2 === 1))
      assert(!segExists("seg-1") && !segExists("seg-2"), "GC window")
      assert(segExists("seg-3") && segExists("seg-4"))
      assert(pinned.probe(q, 10, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === want)
    } finally built.unpersist()
  }
}
