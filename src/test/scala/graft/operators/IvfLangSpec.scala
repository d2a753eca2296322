package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSpec extends SparkSpec {

  test("ivfTopK scores agree with brute force and include the query vector") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 5).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val brute = Similarity.bruteForceTopK(emb, q, 1000).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.ivfTopK(emb, q, 10, nlist = 4, nprobe = 2,
        initCentroids = Some(init))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.nonEmpty)
    // exact re-rank inside probed cells: scores must match brute force
    ivf.foreach { case (id, s) => assert(math.abs(brute(id) - s) < 1e-9) }
    // the query's own vector lives in the cell nearest the query
    assert(ivf.map(_._1).contains(5L))
  }

  test("IVF index built once serves repeated probes without re-fitting") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val index = Similarity.buildIvfIndex(emb, nlist = 4,
      initCentroids = Some(init))
    try {
      Seq(5L, 17L).foreach { qid =>
        val q = emb.where(col("vec_id") === qid).select(col("embedding"))
          .head().getSeq[Float](0).toArray
        val viaIndex = index.probe(q, 10, nprobe = 2)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val oneShot = Similarity.ivfTopK(emb, q, 10, nlist = 4, nprobe = 2,
            initCentroids = Some(init))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(viaIndex === oneShot, s"probe for query $qid diverged")
      }
    } finally index.unpersist()
  }

  test("persisted IVF index: probes match and prune to probed cell partitions") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val q = emb.where(col("vec_id") === 5).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val built = Similarity.buildIvfIndex(emb, nlist = 4,
      initCentroids = Some(init))
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    try {
      Similarity.writeIvfIndex(built, dir)
      val reopened = Similarity.readIvfIndex(spark, dir)
      assert(reopened.centroids.map(_.toSeq).toSeq ===
        built.centroids.map(_.toSeq).toSeq)
      val inMem = built.probe(q, 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fromDisk = reopened.probe(q, 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(fromDisk === inMem)
      // the probe filter must reach the scan as a PARTITION filter —
      // only the probed cells' files are read
      val plan = reopened.probe(q, 10, nprobe = 2)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val partLine = plan.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(partLine.contains("cell"), plan)
    } finally built.unpersist()
  }

  test("pre-versioned IVF layout is rejected with an explicit " +
    "migration message, not a generic artifact-resolution error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivflegacy").toString
    // fabricate the OLD {assigned, centroids} layout: no version pointer
    Seq((0, Array(0f, 0f)), (1, Array(1f, 1f)))
      .toDF("cluster", "centroid")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    Seq((0L, Array(0.1f, 0.2f), 0))
      .toDF("vec_id", "embedding", "cell")
      .write.mode("overwrite").parquet(s"$dir/assigned")
    val eRead = intercept[IllegalArgumentException] {
      Similarity.readIvfIndex(spark, dir)
    }
    assert(eRead.getMessage.contains("pre-versioned IVF layout"),
      eRead.getMessage)
    assert(eRead.getMessage.contains("rebuild required"), eRead.getMessage)
    val eAppend = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(spark, dir,
        Seq((2L, Array(0.3f, 0.4f))).toDF("vec_id", "embedding"))
    }
    assert(eAppend.getMessage.contains("pre-versioned IVF layout"),
      eAppend.getMessage)
  }

  test("append-then-probe equals assign-union-then-probe (no re-fit)") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    // base corpus = even ids, delta batch = odd ids
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
    val built = Similarity.buildIvfIndex(base, nlist = 4,
      initCentroids = Some(init))
    val dir = java.nio.file.Files.createTempDirectory("ivfapp").toString
    try {
      Similarity.writeIvfIndex(built, dir)
      Similarity.appendToIvfIndex(spark, dir, delta)
      val appended = Similarity.readIvfIndex(spark, dir)
      // same centroids as the base build — the quantizer was NOT re-fit
      assert(appended.centroids.map(_.toSeq).toSeq ===
        built.centroids.map(_.toSeq).toSeq)
      val q = emb.where(col("vec_id") === 5).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      // expected: the union corpus assigned with the SAME centroids
      val unionIdx = Similarity.IvfIndex(built.centroids,
        emb.select(col("vec_id"), col("embedding"))
          .withColumn("cell",
            graft.functions.VectorFunctions.assignCol(
              col("embedding"), built.centroids)),
        "vec_id", "embedding")
      val got = appended.probe(q, 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = unionIdx.probe(q, 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === want)
      // delta rows are findable and pruning still holds after append
      assert(got.nonEmpty && got.map(_._1).exists(_ % 2 == 1))
      val plan = appended.probe(q, 10, nprobe = 2)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      val partLine = plan.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(partLine.contains("cell"), plan)
    } finally built.unpersist()
  }

  test("versioned IVF: a reader opened before an append keeps probing " +
    "its complete version; a new reader sees the delta") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
    val built = Similarity.buildIvfIndex(base, nlist = 4,
      initCentroids = Some(init))
    val dir = java.nio.file.Files.createTempDirectory("ivfver").toString
    try {
      Similarity.writeIvfIndex(built, dir)
      assert(graft.sources.Artifacts.latestDir(spark, dir) === s"$dir/v1")
      // reader A resolves v1 BEFORE the append
      val before = Similarity.readIvfIndex(spark, dir)
      Similarity.appendToIvfIndex(spark, dir, delta)
      assert(graft.sources.Artifacts.latestDir(spark, dir) === s"$dir/v2")
      val q = emb.where(col("vec_id") === 5).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      // A's probe still runs against the complete pre-append segment
      // set (keepVersions retention holds v1 and its segment live) —
      // no odd ids, no partial batch
      val a = before.probe(q, 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSeq
      assert(a.nonEmpty && a.forall(_ % 2 == 0))
      // a reader resolving AFTER the append sees base + delta
      val after = Similarity.readIvfIndex(spark, dir)
      val b = after.probe(q, 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSeq
      assert(b.exists(_ % 2 == 1) && b.exists(_ % 2 == 0))
      // append wrote a NEW segment, not a rewrite: two immutable
      // segments on disk, v2's manifest names both
      val segs = new java.io.File(s"$dir/segments").list().sorted.toSeq
      assert(segs === Seq("seg-1", "seg-2"))
    } finally built.unpersist()
  }

  test("versioned IVF: rebuild publishes a fresh 1-segment manifest and " +
    "orphaned segments are GC'd once no live version names them") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val built = Similarity.buildIvfIndex(emb, nlist = 4,
      initCentroids = Some(init))
    val dir = java.nio.file.Files.createTempDirectory("ivfgc").toString
    try {
      Similarity.writeIvfIndex(built, dir)                   // v1: seg-1
      Similarity.appendToIvfIndex(spark, dir,
        emb.where(col("vec_id") < 4))                        // v2: seg-1,2
      Similarity.writeIvfIndex(built, dir)                   // v3: seg-3
      // keepVersions=2 holds v2+v3 live; v2 still names seg-1/seg-2 so
      // they survive, and the rebuild's manifest is just seg-3
      assert(graft.sources.Artifacts.latestDir(spark, dir) === s"$dir/v3")
      val segs = new java.io.File(s"$dir/segments").list().sorted.toSeq
      assert(segs === Seq("seg-1", "seg-2", "seg-3"))
      // one more publish ages v2 out -> seg-1/seg-2 unreferenced -> GC'd
      Similarity.appendToIvfIndex(spark, dir,
        emb.where(col("vec_id") >= 4 && col("vec_id") < 8)) // v4: seg-3,4
      val segs2 = new java.io.File(s"$dir/segments").list().sorted.toSeq
      assert(segs2 === Seq("seg-3", "seg-4"))
      // and the surviving index is exactly rebuild + delta
      val got = Similarity.readIvfIndex(spark, dir)
        .assigned.count()
      assert(got === emb.count() + 4)
      // the lifecycle inspector composes: v3+v4 published (retention
      // window), exactly the latest flagged, orphans impossible here
      val desc = graft.sources.Artifacts.describe(spark, dir)
        .orderBy("version").collect()
        .map(r => (r.getAs[Int]("version"), r.getAs[Boolean]("published"),
          r.getAs[Boolean]("is_latest"))).toSeq
      assert(desc === Seq((3, true, false), (4, true, true)))
    } finally built.unpersist()
  }

  test("ivfTopK with nprobe = nlist equals exact brute-force top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val brute = Similarity.bruteForceTopK(emb, q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Similarity.ivfTopK(emb, q, 10, nlist = 4, nprobe = 4,
        initCentroids = Some(init))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf === brute)
  }
}

class LangDetectSpec extends SparkSpec {
  import TextAnalysis._

  test("detectLang picks the dominant marker language; ties break to " +
    "first in sorted order") {
    import spark.implicits._
    val rows = Seq(
      "the cat and the dog is of the house",   // en
      "der Hund und die Katze das ist gut",    // de
      "le chat et la maison est les jours",    // fr
      "xyzzy qwerty nothing matches at all")   // tie of zeros -> 'de'
      .toDF("text")
    val got = rows.select(detectLang(col("text"))).collect().map(_.getString(0))
    assert(got(0) === "en")
    assert(got(1) === "de")
    assert(got(2) === "fr")
    assert(got(3) === langsOrdered.head)
  }

  test("detectLangSql stays in sync with the marker map") {
    // generated from the same map: every language literal must appear
    langsOrdered.foreach(l => assert(detectLangSql.contains(s"'$l'")))
    langMarkers.values.flatten.foreach(w =>
      assert(detectLangSql.contains(s"\\b$w\\b")))
  }
}
