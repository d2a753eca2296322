package graft.kmeans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions._

class KMeansSpec extends SparkSpec {

  private def toDF(points: Seq[Array[Float]]) = {
    import spark.implicits._
    points.map(p => Tuple1(p)).toDF("features")
  }

  test("hand-computed 4-point k=2 converges to the two pair means") {
    // clusters {(0,0),(0,2)} and {(10,0),(10,2)} -> centroids (0,1),(10,1)
    val pts = Seq(Array(0f, 0f), Array(0f, 2f), Array(10f, 0f), Array(10f, 2f))
    val model = KMeans.fit(toDF(pts),
      KMeansParams(k = 2, threshold = 1e-4, maxLoop = 20,
        initCentroids = Some(Array(Array(0f, 0f), Array(10f, 2f)))))
    assert(model.converged)
    assert(model.centroids(0).toSeq === Seq(0f, 1f))
    assert(model.centroids(1).toSeq === Seq(10f, 1f))
  }

  test("maxLoop off-by-one: maxLoop=1 runs 0 iterations (Main.java:303-305)") {
    val pts = Seq(Array(0f), Array(10f))
    val init = Array(Array(1f), Array(9f))
    val model = KMeans.fit(toDF(pts),
      KMeansParams(k = 2, threshold = 0.0, maxLoop = 1,
        initCentroids = Some(init)))
    assert(model.iterations === 0)
    assert(model.centroids(0).toSeq === Seq(1f)) // unchanged
  }

  test("maxLoop=M runs at most M-1 iterations") {
    val pts = Seq(Array(0f), Array(1f), Array(10f), Array(11f))
    val model = KMeans.fit(toDF(pts),
      KMeansParams(k = 2, threshold = -1.0, maxLoop = 5, // thresh<0: never converges
        initCentroids = Some(Array(Array(0f), Array(11f)))))
    assert(model.iterations === 4)
    assert(!model.converged)
  }

  test("empty cluster keeps its previous centroid (documented divergence)") {
    val pts = Seq(Array(0f), Array(1f))
    // centroid 2 at 100 gets no points
    val model = KMeans.fit(toDF(pts),
      KMeansParams(k = 3, threshold = 1e-4, maxLoop = 3,
        initCentroids = Some(Array(Array(0f), Array(1f), Array(100f)))))
    assert(model.centroids(2).toSeq === Seq(100f))
  }

  test("convergence boundary: movement == threshold stops (<=, Main.java:213)") {
    // init (0), data mean (1) -> movement exactly 1.0 == threshold -> stop
    val pts = Seq(Array(1f))
    val model = KMeans.fit(toDF(pts),
      KMeansParams(k = 1, threshold = 1.0, maxLoop = 10,
        initCentroids = Some(Array(Array(0f)))))
    assert(model.converged)
    assert(model.iterations === 1)
  }

  test("centroid means are rounded to 5 dp (PointWritable.calcAverage)") {
    val pts = Seq(Array(0.111111f), Array(0.222222f)) // mean 0.1666665
    val model = KMeans.fit(toDF(pts),
      KMeansParams(k = 1, threshold = 10.0, maxLoop = 2,
        initCentroids = Some(Array(Array(0f)))))
    val c = model.centroids(0)(0)
    assert(c === 0.16667f || c === 0.16666f) // 5-dp quantized either side of half
    assert(math.abs(c - 0.1666665f) < 1e-5)
    assert((c * 100000f).round / 100000f === c)
  }

  test("Lloyd invariant: within-cluster SSE never increases across iterations") {
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(200)(Array.fill(4)(rnd.nextFloat()))
    val df = toDF(pts).cache()
    val init = Array(pts(0).clone(), pts(50).clone(), pts(100).clone())
    def sse(cents: Array[Array[Float]]): Double =
      pts.map(p => sqdist(p, cents(argminCentroid(p, cents)))).sum
    var prev = sse(init)
    var cents = init
    (1 to 5).foreach { _ =>
      val m = KMeans.fit(df, KMeansParams(k = 3, threshold = -1.0, maxLoop = 2,
        initCentroids = Some(cents)))
      cents = m.centroids
      val s = sse(cents)
      assert(s <= prev + 1e-6, "SSE increased")
      prev = s
    }
    df.unpersist()
  }

  test("transform labels every point with its nearest centroid") {
    val pts = Seq(Array(0f, 0f), Array(9f, 9f), Array(1f, 1f))
    val cents = Array(Array(0f, 0f), Array(10f, 10f))
    val labeled = KMeansModel(cents, 0, converged = true)
      .transform(toDF(pts))
      .select("cluster").collect().map(_.getInt(0)).toSeq
    assert(labeled === Seq(0, 1, 0))
  }

  test("VectorMeanAggregator agrees with the declarative groupBy path") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(100)((rnd.nextInt(3), Array.fill(5)(rnd.nextFloat())))
    val agg = new VectorMeanAggregator(5).toColumn
    val typed = pts.toDS()
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .collect().toMap
    // oracle: plain Scala
    pts.groupBy(_._1).foreach { case (k, rows) =>
      val sums = new Array[Double](5)
      rows.foreach(r => addInto(sums, r._2))
      val expect = meanRounded5(sums, rows.size)
      assert(typed(k).toSeq === expect.toSeq, s"cluster $k")
    }
  }

  test("fit on driver testdata embeddings produces k valid centroids") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("features"))
    val model = KMeans.fit(emb, KMeansParams(k = 4, threshold = 1e-3,
      maxLoop = 10, seed = 42L))
    assert(model.centroids.length === 4)
    assert(model.centroids.forall(_.length === model.centroids(0).length))
    assert(model.iterations >= 1)
  }

  test("treeReduce partial merge is bit-identical to the driver collect " +
    "fold (the extreme-P posture behind spark.graft.kmeans." +
    "treeReducePartitions)") {
    // Many small partitions so the tree's executor-side pre-merges
    // combine partials in a genuinely different shape/order than the
    // driver's sequential fold — exact-cell merging must erase that.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("features"))
      .repartition(13)
    val params = KMeansParams(k = 5, threshold = 1e-6, maxLoop = 8,
      seed = 7L)
    val viaCollect = KMeans.fit(emb, params) // 13 partitions <= 1024
    val confKey = "spark.graft.kmeans.treeReducePartitions"
    spark.conf.set(confKey, "1") // 13 > 1 -> every round treeReduces
    val viaTree =
      try KMeans.fit(emb, params)
      finally spark.conf.unset(confKey)
    assert(viaTree.iterations === viaCollect.iterations)
    assert(viaTree.converged === viaCollect.converged)
    viaTree.centroids.zip(viaCollect.centroids).zipWithIndex.foreach {
      case ((t, c), i) => assert(t.toSeq === c.toSeq, s"centroid $i")
    }
  }
}

class DbiSpec extends SparkSpec {

  test("DBI hand-computed on 4 points, 2 clusters") {
    import spark.implicits._
    // cluster 0: (0,0),(0,2) centroid (0,1) -> sigma = 1
    // cluster 1: (10,0),(10,2) centroid (10,1) -> sigma = 1
    // d(c0,c1) = 10 -> ratio (1+1)/10 = 0.2 both ways -> DBI = 0.2
    val labeled = Seq(
      (Array(0f, 0f), 0), (Array(0f, 2f), 0),
      (Array(10f, 0f), 1), (Array(10f, 2f), 1)).toDF("features", "cluster")
    val cents = Array(Array(0f, 1f), Array(10f, 1f))
    val dbi = Dbi.compute(labeled, cents)
    assert(math.abs(dbi - 0.2) < 1e-9)
  }

  test("empty cluster degenerates DBI (reference parity, Main.java:93)") {
    import spark.implicits._
    // empty cluster 1: sigma(1) = 0/0 = NaN; the reference's running-max
    // `if (r > max)` skips NaN comparisons, leaving max = -Infinity, so
    // the final DBI is non-finite (not a clean NaN) — we mirror exactly.
    val labeled = Seq((Array(0f), 0)).toDF("features", "cluster")
    val cents = Array(Array(0f), Array(5f))
    val dbi = Dbi.compute(labeled, cents)
    assert(dbi.isNaN || dbi.isInfinite)
  }
}
