package graft.kmeans

import org.apache.spark.mllib.clustering.{KMeans => MLKMeans, KMeansModel => MLKMeansModel}
import org.apache.spark.mllib.linalg.Vectors

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** Oracle cross-check (SURVEY §5.4): our parity engine (f32, 5-dp
  * rounding) vs Spark MLlib's KMeans (f64, unrounded) from the SAME
  * injected initial centroids on well-separated clusters — both must
  * converge to the same fixed point within tolerance. */
class CrossCheckSpec extends SparkSpec {

  test("graft KMeans and MLlib KMeans agree on well-separated clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // 3 well-separated blobs in 4-D
    val centers = Seq(Array(0.0, 0.0, 0.0, 0.0), Array(10.0, 10.0, 0.0, 5.0),
      Array(-8.0, 4.0, 9.0, -3.0))
    val pts: Seq[Array[Float]] = (0 until 300).map { i =>
      val c = centers(i % 3)
      c.map(v => (v + rnd.nextGaussian() * 0.3).toFloat)
    }
    val init = Array(pts(0), pts(1), pts(2)) // one seed per blob

    val ours = KMeans.fit(
      pts.map(Tuple1(_)).toDF("features"),
      KMeansParams(k = 3, threshold = 1e-6, maxLoop = 50,
        initCentroids = Some(init.map(_.clone()))))
    assert(ours.converged)

    val rdd = spark.sparkContext.parallelize(
      pts.map(p => Vectors.dense(p.map(_.toDouble))))
    val mllib = new MLKMeans()
      .setK(3).setMaxIterations(50).setEpsilon(1e-9)
      .setInitialModel(new MLKMeansModel(
        init.map(c => Vectors.dense(c.map(_.toDouble)))))
      .run(rdd)

    val mlCenters = mllib.clusterCenters.map(_.toArray.map(_.toFloat))
    ours.centroids.zip(mlCenters).foreach { case (a, b) =>
      assert(euclidean(a, b) < 1e-3,
        s"centroid mismatch: ${a.toSeq} vs ${b.toSeq}")
    }
  }
}

/** Golden parity run on the reference's own dataset (read-only at
  * /root/reference/Data/CustomerData.txt, 2000×7 min-max-normalized):
  * the engine's per-iteration math must match a line-faithful driver
  * reimplementation (same f32 parse, f32-mean + 5-dp half-up round,
  * strict-< argmin, <= threshold convergence) — SURVEY §5.3, computed
  * on the fly instead of stored golden files. */
class ReferenceDataParitySpec extends SparkSpec {

  private val dataPath = "/root/reference/Data/CustomerData.txt"

  test("3 Lloyd iterations on CustomerData.txt match the driver-math oracle") {
    assume(new java.io.File(dataPath).exists())
    val lines = scala.io.Source.fromFile(dataPath).getLines()
      .filter(_.trim.nonEmpty).toArray
    val pts = lines.map(_.split(",").map(_.trim.toFloat))
    assert(pts.length === 2000 && pts.forall(_.length === 7))

    val k = 5
    var oracle = Array.tabulate(k)(i => pts(i * 400).clone()) // spread init

    // line-faithful reimplementation of one MapReduce round:
    // KMapper argmin (strict <) -> KReducer sum -> calcAverage (f32 mean,
    // 5-dp round half-up), PointWritable.java:88-112
    def step(cents: Array[Array[Float]]): Array[Array[Float]] = {
      val sums = Array.fill(k)(new Array[Double](7))
      val cnts = new Array[Long](k)
      pts.foreach { p =>
        val c = argminCentroid(p, cents)
        addInto(sums(c), p)
        cnts(c) += 1
      }
      Array.tabulate(k) { c =>
        if (cnts(c) == 0) cents(c)
        else meanRounded5(sums(c), cnts(c))
      }
    }

    val df = graft.sources.PointReader.read(spark, dataPath)
    val model = KMeans.fit(df, KMeansParams(k = k, threshold = -1.0,
      maxLoop = 4, initCentroids = Some(oracle.map(_.clone()))))
    assert(model.iterations === 3)

    (1 to 3).foreach(_ => oracle = step(oracle))
    model.centroids.zip(oracle).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(got.toSeq === exp.toSeq, s"centroid $i diverged from driver math")
    }
  }
}
