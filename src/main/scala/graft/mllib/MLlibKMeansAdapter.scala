package graft.mllib

import org.apache.spark.mllib.clustering.{KMeans => MLKMeans, KMeansModel => MLKMeansModel}
import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib adapter (SURVEY §7.1 PR 4): the same CLI surface can run Spark
  * MLlib's KMeans as the engine, serving as the sanctioned-oracle
  * cross-check for the parity engine. MLlib computes in f64 without the
  * reference's 5-dp rounding (SURVEY §7.4.1), so it is the
  * tolerance-checked oracle, not the bit-parity target — trajectories
  * agree on well-separated data and diverge in the last digits
  * otherwise (CrossCheckSpec).
  */
object MLlibKMeansAdapter {

  /** Fit MLlib KMeans over an `array<float>` features column.
    *
    * @param maxIter       mirrors the reference's maxloop M−1 semantics
    *                      when callers pass `maxLoop - 1`.
    * @param initCentroids optional injected initial centroids (same
    *                      determinism knob as the native engine).
    * @return (centroids as f32 arrays, iterations run if exposed) */
  def fit(
      points: DataFrame,
      k: Int,
      maxIter: Int,
      tol: Double,
      seed: Long,
      initCentroids: Option[Array[Array[Float]]] = None,
      featuresCol: String = "features"): Array[Array[Float]] = {
    val rdd = points
      .select(col(featuresCol).cast("array<double>"))
      .rdd
      .map(r => Vectors.dense(r.getSeq[Double](0).toArray))
    val base = new MLKMeans()
      .setK(k)
      .setMaxIterations(math.max(maxIter, 1))
      .setEpsilon(tol)
      .setSeed(seed)
    initCentroids.foreach { init =>
      base.setInitialModel(new MLKMeansModel(
        init.map(c => Vectors.dense(c.map(_.toDouble)))))
    }
    base.run(rdd).clusterCenters.map(_.toArray.map(_.toFloat))
  }
}
