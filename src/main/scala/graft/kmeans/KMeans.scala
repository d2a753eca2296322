package graft.kmeans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions._

/** Parameters mirroring the reference CLI
  * (`Code/KmeanMapReduce/src/Main.java:258-266`):
  * `-Dk` / `-Dthresh` / `-Dmaxloop`, plus the determinism knobs the
  * reference lacks (seed, injectable init centroids — its init is an
  * unseeded `Random`, Main.java:135).
  *
  * `maxLoop` preserves the reference's off-by-one: the loop counter is
  * checked BEFORE each job, so at most `maxLoop - 1` iterations run
  * (Main.java:303-305).
  */
final case class KMeansParams(
    k: Int = 3,
    threshold: Double = 0.001,
    maxLoop: Int = 50,
    seed: Long = 42L,
    featuresCol: String = "features",
    initCentroids: Option[Array[Array[Float]]] = None)

/** Fitted model: final centroids + loop metadata. The reference never
  * persists labels (only centroids, Main.java:356-359); `transform`
  * exposes labeling as a real distributed operator (SURVEY §3.3). */
final case class KMeansModel(
    centroids: Array[Array[Float]],
    iterations: Int,
    converged: Boolean) {

  /** Label every row with its nearest centroid — a pure broadcast map,
    * no shuffle (reference does this driver-side over the whole dataset,
    * Main.java:345-355; we stay distributed). */
  def transform(
      df: DataFrame,
      featuresCol: String = "features",
      outputCol: String = "cluster"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val assignU = udf((f: Seq[Float]) => argminCentroid(f.toArray, bc.value))
    df.withColumn(outputCol, assignU(col(featuresCol)))
  }

  def centroidsAsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toSeq
      .toDF("cluster", "centroid")
  }
}

/** Spark-native Lloyd's K-Means — the reference's whole pipeline
  * (SURVEY §3.1) re-expressed:
  *
  *   - per-iteration MapReduce job  →  one cached DataFrame + one
  *     `groupBy("cluster")` aggregation (Catalyst's partial/final
  *     HashAggregate replaces KCombiner/KReducer);
  *   - centroids through Hadoop `Configuration` →  `sparkContext.broadcast`;
  *   - reducer-output file round-trip (Main.java:175-203)  →  `collect()`
  *     of k tiny rows;
  *   - input re-read per job (Main.java:318 in-loop)  →  `persist()` once.
  *
  * Parity-preserving semantics: f32 coordinates, mean computed in float
  * then rounded to 5 dp half-up at the final aggregate only
  * (`PointWritable.calcAverage`, PointWritable.java:106-112), argmin ties
  * to the lowest index (KMapper.java:39), convergence when every centroid
  * moved `<= threshold` (Main.java:205-220), at most `maxLoop - 1`
  * iterations. Divergence (documented, SURVEY §7.4.3): an empty cluster
  * keeps its previous centroid instead of NPE-ing the driver.
  *
  * At scale: the only shuffle per iteration carries k×(dim+1) partial
  * sums per map partition (map-side partial agg), so a 1000-executor run
  * shuffles kilobytes regardless of input size; assignment is narrow.
  */
object KMeans {

  /** Seeded distinct uniform sample as initial centroids — the analog of
    * the reference's positional line sample (Main.java:129-164) with the
    * determinism it lacks. */
  def initCentroids(
      df: DataFrame,
      featuresCol: String,
      k: Int,
      seed: Long): Array[Array[Float]] = {
    val rows = df
      .select(col(featuresCol).cast("array<float>"))
      .rdd
      .map(_.getSeq[Float](0).toArray)
      .takeSample(withReplacement = false, num = k, seed = seed)
    require(rows.length == k, s"dataset has fewer than k=$k rows")
    rows
  }

  def fit(df: DataFrame, params: KMeansParams): KMeansModel = {
    val spark = df.sparkSession
    val data = df
      .select(col(params.featuresCol).cast("array<float>").as("features"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids = params.initCentroids
        .map { init =>
          require(init.length == params.k, "init centroid count != k")
          init.map(_.clone())
        }
        .getOrElse(initCentroids(data, "features", params.k, params.seed))
      val dim = centroids(0).length

      // Declarative per-cluster (count, element-wise sum) — Catalyst plans
      // partial + final HashAggregate automatically (the combiner, A2/A3).
      val sumCols: Seq[Column] = (0 until dim).map { i =>
        sum(element_at(col("features"), i + 1).cast("double")).as(s"s$i")
      }

      var loop = 1
      var converged = false
      while (loop < params.maxLoop && !converged) {
        val bc = spark.sparkContext.broadcast(centroids)
        val assignU = udf((f: Seq[Float]) => argminCentroid(f.toArray, bc.value))
        val rows = data
          .withColumn("cluster", assignU(col("features")))
          .groupBy("cluster")
          .agg(count(lit(1)).as("cnt"), sumCols: _*)
          .collect()

        // Empty cluster -> keep previous centroid (documented divergence).
        val next = centroids.map(_.clone())
        rows.foreach { r =>
          val cid = r.getInt(0)
          val cnt = r.getLong(1)
          val sums = Array.tabulate(dim)(i => r.getDouble(2 + i))
          next(cid) = meanRounded5(sums, cnt)
        }
        converged =
          centroids.zip(next).forall { case (o, n) =>
            euclidean(o, n) <= params.threshold
          }
        centroids = next
        bc.unpersist(blocking = false)
        loop += 1
      }
      KMeansModel(centroids, loop - 1, converged)
    } finally data.unpersist()
  }
}
