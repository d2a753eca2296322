package graft.kmeans

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Label every row with its nearest centroid — a pure narrow map, no
    * shuffle (reference does this driver-side over the whole dataset,
    * Main.java:345-355; we stay distributed). Always the codegen'd
    * `VecSqDist` CASE-chain argmin (inside whole-stage codegen): small
    * k is one chain, large k the chunked-combine form — identical
    * semantics at any k (same double fold, same lowest-index ties),
    * no ScalaUDF fallback anywhere on the labeling pass. */
  def transform(
      df: DataFrame,
      featuresCol: String = "features",
      outputCol: String = "cluster"): DataFrame =
    df.withColumn(outputCol, assignCol(col(featuresCol), centroids))

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
  *   - per-iteration MapReduce job  →  one cached distributed dataset +
  *     one narrow partial-aggregation pass per iteration;
  *   - centroids through Hadoop `Configuration` →  `sparkContext.broadcast`;
  *   - reducer-output file round-trip (Main.java:175-203)  →  `collect()`
  *     of per-partition partials, final merge on the driver;
  *   - input re-read per job (Main.java:318 in-loop)  →  `persist()` once.
  *
  * The iteration body is the combiner/reducer split made explicit
  * (KCombiner.java:9-18 / KReducer.java:12-26): each partition folds its
  * rows into k×(dim+1) partial (sum, count) cells — A2 — and the driver
  * merges the k-sized partials and takes the rounded mean — A3. It runs
  * as `mapPartitions` + `collect` rather than a per-iteration
  * `groupBy().agg()` because an iterative loop re-plans a k×dim
  * aggregate every pass (measured ~1.2 s/iteration of analysis/codegen/
  * scheduling overhead at bench scale — the dominant cost for small
  * inputs), whereas this loop reuses one cached RDD and ships only
  * k×(dim+1)×numPartitions doubles to the driver per iteration; there is
  * NO shuffle at all. The declarative `groupBy` form of the same
  * aggregation remains the engine's single-step operator (q07) where
  * Catalyst's partial/final HashAggregate split is asserted by PlanSpec.
  *
  * Determinism: partitions accumulate in row order and the driver merges
  * partials in partition order, so the double-precision sums are
  * bit-stable across runs (a parallel `sum()` over doubles is not).
  *
  * Parity-preserving semantics: f32 coordinates, mean computed in float
  * then rounded to 5 dp half-up at the final aggregate only
  * (`PointWritable.calcAverage`, PointWritable.java:106-112), argmin ties
  * to the lowest index (KMapper.java:39), convergence when every centroid
  * moved `<= threshold` (Main.java:205-220), at most `maxLoop - 1`
  * iterations. Divergence (documented, SURVEY §7.4.3): an empty cluster
  * keeps its previous centroid instead of NPE-ing the driver.
  *
  * At scale: assignment+partial-agg is one narrow pass over cached
  * partitions; a 1000-executor run returns k×(dim+1) doubles per
  * partition to the driver (tens of MB at 10k partitions — if k×dim×P
  * outgrows the driver, swap the `collect` for a `treeReduce`; the
  * per-partition fold is unchanged).
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
    val k = params.k
    // Parse rows to primitive float arrays ONCE and cache them: every
    // iteration is then a single narrow job over deserialized vectors.
    val data = df
      .select(col(params.featuresCol).cast("array<float>").as("features"))
      .rdd
      .map(_.getSeq[Float](0).toArray)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids = params.initCentroids
        .map { init =>
          require(init.length == k, "init centroid count != k")
          init.map(_.clone())
        }
        .getOrElse {
          val rows =
            data.takeSample(withReplacement = false, num = k, seed = params.seed)
          require(rows.length == k, s"dataset has fewer than k=$k rows")
          rows
        }
      val dim = centroids(0).length

      var loop = 1
      var converged = false
      while (loop < params.maxLoop && !converged) {
        val bc = spark.sparkContext.broadcast(centroids)
        // A2 — the combiner: per-partition fold into k (sum, count) cells.
        val partials = data.mapPartitions { it =>
          val cents = bc.value
          val sums = Array.ofDim[Double](cents.length, dim)
          val cnts = new Array[Long](cents.length)
          it.foreach { p =>
            val c = argminCentroid(p, cents)
            addInto(sums(c), p)
            cnts(c) += 1
          }
          Iterator.single((sums, cnts))
        }.collect() // partition-ordered -> deterministic merge below

        // A3 — the reducer: merge partials in partition order, then the
        // 5-dp rounded float mean (PointWritable.calcAverage).
        val sums = Array.ofDim[Double](k, dim)
        val cnts = new Array[Long](k)
        partials.foreach { case (ps, pc) =>
          var c = 0
          while (c < k) {
            var i = 0
            while (i < dim) { sums(c)(i) += ps(c)(i); i += 1 }
            cnts(c) += pc(c)
            c += 1
          }
        }
        // Empty cluster -> keep previous centroid (documented divergence).
        val next = centroids.map(_.clone())
        var c = 0
        while (c < k) {
          if (cnts(c) > 0) next(c) = meanRounded5(sums(c), cnts(c))
          c += 1
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
