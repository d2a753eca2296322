package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math used across the engine: clustering (assignment distance),
  * similarity search (cosine / dot), and dedup (embedding near-dup).
  *
  * Two forms of each function:
  *   - a plain Scala form used inside typed `Dataset.map` / driver loops
  *     (parity with the reference's float-in / double-accumulate math,
  *     `Code/KmeanMapReduce/src/PointWritable.java:95-104`);
  *   - a `Column` form built from `org.apache.spark.sql.functions`
  *     higher-order functions (`zip_with` / `aggregate`), which stays
  *     inside Catalyst and whole-stage codegen — preferred in DataFrame
  *     pipelines at scale.
  */
object VectorFunctions {

  // ---------------------------------------------------------------- Scala

  /** Euclidean distance; float inputs, double accumulation — matches the
    * reference (`PointWritable.calcDistance`, PointWritable.java:95-104). */
  def euclidean(a: Array[Float], b: Array[Float]): Double =
    math.sqrt(sqdist(a, b))

  /** Squared Euclidean distance (no sqrt — cheaper for argmin). */
  def sqdist(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"dim mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def dot(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"dim mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Index of the nearest centroid; ties broken to the LOWEST index
    * (strict `<`, matching the reference's running-min,
    * KMapper.java:34-43). */
  def argminCentroid(p: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = sqdist(p, centroids(0))
    var i = 1
    while (i < centroids.length) {
      val d = sqdist(p, centroids(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Element-wise vector sum into `acc` (mutates acc). Partial-aggregate
    * building block — analog of `PointWritable.sum` (PointWritable.java:88-93). */
  def addInto(acc: Array[Double], v: Array[Float]): Unit = {
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
  }

  /** Mean with the reference's 5-dp round-half-up on each coordinate
    * (`PointWritable.calcAverage`, PointWritable.java:106-112:
    * `Math.round(v*100000)/100000.0f`). */
  def meanRounded5(sums: Array[Double], n: Long): Array[Float] = {
    val out = new Array[Float](sums.length)
    var i = 0
    while (i < sums.length) {
      val mean = (sums(i) / n).toFloat // reference divides in float space
      out(i) = (Math.round(mean * 100000f) / 100000.0f)
      i += 1
    }
    out
  }

  // --------------------------------------------------------------- Column

  private def expr(c: Column) =
    org.apache.spark.sql.graftshim.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftshim.column(e)

  /** Codegen'd dot product of two array<float|double> columns, double
    * accumulation — the native [[VecDot]] expression (the `zip_with` +
    * `aggregate` HOF form is interpreted per element and ~100× slower). */
  def dotCol(a: Column, b: Column): Column = toCol(VecDot(expr(a), expr(b)))

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def sqdistCol(a: Column, b: Column): Column =
    toCol(VecSqDist(expr(a), expr(b)))

  def euclideanCol(a: Column, b: Column): Column = sqrt(sqdistCol(a, b))

  def cosineCol(a: Column, b: Column): Column = {
    val d = dotCol(a, b)
    val n = normCol(a) * normCol(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Float-array literal column (`array<float>`). */
  def vecLit(v: Array[Float]): Column = array(v.map(x => lit(x)): _*)

  /** Native-loop argmin over a literal codebook ([[VecArgminSqDist]]):
    * a fixed ~20-line generated loop regardless of k·dim (the codebook
    * rides as one `references[]` object), bit-identical picks to the
    * [[assignCol]] CASE chain. Use when several argmins must share one
    * projection (the PQ encoder) — inline chains there overran
    * janino's 64 KB method limit and fell back to interpreted eval. */
  def argminSqDistCol(
      features: Column, centroids: Array[Array[Float]]): Column =
    toCol(VecArgminSqDist(expr(features),
      centroids.map(_.toSeq).toSeq))

  /** J1 argmin-over-centroids as a codegen'd CASE chain over [[VecSqDist]]
    * distances, ties to the LOWEST index (strict `<` running min,
    * KMapper.java:39). Bit-identical to [[argminCentroid]]: VecSqDist
    * folds the same (aᵢ−bᵢ)² terms left-to-right in double.
    *
    * Small k (≤ 16) is ONE CASE chain — O(k²) comparisons, but
    * whole-stage codegen CSE evaluates each distance once. Large k is
    * CHUNKED: centroids split into groups of ≤ 16, each group resolves
    * its (min-distance, argmin) with the same chain, and the groups
    * combine recursively with the identical earliest-wins `<=` device —
    * so k = 64 costs 4 chunk chains + one 4-way combine instead of a
    * 2016-comparison chain that overruns janino's method-size limit
    * (and, before this, fell back to a non-codegen ScalaUDF).
    * Earliest-wins at every level ≡ the flat running min: within a
    * chunk ties go to the lowest index, and across chunks `<=` against
    * every LATER chunk's min picks the earliest chunk achieving the
    * global min. */
  def assignCol(features: Column, centroids: Array[Array[Float]]): Column = {
    // A/B knob (the triangleAlgo discipline): 'native' (default —
    // the [[VecArgminSqDist]] loop expression: round-13 sf0.1 mins
    // q06 0.53→0.42, q31 0.27→0.23, q32 0.26→0.22, q07 0.94→0.87,
    // q30 flat, and no 64 KB source cliff) or 'chain' (the chunked
    // literal CASE chain, kept for parity specs and rollback).
    // ABOVE the codegen-cells budget both impls ship the broadcast
    // kernel instead: an embedded codebook rides in every STAGE's
    // task binary, so an iterative fit over a huge codebook re-ships
    // it per round where the broadcast ships once per executor.
    val impl = org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.kmeans.argminImpl").getOrElse("native")
    // fail fast on a typo'd impl BEFORE the cells gate — otherwise an
    // A/B run over a beyond-budget codebook would silently measure the
    // broadcast kernel under both labels
    if (impl != "native" && impl != "chain")
      throw new IllegalArgumentException(
        "spark.graft.kmeans.argminImpl must be 'chain' or 'native', " +
          s"got '$impl'")
    val cells = centroids.length.toLong *
      (if (centroids.isEmpty) 0L else centroids(0).length.toLong)
    impl match {
      case _ if cells > maxCodegenCells =>
        assignColBroadcast(features, centroids)
      case "native" => argminSqDistCol(features, centroids)
      case "chain" =>
        val ds = centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
          (sqdistCol(features, vecLit(c)), lit(i): Column)
        }
        argminPairs(ds)
    }
  }

  /** k·dim literal budget for the CASE-chain argmin. The chain inlines
    * every centroid coordinate into the expression tree; at hundreds of
    * high-dimensional centroids that tree is multi-megabyte and can
    * overrun codegen limits (falling back to interpreted evaluation —
    * correct but a perf cliff). Above this budget [[assignCol]] ships
    * the codebook as ONE broadcast instead and runs the same
    * strict-`<` running-min kernel per row ([[argminCentroid]] — the
    * exact fold the chain compiles to, parity-pinned in
    * VectorFunctionsSpec). Override with
    * `spark.graft.kmeans.maxCodegenCells`. */
  private def maxCodegenCells: Long =
    org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.kmeans.maxCodegenCells")
      .map(_.toLong).getOrElse(8192L)

  /** Broadcast-codebook argmin for beyond-codegen-budget k·dim: one
    * broadcast of the float codebook, a map-side kernel per row, no
    * shuffle — the 1000-executor posture for huge codebooks (the chain
    * would ship the same bytes inside every serialized plan instead).
    * Features cast to `array<float>` first: the K-Means contract is
    * float space end-to-end (reference parity), so the cast is exact
    * for every producer in this engine. */
  private def assignColBroadcast(
      features: Column, centroids: Array[Array[Float]]): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bc = spark.sparkContext.broadcast(centroids)
    val kernel = udf { (v: scala.collection.Seq[Float]) =>
      argminCentroid(v.toArray, bc.value)
    }
    kernel(features.cast("array<float>"))
  }

  /** Earliest-wins argmin over (value, payload) pairs, chunked at 16. */
  private def argminPairs(
      pairs: IndexedSeq[(Column, Column)]): Column = {
    val k = pairs.length
    if (k == 1) pairs(0)._2
    else if (k <= 16)
      (0 until k - 1).foldRight(pairs(k - 1)._2) { (i, acc) =>
        when((i + 1 until k).map(j => pairs(i)._1 <= pairs(j)._1)
            .reduce(_ && _), pairs(i)._2)
          .otherwise(acc)
      }
    else {
      val folded = pairs.grouped(16).toIndexedSeq.map { ch =>
        val minD =
          if (ch.length == 1) ch(0)._1 else least(ch.map(_._1): _*)
        (minD, argminPairs(ch))
      }
      argminPairs(folded)
    }
  }
}
