package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing (decile/percentile assignment) without the
  * single-task trap: `ntile(n) OVER ()` — the textbook form — puts
  * every row through ONE window partition, a straggler that gets worse
  * linearly with data size. Here the boundaries are computed once by a
  * distributed partial/final percentile aggregate, collected to the
  * driver (n−1 doubles — constant size at any data scale), and applied
  * as a broadcast-literal CASE chain inside whole-stage codegen: two
  * scans, zero sorts, zero windows.
  */
object Quantiles {

  /** Add an `outCol` bucket id in [1, buckets] to every row of `df`,
    * splitting `valueCol` at its exact interpolated quantiles
    * (`quantile_cont` semantics — matches DuckDB/Postgres/Spark
    * `percentile`). Rows equal to a boundary fall in the lower bucket;
    * null values get a null bucket.
    *
    * Two jobs by design (boundary pass + assignment pass): callers
    * iterating on the same input should cache it. At 100 TB swap the
    * boundary aggregate for `approx_percentile` — the assignment side
    * is unchanged — at the cost of the exact cross-engine determinism
    * this form is chosen for.
    */
  def quantileBucket(
      df: DataFrame,
      valueCol: String,
      buckets: Int,
      outCol: String = "bucket"): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val row = df
      .agg(percentile(col(valueCol), lit(probs.toArray)))
      .first()
    require(!row.isNullAt(0),
      s"$valueCol has no non-null values — no quantile boundaries exist")
    val boundaries = row.getSeq[Double](0)
    val bucket: Column = boundaries
      .map(b => when(col(valueCol) > lit(b), 1).otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)
    df.withColumn(outCol, when(col(valueCol).isNotNull, bucket))
  }
}
