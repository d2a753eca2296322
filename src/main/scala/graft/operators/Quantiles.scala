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

  /** Percentile winsorization — clip `valueCol` to its
    * [pLo, pHi] exact interpolated percentile band (quantile_cont
    * semantics, the q47 device), the outlier-robust feature transform
    * trainers apply before normalization. Boundaries come from ONE
    * distributed partial/final percentile aggregate (constant driver
    * payload) and are baked in as literals, so the clip itself is one
    * codegen'd least/greatest per row — two scans total, no join, no
    * sort. Nulls pass through as nulls. */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      pLo: Double,
      pHi: Double,
      outCol: String): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val row = df
      .agg(percentile(col(valueCol).cast("double"),
        lit(Array(pLo, pHi))))
      .first()
    require(!row.isNullAt(0),
      s"$valueCol has no non-null values — no percentile band exists")
    val Seq(lo, hi) = row.getSeq[Double](0)
    df.withColumn(outCol,
      when(col(valueCol).isNull, lit(null).cast("double"))
        .otherwise(least(greatest(col(valueCol).cast("double"), lit(lo)),
          lit(hi))))
  }

  /** Robust scaling — (x − median)/IQR, the outlier-insensitive
    * normalization ([[graft.operators.Features.applyScaler]]'s z-score
    * breaks down when the tail drives mean/σ): p25/p50/p75 from ONE
    * distributed exact-interpolated percentile aggregate (quantile_cont
    * semantics, constant driver payload), baked in as literals; the
    * scale itself is one codegen'd subtract+divide per row — exact
    * parity with no rounding device (single IEEE ops on identical
    * doubles). Nulls pass through; a zero IQR yields null, not ±Inf. */
  def robustScale(
      df: DataFrame,
      valueCol: String,
      outCol: String): DataFrame = {
    val row = df
      .agg(percentile(col(valueCol).cast("double"),
        lit(Array(0.25, 0.5, 0.75))))
      .first()
    require(!row.isNullAt(0),
      s"$valueCol has no non-null values — no quartiles exist")
    val Seq(q1, med, q3) = row.getSeq[Double](0)
    val iqr = q3 - q1
    df.withColumn(outCol,
      if (iqr == 0.0) lit(null).cast("double")
      else when(col(valueCol).isNull, lit(null).cast("double"))
        .otherwise((col(valueCol).cast("double") - med) / iqr))
  }
}
