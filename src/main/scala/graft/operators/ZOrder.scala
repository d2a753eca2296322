package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) layout: sort a table along an interleaving
  * of several columns' bits so that a box predicate on ANY subset of
  * those columns lands in a small, contiguous slice of the files —
  * parquet row-group min/max stats then skip everything else at scan
  * time. Hive-style `partitionBy` prunes on one coarse key;
  * range-sorting prunes on one column; z-ordering is the layout tool
  * for the "filter by user AND time AND score" scans a 100 TB curation
  * store serves, and Spark has no built-in for it.
  *
  * The curve value is layout metadata only — it never changes query
  * results, so correctness is "reads back identically" and the win is
  * measured, not asserted, from scan metrics (ZOrderSpec).
  */
object ZOrder {

  /** Morton value interleaving `cols` (numeric), each linearly scaled
    * to `bits` bits over its observed [min, max]. One aggregate job
    * computes the ranges (constant driver payload); the interleave
    * itself is a pure codegen'd shift/mask chain.
    *
    * `bits × cols.size` must fit in a long; 16 bits × 2–3 dims is
    * plenty — the curve only has to separate row groups, not rows.
    */
  def zValueOf(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits*cols must fit in a long, got $bits*${cols.size}")
    val ranges = df.agg(
      array(cols.map(c => min(col(c)).cast("double")): _*).as("lo"),
      array(cols.map(c => max(col(c)).cast("double")): _*).as("hi"))
      .first()
    val lo = ranges.getSeq[Double](0)
    val hi = ranges.getSeq[Double](1)
    val top = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      // degenerate range → everything in cell 0
      if (hi(i) <= lo(i)) lit(0L)
      else least(lit(top), greatest(lit(0L),
        ((col(c).cast("double") - lit(lo(i))) *
          lit(top / (hi(i) - lo(i)))).cast("long")))
    }
    val n = cols.size
    val terms = for {
      (s, c) <- scaled.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(s, b).bitwiseAND(lit(1L)), b * n + c)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to `path` as `numFiles` parquet files range-split and
    * sorted along the Morton curve of `cols`. The curve column is
    * dropped before the write — the layout, not the schema, carries
    * it. */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("_graft_z", zValueOf(df, cols, bits))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
