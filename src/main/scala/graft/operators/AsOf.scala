package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Backward as-of join: for every left row, attach the single right row
  * with the same key and the greatest right-time ≤ left-time (the
  * "latest state known at event time" join; DuckDB/kdb `ASOF JOIN`).
  *
  * Spark has no native as-of operator, and the relational encoding
  * (theta-join on `rt <= lt` + per-left-row top-1) explodes to a range
  * join. This is the distributed merge algorithm instead:
  *
  *   1. tag left/right rows and union them — one schema, one pass;
  *   2. `repartition` by key (the ONLY shuffle) and
  *      `sortWithinPartitions(key, time, tag)` — Spark's external sort,
  *      spill-safe at any partition size;
  *   3. one `mapPartitions` sweep carrying the latest right payload per
  *      key (right rows sort before left rows at equal time, so a tie
  *      means "state as of exactly t" is visible to the event at t).
  *
  * Cost at scale: one shuffle of left+right keyed rows, a per-partition
  * sort, O(1) state per key in the sweep. No broadcast, no n² ranges.
  */
object AsOf {

  /** @param rightCols right-side payload columns to attach (nulled when
    *                   no right row precedes the left row). */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftFields = left.schema.fields.toSeq
    val rightPayloadFields =
      rightCols.map(c => right.schema(c).copy(nullable = true))

    // unified row: key, time, tag (0 = right/state, 1 = left/event),
    // left payload (nulls on right rows), right payload (nulls on left);
    // NullType literals widen to the other side's types at union analysis.
    // Rows tied on (key, time) within the RIGHT side are ambiguous — give
    // this operator a right side unique per (key, time).
    val nullRight = rightCols.map(_ => lit(null))
    val taggedLeft = left.select(
      (Seq(col(leftKey).as("_k"), col(leftTime).as("_t"), lit(1).as("_tag")) ++
        leftFields.map(f => col(f.name)) ++ nullRight): _*)
    val nullLeft = leftFields.map(_ => lit(null))
    val taggedRight = right.select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_tag")) ++
        nullLeft ++ rightCols.map(col)): _*)
    // positional union: schemas are aligned by construction
    val unified = taggedLeft.union(taggedRight)

    val nLeft = leftFields.length
    val nRight = rightCols.length
    val outSchema = StructType(
      leftFields.map(_.copy(nullable = true)) ++ rightPayloadFields)

    val swept = unified
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_tag"))
      .mapPartitions { it =>
        var curKey: Any = null
        var lastRight: Array[Any] = null
        it.flatMap { row =>
          val k = row.get(0)
          if (k != curKey) { curKey = k; lastRight = null }
          if (row.getInt(2) == 0) { // right/state row
            lastRight = Array.tabulate(nRight)(i => row.get(3 + nLeft + i))
            None
          } else { // left/event row
            val out = new Array[Any](nLeft + nRight)
            var i = 0
            while (i < nLeft) { out(i) = row.get(3 + i); i += 1 }
            if (lastRight != null) {
              var j = 0
              while (j < nRight) { out(nLeft + j) = lastRight(j); j += 1 }
            }
            Some(Row.fromSeq(out.toSeq))
          }
        }
      }(Encoders.row(outSchema))
    swept.toDF()
  }
}
