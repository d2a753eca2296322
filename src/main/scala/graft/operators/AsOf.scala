package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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
  *   1. deterministically reduce the right side to one row per
  *      (key, time) — ties take the greatest payload struct, so input
  *      order can never change the answer;
  *   2. tag left/right rows and union them — one schema, one pass;
  *   3. `repartition` by key (the ONLY shuffle) and
  *      `sortWithinPartitions(key, time, tag)` — Spark's external sort,
  *      spill-safe at any partition size;
  *   4. one `mapPartitions` sweep carrying the latest right payload per
  *      key (right rows sort before left rows at equal time, so a tie
  *      means "state as of exactly t" is visible to the event at t).
  *
  * Internal column names are generated to be collision-free against
  * both inputs' schemas.
  *
  * Cost at scale: one shuffle of left+right keyed rows, a per-partition
  * sort, O(1) state per key in the sweep. No broadcast, no n² ranges.
  * A single hot key serializes into one partition; `saltBuckets > 1`
  * splits each key's LEFT rows across that many sub-partitions and
  * replicates the key's RIGHT rows to each (right side ×S cost), which
  * bounds per-task skew at the price of duplicated state rows.
  */
object AsOf {

  /** @param rightCols   right-side payload columns to attach (nulled when
    *                    no right row precedes the left row).
    * @param saltBuckets >1 enables skew salting: left rows scatter
    *                    across S sub-keys (deterministic row-content
    *                    hash), right rows replicate to all S. */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      saltBuckets: Int = 1): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val leftFields = left.schema.fields.toSeq
    val rightPayloadFields =
      rightCols.map(c => right.schema(c).copy(nullable = true))

    // internal names that cannot collide with either input's columns
    val used = (left.columns ++ right.columns).toSet
    def fresh(base: String): String = {
      var n = base
      while (used(n)) n = "_" + n
      n
    }
    val kC = fresh("_k"); val tC = fresh("_t")
    val tagC = fresh("_tag"); val saltC = fresh("_salt")

    // 1. deterministic right side: one row per (key, time) — among ties
    // the greatest payload struct wins (orderable payload types; the
    // operator's contract documents right-side (key, time) uniqueness,
    // this reduction makes violations deterministic instead of
    // order-dependent).
    val pC = fresh("_p")
    val rightUnique = right
      .groupBy(col(rightKey), col(rightTime))
      .agg(max(struct(rightCols.map(col): _*)).as(pC))
      .select(col(rightKey) +: col(rightTime) +:
        rightCols.map(c => col(pC).getField(c).as(c)): _*)

    // 2. unified row: key, time, tag (0 = right/state, 1 = left/event),
    // salt, left payload (nulls on right rows), right payload (nulls on
    // left); NullType literals widen at union analysis.
    val nullRight = rightCols.map(_ => lit(null))
    val leftSalt =
      if (saltBuckets == 1) lit(0)
      else pmod(xxhash64(leftFields.map(f => col(f.name)): _*),
        lit(saltBuckets.toLong)).cast("int")
    val taggedLeft = left.select(
      (Seq(col(leftKey).as(kC), col(leftTime).as(tC), lit(1).as(tagC),
        leftSalt.as(saltC)) ++
        leftFields.map(f => col(f.name)) ++ nullRight): _*)
    val nullLeft = leftFields.map(_ => lit(null))
    // salt column: 0 when unsalted, else one replica per bucket (explode
    // inline in the select so the positional union layout is preserved)
    val rightSalt: Column =
      if (saltBuckets == 1) lit(0)
      else explode(sequence(lit(0), lit(saltBuckets - 1)))
    val taggedRight = rightUnique.select(
      (Seq(col(rightKey).as(kC), col(rightTime).as(tC), lit(0).as(tagC),
        rightSalt.as(saltC)) ++
        nullLeft ++ rightCols.map(col)): _*)
    // positional union: schemas are aligned by construction
    val unified = taggedLeft.union(taggedRight)

    val nLeft = leftFields.length
    val nRight = rightCols.length
    val outSchema = StructType(
      leftFields.map(_.copy(nullable = true)) ++ rightPayloadFields)

    val swept = unified
      .repartition(col(kC), col(saltC))
      .sortWithinPartitions(col(kC), col(saltC), col(tC), col(tagC))
      .mapPartitions { it =>
        var curKey: Any = null
        var curSalt: Int = Int.MinValue
        var lastRight: Array[Any] = null
        it.flatMap { row =>
          val k = row.get(0)
          val s = row.getInt(3)
          if (k != curKey || s != curSalt) {
            curKey = k; curSalt = s; lastRight = null
          }
          if (row.getInt(2) == 0) { // right/state row
            lastRight = Array.tabulate(nRight)(i => row.get(4 + nLeft + i))
            None
          } else { // left/event row
            val out = new Array[Any](nLeft + nRight)
            var i = 0
            while (i < nLeft) { out(i) = row.get(4 + i); i += 1 }
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
