package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join helpers for skew that the optimizer can't fix on its own.
  *
  * AQE's skew-join splitting (on by default) handles most sort-merge
  * skew at runtime; explicit salting is for the cases it can't touch —
  * a shuffle keyed on a hot key feeding an aggregation, or a
  * broadcast-ineligible dimension with a few pathological keys.
  */
object Joins {

  /** Skew-resistant equi-join of a large, skewed `left` against a
    * `right` too big to broadcast whole: `left` rows get a
    * deterministic salt in [0, saltFactor) (hash of the whole row, so
    * retries salt identically), `right` is replicated saltFactor times,
    * and the join key becomes (key, salt) — one hot key spreads over
    * saltFactor tasks instead of one straggler.
    *
    * Cost: right side shuffles saltFactor×. Use the smallest
    * saltFactor that flattens the stragglers.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedL = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor))
        .cast("int"))
    val replicatedR = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedL.join(replicatedR, Seq(key, "_salt")).drop("_salt")
  }
}
