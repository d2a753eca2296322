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

  /** [[saltedJoin]] that pays the replication price only where it
    * helps: keys whose left-side row count exceeds `hotThreshold` are
    * salted ×`saltFactor`; the long tail joins unsalted (salt 0, one
    * right copy). Output is identical to the plain join; the extra
    * shuffle volume is `(saltFactor − 1) × |right rows on hot keys|`
    * instead of `(saltFactor − 1) × |right|`.
    *
    * The hot-key set is found with an exact count aggregation over the
    * left keys — cheap next to the join it protects (8-byte keys,
    * map-side partial counts) and broadcast to both sides, so it must
    * stay driver-small: pick `hotThreshold` so only genuine stragglers
    * qualify (at 100 TB a few dozen keys; a skew so diffuse that
    * millions of keys are "hot" is not salting's problem). */
  def saltedJoinHotKeys(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int,
      hotThreshold: Long): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(hotThreshold > 0, "hotThreshold must be positive")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("_graft_n"))
      .where(col("_graft_n") > hotThreshold)
      .select(col(key), lit(true).as("_hot"))
    val saltedL = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt",
        when(col("_hot"),
          pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor)))
          .otherwise(lit(0)).cast("int"))
      .drop("_hot")
    val replicatedR = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt",
        explode(when(col("_hot"), sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("_hot")
    saltedL.join(replicatedR, Seq(key, "_salt")).drop("_salt")
  }
}
