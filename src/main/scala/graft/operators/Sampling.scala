package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded weighted sampling — the dataset-mixing primitive (sample
  * documents proportional to a quality/length weight when composing a
  * training mix). */
object Sampling {

  /** Weighted sample of `k` rows without replacement
    * (Efraimidis–Spirakis A-ES): each row draws `u ∈ (0,1]` from a
    * seeded md5 of its id and scores `key = ln(u)/w`; the k largest
    * keys are distributed exactly as sequential weighted draws without
    * replacement.
    *
    * Scale posture: the key is a pure narrow codegen'd expression
    * (md5 + hex-parse + one ln, the q89 seeded-hash device — no RNG
    * state to ship, bit-reproducible under any partitioning/retry);
    * the top-k plans as `TakeOrderedAndProject` (per-partition heaps,
    * never a global sort).
    *
    * Determinism: u has 60 uniform bits; `ln` is the one libm call
    * (cross-engine parity established by the q92 BM25 idf) and is
    * rounded to 9 dp BEFORE the division — `ln(u) ∈ [-42, 0]` keeps
    * full resolution at 9 dp, and the subsequent exact IEEE division
    * preserves it for any weight magnitude (rounding the quotient
    * instead would quantize all keys to ~0 once weights reach ~1e6).
    * Ties break on the id.
    *
    * Rows with non-positive weights are excluded — A-ES is defined
    * for w > 0 (w = 0 would yield key −∞, w < 0 a key that outranks
    * every valid row).
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(
        md5(concat(lit(s"$seed-"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(math.pow(2.0, 60))
    val key = round(log(u), 9) / weight.cast("double")
    df.select(col(idCol), weight.cast("double").as("weight"),
        key.as("skey"))
      .where(col("weight") > 0.0)
      .orderBy(desc("skey"), col(idCol))
      .limit(k)
  }
}
