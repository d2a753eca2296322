package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ML feature-preparation operators: per-key rolling window features,
  * leave-one-out target encoding, and group-aware train/val/test
  * splitting — the tabular-feature hygiene steps between a curated
  * corpus and a trainer.
  *
  * Determinism devices are the repo's standard ones: windowed and
  * grouped sums go through DECIMAL (exact, order-independent), every
  * emitted float is either an exact pass-through or ONE double
  * division of exact quantities, and the split coin is the seeded-md5
  * hash (partition/retry/engine-invariant).
  */
object Features {

  /** Per-key rolling features over the event stream, in (`tsCol`,
    * `idCol`) order: previous value (lag 1), rolling row count, and
    * rolling mean over the last `n` rows (inclusive). The windowed sum
    * runs in DECIMAL(18,4) — exact under any frame evaluation order —
    * and the mean is one double division, so every feature is
    * bit-identical across engines.
    *
    * Scale shape: ONE hash exchange on the key + one per-key ordered
    * sort serves all three window features (a single Window spec);
    * per-row state is the n-row frame. Returns
    * (key, id, v_lag1, roll_n, roll_mean) ordered by (key, id). */
  def rollingFeatures(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"window must be >= 1 rows, got $n")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val wf = w.rowsBetween(-(n - 1), 0)
    df.select(col(keyCol), col(tsCol), col(idCol),
        col(valCol).cast("double").as("_graft_v"))
      .select(col(keyCol), col(idCol),
        lag(col("_graft_v"), 1).over(w).as("v_lag1"),
        count(lit(1)).over(wf).as("roll_n"),
        (sum(col("_graft_v").cast(DecimalType(18, 4))).over(wf)
          .cast("double") / count(lit(1)).over(wf)).as("roll_mean"))
      .orderBy(keyCol, idCol)
  }

  /** Leave-one-out target encoding: each row's category feature is the
    * mean target of the OTHER rows in its category,
    * (Σ_cat − xᵢ) / (n_cat − 1) — the standard leakage-free encoding
    * for high-cardinality categoricals; null when the row is alone in
    * its category. The category sum is an exact DECIMAL(18,4)
    * aggregate; the subtraction stays in DECIMAL and only the final
    * division touches doubles.
    *
    * Scale shape: the category table is one partial/final aggregate
    * (categories-sized, broadcast back onto the rows) — the row side
    * never shuffles. Returns (id, cat, loo) ordered by id. */
  def targetEncodeLoo(
      df: DataFrame,
      catCol: String,
      idCol: String,
      targetCol: String): DataFrame = {
    val rows = df.select(col(idCol), col(catCol),
      col(targetCol).cast("double").as("_graft_t"))
    val stats = rows.groupBy(col(catCol))
      .agg(sum(col("_graft_t").cast(DecimalType(18, 4))).as("_graft_s"),
        count(lit(1)).as("_graft_n"))
    rows.join(broadcast(stats), catCol)
      .select(col(idCol), col(catCol),
        when(col("_graft_n") === 1, lit(null).cast("double"))
          .otherwise(
            (col("_graft_s") - col("_graft_t").cast(DecimalType(18, 4)))
              .cast("double") / (col("_graft_n") - 1))
          .as("loo"))
      .orderBy(idCol)
  }

  /** Group-aware train/valid/test split: the seeded-md5 coin is
    * flipped on the GROUP key (e.g. the user), so every row of a group
    * lands in the same split — the leakage-hygiene property a per-row
    * split (q54's shape) cannot give when rows of one entity are
    * correlated. Buckets 0..`trainPct`-1 → train,
    * ..`trainPct`+`validPct`-1 → valid, rest → test (percent units of
    * 1/100). Adds a `split` column; pure map-side (the hash is
    * computed per row from the group key — no shuffle, no state). */
  def groupSplit(
      df: DataFrame,
      groupCol: String,
      seed: Long,
      trainPct: Int,
      validPct: Int): DataFrame = {
    require(trainPct >= 1 && validPct >= 0 && trainPct + validPct <= 100,
      s"bad split percentages ($trainPct, $validPct)")
    val bucket = conv(substring(
        md5(concat(lit(s"$seed-"), col(groupCol).cast("string"))), 1, 8),
      16, 10).cast("long") % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + validPct, lit("valid"))
        .otherwise(lit("test")))
  }
}
