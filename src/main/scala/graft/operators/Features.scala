package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Hashing-trick featurizer (Weinberger et al. 2009): each
    * categorical column's value is hashed to one of `dim` buckets with
    * a ±1 sign bit, and the row's feature vector is the signed bucket
    * count — the fixed-width encoding for unbounded-vocabulary
    * categoricals (no fitted dictionary, no vocabulary shuffle, new
    * values at inference hash consistently). The sign bit keeps inner
    * products unbiased under collisions.
    *
    * Both hashes ride the repo's seeded-md5 device (bucket = first 8
    * hex chars mod `dim`, sign = 9th hex digit's parity), namespaced
    * by column name — so the encoding is partition/retry/engine-
    * invariant and SQL-replayable. A null value contributes nothing.
    *
    * Scale shape: pure per-row codegen'd expressions (dim × |cols|
    * CASE terms), zero shuffle, zero state. Returns
    * (`idCol`, h0..h{dim-1}) with LONG counts. */
  def hashFeatures(
      df: DataFrame,
      idCol: String,
      featureCols: Seq[String],
      dim: Int,
      seed: Long): DataFrame = {
    require(dim >= 2 && dim <= 1024, s"dim must be in [2, 1024], got $dim")
    require(featureCols.nonEmpty, "need at least one feature column")
    def h(c: String): Column =
      md5(concat(lit(s"$seed-$c="), col(c).cast("string")))
    def bucket(c: String): Column =
      conv(substring(h(c), 1, 8), 16, 10).cast("long") % dim
    def sign(c: String): Column =
      when(conv(substring(h(c), 9, 1), 16, 10).cast("long") % 2 === 0,
        lit(1L)).otherwise(lit(-1L))
    val hs = (0 until dim).map { i =>
      featureCols.map(c =>
          when(bucket(c) === i, sign(c)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"h$i")
    }
    df.select(col(idCol) +: hs: _*)
  }

  /** Fit per-column scaling statistics in ONE partial/final aggregate
    * pass and persist them as a one-row-per-column parquet artifact at
    * `path` — the fit half of the fit/transform split every trainer
    * needs (fit on train, apply everywhere), and the persisted-model
    * shape of the PQ/IVF/graph artifacts applied to feature prep.
    * Stats: exact min/max, count, and the q135 exact-variance sums
    * (Σx as DECIMAL(18,4), Σx² as DECIMAL(28,8) — lossless for 2-dp
    * inputs), so mean/stddev derived downstream are fixed-order double
    * expressions of exact quantities. */
  def fitScaler(df: DataFrame, cols: Seq[String], path: String): Unit = {
    require(cols.nonEmpty, "need at least one column to fit")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__mn"),
      max(col(c).cast("double")).as(s"${c}__mx"),
      count(col(c)).as(s"${c}__n"),
      sum(col(c).cast(DecimalType(18, 4))).cast("double").as(s"${c}__s"),
      sum((col(c) * col(c)).cast(DecimalType(28, 8))).cast("double")
        .as(s"${c}__ssq")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    cols.map(c => one.select(lit(c).as("column"),
        col(s"${c}__mn").as("mn"), col(s"${c}__mx").as("mx"),
        col(s"${c}__n").as("n"), col(s"${c}__s").as("s"),
        col(s"${c}__ssq").as("ssq")))
      .reduce(_.unionByName(_))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Apply a persisted scaler artifact: for every fitted column, add
    * `<col>_minmax` ((x−min)/(max−min)) and `<col>_z` ((x−mean)/sd,
    * sample sd from the exact sums). The artifact is one row per
    * column — collected (bounded by the fitted-column count) and baked
    * into codegen'd literal expressions, so the transform is a pure
    * map: no join, no shuffle, the scan side never moves. A constant
    * column yields null `_minmax` (min = max) and null `_z` (sd = 0)
    * rather than ±Inf/NaN. */
  def applyScaler(df: DataFrame, path: String): DataFrame = {
    val stats = df.sparkSession.read.parquet(path)
      .select("column", "mn", "mx", "n", "s", "ssq").collect()
    require(stats.nonEmpty, s"no scaler artifact at $path")
    stats.foldLeft(df) { (d, r) =>
      val (c, mn, mx) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val (n, s, ssq) = (r.getLong(3), r.getDouble(4), r.getDouble(5))
      val mean = s / n
      val sd = math.sqrt((ssq - s * s / n) / (n - 1))
      d.withColumn(s"${c}_minmax",
          if (mn == mx) lit(null).cast("double")
          else (col(c) - mn) / (mx - mn))
        .withColumn(s"${c}_z",
          if (sd == 0.0 || sd.isNaN) lit(null).cast("double")
          else (col(c) - mean) / sd)
    }
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
