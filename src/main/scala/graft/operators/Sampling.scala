package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded weighted sampling — the dataset-mixing primitive (sample
  * documents proportional to a quality/length weight when composing a
  * training mix). */
object Sampling {

  /** Assign contiguous 0-based sequential ids in the total order of
    * `orderCol` WITHOUT the single-task global window (`row_number()
    * OVER (ORDER BY …)` funnels every row through one partition — the
    * q72 straggler trap applied to ids): range-repartition + sort on
    * the order key, `localCheckpoint` to PIN the partitioning (the
    * range sampler may draw different boundaries on a recompute, and
    * the per-partition counts below must describe the exact partitions
    * the window later runs on), count rows per partition (P-row driver
    * payload), broadcast the cumulative offsets back, and add a
    * PER-PARTITION row_number — every stage parallel at any scale.
    * The final ids depend only on the total order, not on where the
    * sampled boundaries fall.
    *
    * `orderCol` must be unique (e.g. the q89 seeded-md5 key) — with
    * ties the order, and so the ids, would be partition-dependent.
    * This is the "stable sample index" primitive: shuffle a corpus
    * once, then address examples by id forever. */
  def sequentialIds(
      df: DataFrame,
      orderCol: Column,
      outCol: String): DataFrame = {
    require(!df.columns.contains("_graft_pid"),
      "column name _graft_pid is reserved by sequentialIds")
    val spark = df.sparkSession
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val sorted = df
      .withColumn("_graft_ord", orderCol)
      .repartitionByRange(p, col("_graft_ord"))
      .sortWithinPartitions("_graft_ord")
      .withColumn("_graft_pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val counts = sorted.groupBy("_graft_pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0 -> 0L) {
      case ((_, acc), (pid, n)) => pid -> (acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = offsets.toSeq.toDF("_graft_pid", "_graft_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_graft_pid").orderBy("_graft_ord")
    sorted.join(broadcast(offDf), "_graft_pid")
      .withColumn(outCol,
        col("_graft_off") + row_number().over(w).cast("long") - 1L)
      .drop("_graft_pid", "_graft_off", "_graft_ord")
  }

  /** Seeded uniform NEGATIVE sampling — the contrastive-training
    * primitive (k random non-self partners per row, e.g. in-batch
    * negatives for embedding training), without a cross join: rows
    * get a dense 0..n−1 index from [[sequentialIds]] (in seeded-md5
    * order, so the index itself is stable), each row draws k
    * candidate indices from a second seeded md5 (48 uniform bits mod
    * n; self-draws remap to the next index), and ONE ordinary hash
    * equi-join on the dense index resolves them back to ids. The
    * shuffle carries (index, draw) longs — ×k of the row count, never
    * n². Bit-reproducible under any partitioning/retry/engine (the
    * q89 device twice); the mod-n bias is ≤ n/2⁴⁸, irrelevant for
    * training negatives.
    *
    * Returns (`idCol`, neg_idx 0..k−1, neg_`idCol`) ordered by
    * (`idCol`, neg_idx). */
  def negativeSamples(
      df: DataFrame,
      idCol: String,
      k: Int,
      orderSeed: Long,
      negSeed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ids = sequentialIds(df.select(col(idCol)),
      md5(concat(lit(s"$orderSeed-"), col(idCol).cast("string"))), "sid")
    val n = ids.count()
    require(n >= 2, s"need at least 2 rows to draw negatives, got $n")
    val draw = conv(substring(md5(concat(lit(s"$negSeed-"),
        col("sid").cast("string"), lit("-"),
        col("neg_idx").cast("string"))), 1, 12), 16, 10)
      .cast("long") % n
    val cand = ids.select(col(idCol), col("sid"),
        explode(sequence(lit(0), lit(k - 1))).as("neg_idx"))
      .withColumn("neg0", draw)
      .withColumn("nsid",
        when(col("neg0") === col("sid"), (col("neg0") + 1L) % n)
          .otherwise(col("neg0")))
    cand
      .join(ids.select(col("sid").as("nsid"),
        col(idCol).as(s"neg_$idCol")), "nsid")
      .select(col(idCol), col("neg_idx"), col(s"neg_$idCol"))
      .orderBy(idCol, "neg_idx")
  }

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

  /** Per-group [[weightedSample]]: the same seeded A-ES key, but the
    * top-k taken WITHIN each `groupCol` value — the stratified form
    * (k docs per source/language at importance weights) a mixing
    * pipeline actually ships. Same determinism contract (pure
    * seeded-md5 key, partition/retry-invariant); the per-group fill
    * uses the bounded [[TopK]] aggregator on the NEGATED key, so the
    * exchange carries ≤ partitions·k rows per group — never a
    * corpus-wide window sort (the temperatureMix scale posture).
    * Returns (`groupCol`, `idCol`, skey) ordered by
    * (group, skey desc, id). */
  def stratifiedWeightedSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weight: Column,
      k: Int,
      seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(
        md5(concat(lit(s"$seed-"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(math.pow(2.0, 60))
    val key = round(log(u), 9) / weight.cast("double")
    df.select(col(groupCol), col(idCol).cast("long").as("_gid"),
        weight.cast("double").as("weight"), key.as("skey"))
      .where(col("weight") > 0.0)
      .groupBy(groupCol)
      .agg(TopK.smallestK(k)(-col("skey"), col("_gid")).as("kept"))
      .select(col(groupCol), posexplode(col("kept")).as(Seq("pos", "e")))
      .select(col(groupCol), col("e.id").as(idCol),
        (-col("e.ord")).as("skey"))
      .orderBy(col(groupCol), desc("skey"), col(idCol))
  }

  /** Temperature-scaled source mixing — the multilingual/multi-source
    * flattening device: source `s` with `n_s` rows gets quota
    * `round(k · n_s^α / Σ n_s^α)` (α < 1 up-samples small sources;
    * α = 0.5 here, so the weight is one CORRECTLY-ROUNDED `sqrt` —
    * bit-identical in any IEEE engine, unlike a general `pow`), and
    * its quota is filled in seeded-hash order (reproducible under
    * re-runs, retries, and any partitioning).
    *
    * Scale posture: per-source sizes are one aggregate (source
    * cardinality is a mixing config, not data-sized — the quota map is
    * driver-side and broadcast back as a literal map); the per-source
    * fill uses the bounded [[TopK]] aggregator, so the exchange
    * carries ≤ partitions·maxQuota rows per source instead of a
    * corpus-wide window sort.
    *
    * Determinism: weights are `sqrt` rounded to 12 dp and summed as
    * exact DECIMAL; each quota is `floor(k·w/t + 0.5)` on one
    * fixed-association double tree; `ord` draws 32 seeded-hash bits
    * (< 2^53, so its double round-trips exactly to long).
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      srcCol: String,
      k: Int,
      seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val ns: Seq[(String, Long)] = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("ns"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      .sortBy(_._1)
    val ws: Seq[(String, BigDecimal)] = ns.map { case (s, n) =>
      s -> BigDecimal(math.sqrt(n.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val t = ws.map(_._2).sum.toDouble // exact DECIMAL sum -> one double
    val quota: Map[String, Int] = ws.map { case (s, wr) =>
      s -> math.floor(k * wr.toDouble / t + 0.5).toInt
    }.toMap
    val maxQ = quota.values.max
    val ord = conv(substring(
        md5(concat(lit(s"$seed-"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long").cast("double")
    val quotaCol = element_at(
      map(quota.toSeq.sortBy(_._1)
        .flatMap { case (s, q) => Seq(lit(s), lit(q)) }: _*),
      col("source"))
    df.select(col(srcCol).as("source"), col(idCol), ord.as("ord"))
      .groupBy("source")
      .agg(TopK.smallestK(maxQ)(col("ord"), col(idCol)).as("kept"))
      .select(col("source"), posexplode(col("kept")).as(Seq("pos", "e")))
      .where(col("pos") < quotaCol)
      .select(col("source"), col("e.id").as(idCol),
        col("e.ord").cast("long").as("ord"))
      .orderBy("source", "ord", idCol)
  }
}
