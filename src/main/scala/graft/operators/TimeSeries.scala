package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series regularization: turn an irregular per-key observation
  * table into a dense, gap-free grid — the resample/ffill step every
  * training pipeline runs before feeding sequence models, and one
  * Spark has no built-in operator for.
  */
object TimeSeries {

  /** Densify `observed` (one row per (`keyCol`, `dateCol`)) onto each
    * key's full daily span [min(date), max(date)] and forward-fill the
    * columns in `ffillCols` across the introduced gap rows. All other
    * columns stay null on gap rows, so `col IS NULL` on any of them is
    * the gap test (the key's first day is always observed, so
    * forward-filled columns are never null).
    *
    * Scale shape: the span aggregate is a partial/final groupBy on the
    * key; the grid explode emits span-length rows per key (bounded by
    * the calendar, not the data); the grid⋈observed equi-join on
    * (key, date) and the per-key ordered window are ordinary hash
    * exchanges. Nothing is proportional to key-count² and no state
    * outlives one key's span, so the operator scales with Σ span — the
    * size of its own output.
    */
  def gapFillDaily(
      observed: DataFrame,
      keyCol: String,
      dateCol: String,
      ffillCols: Seq[String]): DataFrame = {
    require(ffillCols.nonEmpty, "ffillCols must name at least one column")
    val spans = observed.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("_graft_lo"), max(col(dateCol)).as("_graft_hi"))
    val grid = spans
      .select(col(keyCol), explode(
        sequence(col("_graft_lo"), col("_graft_hi"),
          expr("interval 1 day"))).as(dateCol))
    val joined = grid.join(observed, Seq(keyCol, dateCol), "left")
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ffillCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Per-key exponentially-weighted moving average over the event
    * stream — the online smoothing step behind rate/quality monitors:
    *
    *   ewma₀ = x₀,   ewmaₜ = round₉(α·xₜ + (1−α)·ewmaₜ₋₁)
    *
    * in (`tsCol`, `idCol`) order within each key (`idCol` makes the
    * order total when timestamps tie).
    *
    * Determinism device: the recurrence runs in EXACT decimal
    * arithmetic — inputs are quantized to 6 dp (lossless for any
    * ≤6-dp source data), α is interpreted at its shortest decimal
    * representation (so pick one that has a short one: 0.25, 0.1, …),
    * and every state is rounded HALF_UP to a 9-dp decimal. A 9-dp
    * decimal state that is a pure decimal function of the previous
    * one replays bit-for-bit in any engine with exact DECIMAL
    * arithmetic (the recursive-CTE oracle runs the same recurrence in
    * DECIMAL), with none of the double-rounding boundary hazards a
    * float recurrence has; the emitted double is the correctly-rounded
    * cast of the decimal state — identical everywhere.
    *
    * Scale posture: one hash exchange on the key (`groupByKey`), then
    * a compiled linear scan per key — the recurrence is inherently
    * sequential PER KEY, so one-key-per-task is the maximal
    * parallelism any engine can extract; per-task memory is one key's
    * events (the packSequences per-group bound). No window over the
    * corpus, no driver collect.
    *
    * Returns one row per event: (key, id, ewma) ordered by (key, id).
    */
  def ewma(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    val spark = events.sparkSession
    import spark.implicits._
    val a = java.math.BigDecimal.valueOf(alpha)
    val b = java.math.BigDecimal.ONE.subtract(a)
    events
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol).cast("timestamp")).as("us"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("v"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var prev: java.math.BigDecimal = null
        rows.iterator.map { r =>
          val x6 = java.math.BigDecimal.valueOf(r._4)
            .setScale(6, java.math.RoundingMode.HALF_UP)
          prev =
            if (prev == null) x6.setScale(9)
            else a.multiply(x6).add(b.multiply(prev))
              .setScale(9, java.math.RoundingMode.HALF_UP)
          (k, r._3, prev.doubleValue)
        }
      }
      .toDF(keyCol, idCol, "ewma")
      .orderBy(keyCol, idCol)
  }

  /** SCD2 construction: collapse a per-key change log into validity
    * intervals — one row per RUN of equal `attrCol` values, valid from
    * the run's first timestamp until the next run starts (null
    * `valid_to` = still current). The temporal-table build step behind
    * every as-of enrichment.
    *
    * Rows are ordered by (`tsCol`, `tieCols`...) within each key; pass
    * tie columns that make the ordering total or equal-timestamp rows
    * have engine-dependent run boundaries. Two windows on the same key
    * partitioning → one shuffle; per-key state is one row.
    */
  def changeIntervals(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    // row_number (not `prev IS NULL`) marks the first row, and the
    // null-safe <=> collapses null runs / keeps value↔null transitions
    // — a nullable attribute is an ordinary SCD2 state here
    df.withColumn("_graft_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_graft_rn", row_number().over(w))
      .where(col("_graft_rn") === 1 ||
        !(col("_graft_prev") <=> col(attrCol)))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"))
  }

  /** Batch sessionization: split each key's event stream into sessions
    * at inactivity gaps strictly longer than `gapSeconds`, and emit one
    * row per session — the offline counterpart of the streaming
    * session-window operator (same gap semantics), for backfills and
    * training-feature builds over historical logs.
    *
    * Ordering within a key is (`tsCol`, `tieCol`) so equal-timestamp
    * events have a total order and the session boundaries are
    * engine-independent. Output: key, session_start, session_end,
    * n_events, duration_sec — all exact (counts and timestamp
    * arithmetic; no float accumulation).
    *
    * Scale shape: ONE hash exchange on the key — the boundary-marking
    * window, the running session counter, and the per-session
    * aggregate all share the key partitioning (the groupBy keys are a
    * superset of the partition key, so EnsureRequirements inserts no
    * second shuffle). Per-key state is one sort; session count never
    * materializes corpus-wide.
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    val newSess = when(prevUs.isNull ||
      unix_micros(col(tsCol)) - prevUs > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("_graft_sess", sum(newSess).over(run))
      .groupBy(col(keyCol), col("_graft_sess"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"),
        // long/long `/` is double division in Spark; the quotient is
        // ≥1e-6 from any integer unless exact, so floor-via-cast is
        // the true integer floor
        ((unix_micros(col("session_end")) -
          unix_micros(col("session_start"))) / lit(1000000L))
          .cast("long").as("duration_sec"))
  }

  /** [[sessionize]]'s declarative twin on Spark's built-in
    * `session_window` — same output contract (key, session_start,
    * session_end, n_events, duration_sec), same inclusive-gap
    * semantics, chosen over the window+running-sum form when the
    * downstream plan benefits from a plain aggregate (no analytic
    * windows for Catalyst to fence optimizations around).
    *
    * Boundary parity: Spark's session merge is INCLUSIVE — an event
    * whose time equals the open session's end (previous event + gap)
    * still merges (`UpdatingSessionsIterator` keeps a session alive
    * while `start <= latestEnd`), which is exactly [[sessionize]]'s
    * split-only-strictly-past-the-gap rule (t2 − t1 <= gap stays
    * together). So the native gap is `gapSeconds` verbatim and the two
    * operators are equal row-for-row, not just approximately
    * (TimeSeriesSpec proves it on the exact gap edge, ±1 µs).
    *
    * Scale shape: one hash exchange on the key; Spark sorts each
    * partition by (key, start) and merges sessions in a single pass
    * (UpdatingSessions + partial/final session aggregate) — per-key
    * state is one open session, same as the streaming form.
    */
  def sessionizeNative(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    events
      .groupBy(col(keyCol),
        session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"),
        ((unix_micros(col("session_end")) -
          unix_micros(col("session_start"))) / lit(1000000L))
          .cast("long").as("duration_sec"))
  }

  /** Day-of-week seasonal decomposition of a value stream: daily
    * totals (exact DECIMAL sums), the ISO-dow seasonal profile (mean
    * of the dailies sharing the weekday — one exact-sum double
    * division), and the per-day residual total − profile. The
    * seasonality-vs-anomaly split a metrics pipeline runs before
    * alerting on raw dailies (a quiet Sunday is not a drop).
    * Exactness: totals are DECIMAL(18,4) sums (≤4-dp inputs exact),
    * every double is a fixed expression of those sums — no rounding
    * device needed. The profile is ≤7 rows — broadcast back, so the
    * daily table never reshuffles. Returns
    * (date, daily_total, dow, dow_mean, residual) ordered by date. */
  def seasonalDowProfile(
      df: DataFrame, tsCol: String, valCol: String): DataFrame = {
    val daily = df
      .groupBy(to_date(col(tsCol)).as("date"))
      .agg(sum(col(valCol).cast(DecimalType(18, 4))).as("dt"))
      .select(col("date"), (weekday(col("date")) + 1).as("dow"),
        col("dt"))
    val prof = daily.groupBy("dow")
      .agg((sum("dt").cast("double") / count(lit(1))).as("dow_mean"))
    daily.join(broadcast(prof), "dow")
      .select(col("date"), col("dt").cast("double").as("daily_total"),
        col("dow"), col("dow_mean"),
        (col("dt").cast("double") - col("dow_mean")).as("residual"))
      .orderBy("date")
  }
}
