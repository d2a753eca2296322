package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many keys (users) completed step 1,
  * then step 2 strictly after their step-1 time, then step 3 after
  * that, … — the conversion-funnel query every event pipeline runs.
  *
  * The textbook formulations either collect each key's full event
  * list (unbounded per-key state) or window-sort the whole log. This
  * one is a chain of filtered min-aggregates linked by equi-joins on
  * the key: per-stage state is ONE timestamp per key, every exchange
  * is an ordinary hash shuffle, and each stage's input shrinks to the
  * keys still in the funnel.
  */
object Funnel {

  /** Per-key completion times: one row per key that finished the whole
    * funnel prefix, with `_graft_t` = the time its LAST completed step
    * happened. Steps match `stepCol` values in `steps` order; each
    * step must occur strictly after the previous one's earliest valid
    * occurrence (the canonical earliest-chaining semantics — ties are
    * not progress). */
  private def stageFrames(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      stepCol: String,
      steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(!events.columns.contains("_graft_t"),
      "input must not already have a column named _graft_t (reserved)")
    var acc = List.empty[DataFrame]
    steps.zipWithIndex.foreach { case (st, i) =>
      val filtered = events.where(col(stepCol) === st)
      val cur =
        if (i == 0)
          filtered.groupBy(col(keyCol))
            .agg(min(col(tsCol)).as("_graft_t"))
        else
          filtered.join(acc.head, Seq(keyCol))
            .where(col(tsCol) > col("_graft_t"))
            .groupBy(col(keyCol))
            .agg(min(col(tsCol)).as("_graft_t"))
      acc = cur :: acc
    }
    acc.reverse
  }

  /** The funnel report: (step, step_name, n_keys) per step, n_keys
    * non-increasing by construction. One lazy plan; nothing is
    * collected per key. */
  def funnelCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      stepCol: String,
      steps: Seq[String]): DataFrame = {
    val frames = stageFrames(events, keyCol, tsCol, stepCol, steps)
    frames.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_keys"))
        .select(lit((i + 1).toLong).as("step"),
          lit(st).as("step_name"), col("n_keys"))
    }.reduce(_.unionAll(_)).orderBy("step")
  }

  /** Day-granularity retention cohorts — the other canonical event-
    * analytics matrix: users bucketed by first-seen day, counted on
    * each later day they were active. Output
    * `(cohort_day, offset_days, users)`.
    *
    * Scale posture: every exchange hashes on the user — first-touch
    * min, the (user, active-day) distinct (map-side partial), and the
    * cohort join are co-keyed, so one logical repartition serves all
    * three; the final matrix aggregate is days² rows. Because
    * (user, day) is distinct and a user has exactly one cohort day,
    * the matrix `count(*)` IS a distinct-user count — no
    * count-distinct state anywhere.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events
      .groupBy(col(userCol).as("user"))
      .agg(to_date(min(col(tsCol))).as("cohort_day"))
    events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
      .join(firstDay, "user")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long")
          .as("offset_days"))
      .groupBy("cohort_day", "offset_days")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_day", "offset_days")
  }
}
