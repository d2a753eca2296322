package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-quality profiling: the null-rate / cardinality audit every
  * ingestion pipeline runs before trusting a new data drop.
  */
object ColumnProfile {

  /** One aggregation pass over `df` producing a row per profiled
    * column: `(col_name, n_nulls, n_distinct)`. Null counts and EXACT
    * distinct counts ride the same partial/final aggregate (Catalyst
    * plans the multi-distinct via Expand — one scan, rows ×|cols|);
    * at 100 TB swap `count_distinct` for `approx_count_distinct` and
    * the Expand disappears with ~2% error.
    *
    * The driver only ever sees one row of counters; the long-form
    * explode happens on that single row.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"profile columns must be unique, got $cols")
    val aggs = cols.flatMap { c =>
      Seq(
        // count(when...) not sum(when...): count is 0 (not NULL) on an
        // empty input, so the profile of an empty table is all zeros.
        count(when(col(c).isNull, lit(1))).as(s"__n_$c"),
        count_distinct(col(c)).as(s"__d_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_nulls"),
        col(s"__d_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }

  // ------------------------------------------------- expectation gate

  /** A declarative data expectation: `label` names the rule in the
    * report, `violations` is the aggregate counting the rows that
    * break it. Value rules (range/set/pattern) judge NON-NULL values
    * only — pair them with [[NotNull]] to also forbid nulls, so each
    * rule reports one failure mode. */
  sealed trait Expectation {
    def label: String
    private[operators] def violations: Column
  }
  /** `col` must never be null. */
  final case class NotNull(c: String) extends Expectation {
    val label = s"not_null($c)"
    private[operators] def violations = count(when(col(c).isNull, lit(1)))
  }
  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(c: String, lo: Double, hi: Double)
      extends Expectation {
    val label = s"in_range($c, $lo, $hi)"
    private[operators] def violations =
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), lit(1)))
  }
  /** Non-null values of `col` must be one of `values`. */
  final case class InSet(c: String, values: Seq[String])
      extends Expectation {
    val label = s"in_set($c, ${values.mkString("|")})"
    private[operators] def violations =
      count(when(col(c).isNotNull && !col(c).isin(values: _*), lit(1)))
  }
  /** Non-null values of `col` must match the regex. */
  final case class MatchesRe(c: String, re: String) extends Expectation {
    val label = s"matches($c)"
    private[operators] def violations =
      count(when(col(c).isNotNull && !col(c).rlike(re), lit(1)))
  }
  /** The column tuple must be unique across the table (violations =
    * surplus rows beyond one per distinct tuple). The only rule that
    * expands the aggregate (exact multi-distinct); uniqueness is the
    * one expectation an approximate sketch cannot certify. */
  final case class Unique(cs: Seq[String]) extends Expectation {
    val label = s"unique(${cs.mkString(",")})"
    private[operators] def violations =
      count(lit(1)) - count_distinct(struct(cs.map(col): _*))
  }

  /** Evaluate an expectation suite in ONE aggregation pass (the
    * Great-Expectations-style contract gate an ingest pipeline runs
    * before promoting a data drop): every rule is a conditional-count
    * aggregate over the same scan — partial/final, no joins, the
    * driver sees one counter row — and the report is the long-form
    * explode of that row, one `(rule, n_violations, pass)` line per
    * expectation, ordered by rule. */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "need at least one expectation")
    require(rules.map(_.label).distinct.size == rules.size,
      "duplicate expectation labels")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      r.violations.cast("long").as(s"__v$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.label).as("rule"),
          col(s"__v$i").as("n_violations"),
          (col(s"__v$i") === 0L).cast("int").as("pass"))
      }: _*)).as("e"))
      .select("e.*")
      .orderBy("rule")
  }
}
