package graft.operators

import org.apache.spark.sql.DataFrame
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
}
