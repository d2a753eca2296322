package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode

class UpsertSpec extends SparkSpec {

  test("upsert: source wins on match, inserts unmatched, keeps rest") {
    import spark.implicits._
    val target = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val source = Seq(
      (2L, "B", 99.0),  // update
      (4L, "d", 40.0))  // insert
      .toDF("k", "s", "v")
    val got = Upsert.upsert(target, source, Seq("k"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got === Array(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert: composite key and column order preserved") {
    import spark.implicits._
    val target = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val source = Seq((1L, "y", 9.0), (2L, "y", 5.0)).toDF("k1", "k2", "v")
    val merged = Upsert.upsert(target, source, Seq("k1", "k2"))
    assert(merged.columns.toSeq === Seq("k1", "k2", "v"))
    val got = merged.orderBy("k1", "k2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got === Array((1L, "x", 1.0), (1L, "y", 9.0), (2L, "y", 5.0)))
  }

  test("upsert rejects missing key columns") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(df, df, Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("upsert rejects the reserved tag column name") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("k", "_graft_prio")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(df, df, Seq("k"))
    }
    assert(e.getMessage.contains("_graft_prio"))
  }

  test("upsert plans one shuffle with partial min_by aggregation") {
    import spark.implicits._
    val target = Seq((1L, 1.0)).toDF("k", "v")
    val source = Seq((2L, 2.0)).toDF("k", "v")
    val p = Upsert.upsert(target, source, Seq("k"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges == 1, p)
    // partial + final pair around the single exchange (struct payload
    // makes min_by plan as SortAggregate, not HashAggregate)
    assert("""\(\d+\) \w*Aggregate""".r.findAllIn(p).size >= 2, p)
  }
}
