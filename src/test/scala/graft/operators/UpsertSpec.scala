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

  test("snapshotDiff classifies insert/delete/update, omits unchanged") {
    import spark.implicits._
    val before = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v").repartition(3)
    val after = Seq(
      (1L, "a", 10.0),  // unchanged -> omitted
      (2L, "b", 21.0),  // update (payload differs)
      (4L, "D", 40.0),  // update (other payload col differs)
      (5L, "e", 50.0))  // insert; 3 deleted
      .toDF("k", "s", "v").repartition(2)
    val got = Upsert.snapshotDiff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "insert"))
    // one exchange, no join (the upsert plan discipline) — measured on
    // un-repartitioned inputs so the test's own exchanges don't count
    val p = Upsert.snapshotDiff(
        before.collect().toSeq.map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2)))
          .toDF("k", "s", "v"),
        after.collect().toSeq.map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2)))
          .toDF("k", "s", "v"),
        Seq("k"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), p)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p)
    intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(before, after.drop("v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(before.select("k"), after.select("k"), Seq("k"))
    }
  }

  test("applyChangeLog: max-seq wins, tombstones, resurrects, inserts") {
    import spark.implicits._
    val target = Seq(
      (1L, "a"), // untouched passthrough
      (2L, "b"), // updated at seq 1
      (3L, "c"), // updated seq 1, deleted seq 2 -> gone
      (4L, "d")) // deleted seq 1, re-upserted seq 2 -> resurrected
      .toDF("k", "v")
    val changes = Seq(
      (2L, "b2", "upsert", 1L),
      (3L, "c2", "upsert", 1L),
      (3L, "xx", "delete", 2L),
      (4L, "xx", "delete", 1L),
      (4L, "d2", "upsert", 2L),
      (5L, "e", "upsert", 1L)) // absent key -> insert
      .toDF("k", "v", "op", "seq")
    val got = Upsert.applyChangeLog(
        target.repartition(3), changes.repartition(2), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(
      (1L, "a"), (2L, "b2"), (4L, "d2"), (5L, "e")))
    // changelog collapses before the join: a second apply of the SAME
    // log is idempotent on the result
    val again = Upsert.applyChangeLog(
        Upsert.applyChangeLog(target, changes, Seq("k")),
        changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === got)
    intercept[IllegalArgumentException] {
      Upsert.applyChangeLog(target, changes, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Upsert.applyChangeLog(target, changes, Seq("missing"))
    }
  }

  test("applyChangeLog: a NULL op upserts ('anything else'), never silently deletes") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // op is null for key 1 (must upsert to a1) and for the absent key 3
    // (must insert) — under bare `=!=` three-valued logic both rows
    // would vanish instead
    val changes = Seq(
      (1L, "a1", Option.empty[String], 1L),
      (2L, "xx", Option("delete"), 1L),
      (3L, "c", Option.empty[String], 1L))
      .toDF("k", "v", "op", "seq")
    val got = Upsert.applyChangeLog(target, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a1"), (3L, "c")))
  }
}
