package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("funnelCounts chains steps strictly in order") {
    import spark.implicits._
    val log = Seq(
      // user 1 completes the whole funnel in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: click BEFORE view → stalls after view
      (2L, ts(2), "click"), (2L, ts(3), "view"),
      // user 3: view and click at the SAME instant → ties are not
      // progress; stalls after view
      (3L, ts(5), "view"), (3L, ts(5), "click"),
      // user 4: purchase without click → stalls after view
      (4L, ts(1), "view"), (4L, ts(2), "purchase"),
      // user 5: never views → never enters
      (5L, ts(1), "click"), (5L, ts(2), "purchase"),
      // user 6: earliest view chains through a LATER click; the
      // pre-view click is ignored
      (6L, ts(1), "click"), (6L, ts(2), "view"), (6L, ts(3), "click"),
      (6L, ts(4), "purchase"))
      .toDF("user_id", "t", "step")

    val got = Funnel
      .funnelCounts(log, "user_id", "t", "step",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got === Seq(
      (1L, "view", 5L), (2L, "click", 2L), (3L, "purchase", 2L)))
  }

  test("funnelCounts emits zero rows for unreached steps and rejects empty funnels") {
    import spark.implicits._
    val log = Seq((1L, ts(1), "view")).toDF("user_id", "t", "step")
    val got = Funnel
      .funnelCounts(log, "user_id", "t", "step", Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("view", 1L), ("click", 0L)))
    intercept[IllegalArgumentException] {
      Funnel.funnelCounts(log, "user_id", "t", "step", Seq.empty)
    }
  }

  test("retentionCohorts builds the hand-computed cohort matrix") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 23:59:59")), // same active day, counts once
      (1L, ts("2024-01-03 04:00:00")),
      (2L, ts("2024-01-01 01:00:00")),
      (2L, ts("2024-01-02 12:00:00")),
      (3L, ts("2024-01-03 08:00:00"))
    ).toDF("user_id", "t").repartition(3)
    val got = Funnel.retentionCohorts(events, "user_id", "t")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L), // users 1 and 2 on their first day
      ("2024-01-01", 1L, 1L), // user 2 back on day 1
      ("2024-01-01", 2L, 1L), // user 1 back on day 2
      ("2024-01-03", 0L, 1L))) // user 3's cohort
  }
}
