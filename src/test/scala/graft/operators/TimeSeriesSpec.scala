package graft.operators

import graft.SparkSpec
import java.sql.Date

class TimeSeriesSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("gapFillDaily densifies each key's span and forward-fills across runs of gaps") {
    import spark.implicits._
    // key 1: observed days 1,2,5 → gaps 3,4 carry day-2's gauge;
    // key 2: single observed day → no gaps; key 3: gap then a new
    // observation resets the carried value for later gaps
    val observed = Seq(
      (1L, d("2024-01-01"), 3L, "a"),
      (1L, d("2024-01-02"), 1L, "b"),
      (1L, d("2024-01-05"), 2L, "c"),
      (2L, d("2024-03-10"), 9L, "z"),
      (3L, d("2024-02-01"), 1L, "p"),
      (3L, d("2024-02-03"), 1L, "q"),
      (3L, d("2024-02-05"), 1L, "q"))
      .toDF("k", "day", "n", "gauge")

    val filled = TimeSeries.gapFillDaily(observed, "k", "day", Seq("gauge"))
      .orderBy("k", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3)))
      .toSeq

    assert(filled === Seq(
      (1L, "2024-01-01", 3L, "a"),
      (1L, "2024-01-02", 1L, "b"),
      (1L, "2024-01-03", -1L, "b"),
      (1L, "2024-01-04", -1L, "b"),
      (1L, "2024-01-05", 2L, "c"),
      (2L, "2024-03-10", 9L, "z"),
      (3L, "2024-02-01", 1L, "p"),
      (3L, "2024-02-02", -1L, "p"),
      (3L, "2024-02-03", 1L, "q"),
      (3L, "2024-02-04", -1L, "q"),
      (3L, "2024-02-05", 1L, "q")))
  }

  test("changeIntervals collapses runs and chains validity, ties broken by tie columns") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val log = Seq(
      // key 1: a,a,b,a → 3 intervals; the middle 'a' run has 2 rows
      (1L, ts("2024-01-01 00:00:00"), 10L, "a"),
      (1L, ts("2024-01-01 01:00:00"), 11L, "a"),
      (1L, ts("2024-01-01 02:00:00"), 12L, "b"),
      (1L, ts("2024-01-01 03:00:00"), 13L, "a"),
      // key 2: single row → one open interval
      (2L, ts("2024-02-01 00:00:00"), 20L, "x"),
      // key 3: equal timestamps — event_id order decides the runs
      (3L, ts("2024-03-01 00:00:00"), 31L, "p"),
      (3L, ts("2024-03-01 00:00:00"), 30L, "q"),
      // key 4: nullable attribute — a null RUN is one interval, and
      // value→null / null→value transitions are real changes
      (4L, ts("2024-04-01 00:00:00"), 40L, "a"),
      (4L, ts("2024-04-01 01:00:00"), 41L, null),
      (4L, ts("2024-04-01 02:00:00"), 42L, null),
      (4L, ts("2024-04-01 03:00:00"), 43L, "a"))
      .toDF("k", "t", "eid", "v")

    val got = TimeSeries.changeIntervals(log, "k", "t", "v", Seq("eid"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("∅"),
        r.getTimestamp(2).toString,
        Option(r.getTimestamp(3)).map(_.toString).getOrElse("-")))
      .sortBy(t => (t._1, t._3, t._2)).toSeq

    assert(got === Seq(
      (1L, "a", "2024-01-01 00:00:00.0", "2024-01-01 02:00:00.0"),
      (1L, "b", "2024-01-01 02:00:00.0", "2024-01-01 03:00:00.0"),
      (1L, "a", "2024-01-01 03:00:00.0", "-"),
      (2L, "x", "2024-02-01 00:00:00.0", "-"),
      // eid 30 ('q') sorts first at the shared timestamp, so its
      // interval closes at eid 31's identical timestamp; 'p' stays open
      (3L, "p", "2024-03-01 00:00:00.0", "-"),
      (3L, "q", "2024-03-01 00:00:00.0", "2024-03-01 00:00:00.0"),
      (4L, "a", "2024-04-01 00:00:00.0", "2024-04-01 01:00:00.0"),
      (4L, "∅", "2024-04-01 01:00:00.0", "2024-04-01 03:00:00.0"),
      (4L, "a", "2024-04-01 03:00:00.0", "-")))
  }

  test("gapFillDaily output is partitioning-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val obs = (1 to 200).map { i =>
      (i % 13L, d(f"2024-01-${rnd.nextInt(28) + 1}%02d"), i.toLong)
    }.distinct.toDF("k", "day", "n")
      // one row per (k, day) as the contract requires
      .groupBy("k", "day").agg(org.apache.spark.sql.functions.max("n").as("n"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.gapFillDaily(df, "k", "day", Seq("n"))
        .collect().map(_.toString).sorted.toSeq
    assert(run(obs.repartition(1)) === run(obs.repartition(11)))
  }

  test("sessionize splits strictly past the gap, not at it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    val ev = Seq( // (user, us offset, id)
      (1L, 0L, 1L),
      (1L, 600L * 1000000L, 2L),         // exactly gap: same session
      (1L, 1200L * 1000000L + 1L, 3L),   // gap + 1us: new session
      (2L, 0L, 4L))
      .toDF("u", "off", "id")
      .select(col("u"), timestamp_micros(col("off") + base).as("ts"),
        col("id"))
      .repartition(3)
    val got = TimeSeries.sessionize(ev, "u", "ts", "id", gapSeconds = 600)
      .orderBy("u", "session_start")
      .select(col("u"), unix_micros(col("session_start")) - base,
        unix_micros(col("session_end")) - base, col("n_events"),
        col("duration_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got === Array(
      (1L, 0L, 600000000L, 2L, 600L),
      (1L, 1200000001L, 1200000001L, 1L, 0L),
      (2L, 0L, 0L, 1L, 0L)))
  }

  test("sessionize matches the streaming session operator on testdata") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batch = TimeSeries.sessionize(
        graft.sources.Tables(spark, dir, "events"),
        "user_id", "ts", "event_id", gapSeconds = 1800)
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"), col("n_events"))
      .orderBy("user_id", "start_us")
      .collect().map(_.toString).toSeq
    val stream = graft.streaming.EventWindows
      .sessionize(spark, dir, gapMinutes = 30)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")
      .collect().map(_.toString).toSeq
    assert(batch.nonEmpty && batch === stream)
  }

  test("sessionize plans one exchange shared by window and aggregate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq((1L, 1700000000000000L, 1L)).toDF("u", "us", "id")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("id"))
    val plan = TimeSeries.sessionize(ev, "u", "ts", "id", 600)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges === 1, plan)
  }

  test("sessionizeNative keeps the inclusive gap edge (twin of sessionize)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    val ev = Seq( // the sessionize edge fixture: exactly-gap stays
      (1L, 0L, 1L),
      (1L, 600L * 1000000L, 2L),         // exactly gap: same session
      (1L, 1200L * 1000000L + 1L, 3L),   // gap + 1us: new session
      (2L, 0L, 4L))
      .toDF("u", "off", "id")
      .select(col("u"), timestamp_micros(col("off") + base).as("ts"),
        col("id"))
      .repartition(3)
    val got = TimeSeries.sessionizeNative(ev, "u", "ts", gapSeconds = 600)
      .orderBy("u", "session_start")
      .select(col("u"), unix_micros(col("session_start")) - base,
        unix_micros(col("session_end")) - base, col("n_events"),
        col("duration_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got === Array(
      (1L, 0L, 600000000L, 2L, 600L),
      (1L, 1200000001L, 1200000001L, 1L, 0L),
      (2L, 0L, 0L, 1L, 0L)))
  }

  test("sessionizeNative equals sessionize row-for-row on testdata") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"),
        col("duration_sec"))
      .orderBy("user_id", "s")
      .collect().map(_.toString).toSeq
    val ev = graft.sources.Tables(spark, dir, "events")
    val a = norm(TimeSeries.sessionize(ev, "user_id", "ts", "event_id", 1800))
    val b = norm(TimeSeries.sessionizeNative(ev, "user_id", "ts", 1800))
    assert(a.nonEmpty && a === b)
  }

  test("sessionizeNative plans one exchange and no analytic window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq((1L, 1700000000000000L, 1L)).toDF("u", "us", "id")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("id"))
    val plan = TimeSeries.sessionizeNative(ev, "u", "ts", 600)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert(!plan.contains("Window"), plan)
  }

  // --------------------------------------------------------------- EWMA

  /** Exact-decimal replica of the EWMA recurrence (6-dp input
    * quantization, 9-dp HALF_UP state). */
  private def bruteEwma(
      rows: Seq[(Long, Long, Long, Double)], // (key, us, id, v)
      alpha: Double): Seq[(Long, Long, Double)] = {
    val a = BigDecimal(java.math.BigDecimal.valueOf(alpha))
    val b = BigDecimal(1) - a
    rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (k, g) =>
      var prev: BigDecimal = null
      g.sortBy(r => (r._2, r._3)).map { r =>
        val x6 = BigDecimal(java.math.BigDecimal.valueOf(r._4))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        prev =
          if (prev == null) x6.setScale(9)
          else (a * x6 + b * prev)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        (k, r._3, prev.toDouble)
      }.sortBy(_._2)
    }
  }

  test("ewma matches the exact-decimal replica, ties broken by id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13L)
    // duplicate timestamps on purpose: the id tie-break must decide
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(5).toLong, 1700000000000000L + rnd.nextInt(40) * 1000000L,
        i.toLong, math.floor(rnd.nextDouble() * 10000) / 100.0)
    }
    val df = rows.toDF("k", "us", "id", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"),
        col("id"), col("v"))
      .repartition(5)
    val got = TimeSeries.ewma(df, "k", "ts", "id", "v", alpha = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got === bruteEwma(rows, 0.25))
  }

  test("ewma with alpha = 1 reproduces the quantized inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 1L, 1.23456789), (1L, 2L, 2.5))
      .toDF("k", "id", "v")
      .select(col("k"), timestamp_micros(col("id") * 1000000L).as("ts"),
        col("id"), col("v"))
    val got = TimeSeries.ewma(df, "k", "ts", "id", "v", alpha = 1.0)
      .collect().map(_.getDouble(2)).toSeq
    assert(got === Seq(1.234568, 2.5))
  }

  test("seasonalDowProfile: dow means and residuals match the replica") {
    import spark.implicits._
    import java.sql.Timestamp
    // 2024-01-01 is a Monday. Two Mondays (totals 10.5, 20.5 -> mean
    // 15.5), one Tuesday (3.25), multiple rows per day sum exactly.
    val rows = Seq(
      ("2024-01-01 09:00:00", 4.25), ("2024-01-01 17:30:00", 6.25),
      ("2024-01-08 10:00:00", 20.5),
      ("2024-01-02 12:00:00", 1.0), ("2024-01-02 13:00:00", 2.25))
      .map { case (s, v) => (Timestamp.valueOf(s), v) }
    val got = TimeSeries.seasonalDowProfile(
        rows.toDF("ts", "value").repartition(3), "ts", "value")
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1),
        r.getInt(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 10.5, 1, 15.5, -5.0),
      ("2024-01-02", 3.25, 2, 3.25, 0.0),
      ("2024-01-08", 20.5, 1, 15.5, 5.0)))
  }
}
