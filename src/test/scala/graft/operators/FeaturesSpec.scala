package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {

  private def eventsDf(rows: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_id", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("value"))
      .repartition(5)
  }

  test("rollingFeatures matches an in-memory replica, ties broken by id") {
    val rnd = new scala.util.Random(29L)
    val rows = (0 until 200).map { i =>
      (rnd.nextInt(4).toLong, 1700000000000000L + rnd.nextInt(30) * 1000000L,
        i.toLong, math.floor(rnd.nextDouble() * 10000) / 100.0)
    }
    val n = 5
    val exp = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      val ord = g.sortBy(r => (r._2, r._3))
      ord.zipWithIndex.map { case (r, i) =>
        val frame = ord.slice(math.max(0, i - n + 1), i + 1)
        val s = frame.map(x => BigDecimal(x._4)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
        (k, r._3,
          if (i == 0) None else Some(ord(i - 1)._4),
          frame.size.toLong, s.toDouble / frame.size)
      }
    }.sortBy(r => (r._1, r._2))
    val got = Features.rollingFeatures(
        eventsDf(rows), "user_id", "ts", "event_id", "value", n)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === exp)
  }

  test("targetEncodeLoo: mean of the others; singleton category is null") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 5.0), (5L, "b", 7.0),
      (6L, "c", 99.0) // singleton
    ).toDF("event_id", "event_type", "value")
    val got = Features.targetEncodeLoo(df, "event_type", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> Some(25.0), 2L -> Some(20.0), 3L -> Some(15.0),
      4L -> Some(7.0), 5L -> Some(5.0), 6L -> None))
  }

  test("groupSplit keeps every group in exactly one split, deterministically") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (i.toLong % 60, i.toLong))
    val df = rows.toDF("user_id", "event_id")
    val a = Features.groupSplit(df, "user_id", 31L, 80, 10)
    // one split per group
    val perGroup = a.groupBy("user_id")
      .agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).head().getLong(0)
    assert(perGroup === 1L)
    // deterministic under repartitioning, all three splits present
    val b = Features.groupSplit(df.repartition(7), "user_id", 31L, 80, 10)
    assert(a.orderBy("event_id").collect().toSeq ===
      b.orderBy("event_id").collect().toSeq)
    assert(a.select("split").distinct().count() === 3L)
  }
}
