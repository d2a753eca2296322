package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("joinAsOf attaches latest right row at or before each left time") {
    import spark.implicits._
    val events = Seq(
      (1L, 100L, 5L),   // before any state -> null
      (2L, 100L, 10L),  // exactly at state t=10 -> sees it (inclusive)
      (3L, 100L, 25L),  // between 20 and 30 -> sees t=20
      (4L, 100L, 99L),  // after last -> sees t=30
      (5L, 200L, 50L),  // other key
      (6L, 300L, 50L)   // key with no right rows at all -> null
    ).toDF("event_id", "k", "t")
    val state = Seq(
      (100L, 10L, "a"), (100L, 20L, "b"), (100L, 30L, "c"),
      (200L, 49L, "x")
    ).toDF("k", "t", "v")

    val got = AsOf.joinAsOf(events, state, "k", "k", "t", "t", Seq("v"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(3)))
      .toMap
    assert(got === Map(
      1L -> None, 2L -> Some("a"), 3L -> Some("b"), 4L -> Some("c"),
      5L -> Some("x"), 6L -> None))
  }

  test("joinAsOf handles many keys across partitions") {
    import spark.implicits._
    val events = (0 until 500).map(i => (i.toLong, i.toLong % 50, 100L))
      .toDF("event_id", "k", "t")
    val state = (0 until 50).map(k => (k.toLong, 10L, k * 2))
      .toDF("k", "t", "v")
    val got = AsOf.joinAsOf(events, state, "k", "k", "t", "t", Seq("v"))
      .collect()
    assert(got.length === 500)
    got.foreach { r =>
      assert(r.getInt(3) === r.getLong(1).toInt * 2)
    }
  }
}
