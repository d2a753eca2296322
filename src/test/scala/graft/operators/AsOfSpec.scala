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

  test("joinAsOf tolerates input columns named like its internals") {
    import spark.implicits._
    // the left schema squats on _k/_t/_tag/_salt — the operator must
    // generate collision-free internal names
    val events = Seq(
      (1L, 100L, 5L, "x"), (2L, 100L, 30L, "y")
    ).toDF("_k", "_t", "_tag", "_salt")
    val state = Seq((100L, 10L, "a")).toDF("k", "t", "v")
    val got = AsOf.joinAsOf(events, state, "_t", "k", "_tag", "t", Seq("v"))
      .orderBy("_k")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(4)))
      .toSeq
    assert(got === Seq(1L -> None, 2L -> Some("a")))
  }

  test("right-side (key,time) duplicates resolve deterministically") {
    import spark.implicits._
    val events = Seq((1L, 100L, 50L)).toDF("event_id", "k", "t")
    // two right rows tied on (key, time): greatest payload struct wins,
    // independent of input order
    val state1 = Seq((100L, 10L, "a"), (100L, 10L, "b")).toDF("k", "t", "v")
    val state2 = Seq((100L, 10L, "b"), (100L, 10L, "a")).toDF("k", "t", "v")
    Seq(state1, state2).foreach { st =>
      val got = AsOf.joinAsOf(events, st, "k", "k", "t", "t", Seq("v"))
        .collect().map(_.getString(3)).toSeq
      assert(got === Seq("b"))
    }
  }

  test("random as-of joins match a sequential oracle (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    (1 to 5).foreach { _ =>
      val events = (0 until 200).map(i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(50).toLong))
      val state = (0 until 30).map(_ =>
        (rnd.nextInt(6).toLong, rnd.nextInt(50).toLong, rnd.nextInt(100)))
      // sequential oracle: latest state at/before t; (key,time) dupes
      // resolve to the max payload (the operator's documented reduction)
      def oracle(k: Long, t: Long): Option[Int] = {
        val c = state.filter(s => s._1 == k && s._2 <= t)
        if (c.isEmpty) None
        else {
          val tm = c.map(_._2).max
          Some(c.filter(_._2 == tm).map(_._3).max)
        }
      }
      val got = AsOf.joinAsOf(
          events.toDF("event_id", "k", "t"), state.toDF("k", "t", "v"),
          "k", "k", "t", "t", Seq("v"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getInt(3))))
        .toMap
      events.foreach { case (id, k, t) =>
        assert(got(id) === oracle(k, t), s"event $id key $k t $t")
      }
    }
  }

  test("salted sweep equals unsalted on a skewed hot key") {
    import spark.implicits._
    // 1000 events on ONE key — the skew case salting is for
    val events = (0 until 1000).map(i => (i.toLong, 7L, (i % 97).toLong))
      .toDF("event_id", "k", "t")
    val state = Seq((7L, 10L, "lo"), (7L, 50L, "hi")).toDF("k", "t", "v")
    def run(s: Int) =
      AsOf.joinAsOf(events, state, "k", "k", "t", "t", Seq("v"),
          saltBuckets = s)
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    val plain = run(1)
    val salted = run(4)
    assert(plain.size === 1000)
    assert(salted === plain)
    // spot-check semantics: t<10 -> none, 10<=t<50 -> lo, t>=50 -> hi
    assert(plain(5L) === None && plain(20L) === Some("lo") &&
      plain(60L) === Some("hi"))
  }
}
