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

  test("hashFeatures: signed bucket counts match an md5 replica; nulls drop") {
    import spark.implicits._
    val dim = 8
    val df = Seq(
      (1L, "click", "42"), (2L, "view", null), (3L, "click", "42"),
      (4L, "purchase", "7")
    ).toDF("event_id", "event_type", "prop_k").repartition(3)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def contrib(name: String, v: String): (Int, Long) = {
      val h = md5hex(s"11-$name=$v")
      val b = (java.lang.Long.parseLong(h.substring(0, 8), 16) % dim).toInt
      val s = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0)
        1L else -1L
      (b, s)
    }
    val exp = Seq(
      (1L, Seq(contrib("event_type", "click"), contrib("prop_k", "42"))),
      (2L, Seq(contrib("event_type", "view"))), // null prop_k drops
      (3L, Seq(contrib("event_type", "click"), contrib("prop_k", "42"))),
      (4L, Seq(contrib("event_type", "purchase"), contrib("prop_k", "7")))
    ).map { case (id, cs) =>
      id -> (0 until dim).map(i =>
        cs.collect { case (b, s) if b == i => s }.sum).toVector
    }.toMap
    val got = Features.hashFeatures(
        df, "event_id", Seq("event_type", "prop_k"), dim, seed = 11L)
      .collect().map(r =>
        r.getLong(0) -> (1 to dim).map(r.getLong).toVector).toMap
    assert(got === exp)
    // identical inputs encode identically
    assert(got(1L) === got(3L))
    // each non-null feature contributes exactly ±1 somewhere
    assert(got(4L).map(math.abs).sum >= 1L)
  }

  test("fitScaler/applyScaler roundtrip: literal stats, exact formulas") {
    import spark.implicits._
    val vals = Seq(1.25, 2.5, 7.75, 4.0, 10.0, 0.5)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v, 3.0) } // c2 constant
      .toDF("id", "v", "c2").repartition(4)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_scaler_spec_").toString
    Features.fitScaler(df, Seq("v", "c2"), s"$dir/m")
    val got = Features.applyScaler(df, s"$dir/m")
      .orderBy("id")
      .select("v_minmax", "v_z", "c2_minmax", "c2_z")
      .collect()
    val n = vals.size
    val s = vals.map(BigDecimal(_)).sum.toDouble
    val ssq = vals.map(v => BigDecimal(v * v)).sum.toDouble
    val mean = s / n
    val sd = math.sqrt((ssq - s * s / n) / (n - 1))
    val (mn, mx) = (vals.min, vals.max)
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i).getDouble(0) === (v - mn) / (mx - mn))
      assert(got(i).getDouble(1) === (v - mean) / sd)
      assert(got(i).isNullAt(2)) // constant column: minmax null, not Inf
      assert(got(i).isNullAt(3)) // constant column: z null, not NaN
    }
  }

  test("frequencyEncode: exact counts/fractions, null category included") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, Some("b")),
        (4L, None), (5L, None), (6L, None))
      .toDF("id", "cat").repartition(3)
    val got = Features.frequencyEncode(df, "cat")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) === ((2L, 2.0 / 6)))
    assert(got(3L) === ((1L, 1.0 / 6)))
    assert(got(4L) === ((3L, 3.0 / 6))) // nulls encode as a category
    assert(got.size === 6)
  }

  test("correlationMatrix matches hand Pearson; constant column nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val xs = (0 until 300).map(_ => rnd.nextDouble() * 100)
    val ys = xs.map(x => 3.0 * x + rnd.nextDouble() * 10) // strongly corr
    val zs = xs.map(_ => rnd.nextDouble())                // independent-ish
    val df = xs.indices.map(i => (xs(i), ys(i), zs(i), 5.0))
      .toDF("x", "y", "z", "k").repartition(4)
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size; val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum
      val sa = math.sqrt(a.map(u => (u - ma) * (u - ma)).sum)
      val sb = math.sqrt(b.map(v => (v - mb) * (v - mb)).sum)
      cov / (sa * sb)
    }
    val got = Features.correlationMatrix(df, Seq("x", "y", "z", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size === 6)
    assert(math.abs(got(("x", "y")).get - pearson(xs, ys)) < 1e-5)
    assert(math.abs(got(("x", "z")).get - pearson(xs, zs)) < 1e-5)
    assert(got(("x", "k")) === None) // zero variance -> null
    assert(got(("x", "y")).get > 0.99)
  }

  test("mutualInformation: zero on independence, entropy on identity") {
    import spark.implicits._
    // perfectly dependent: y = x -> MI = H(X) = ln 2 (uniform binary)
    val dep = (0 until 400).map(i => (s"c${i % 2}", i % 2))
      .toDF("x", "y").repartition(3)
    val miDep = Features.mutualInformation(dep, "x", "y").head()
    assert(math.abs(miDep.getDouble(0) - math.log(2.0)) < 1e-9)
    assert(miDep.getLong(1) === 400L && miDep.getLong(2) === 2L)
    // independent uniform grid -> MI exactly 0 (every cell term 0)
    val ind = (0 until 400).map(i => (s"c${i % 2}", (i / 2) % 2))
      .toDF("x", "y").repartition(3)
    val miInd = Features.mutualInformation(ind, "x", "y").head()
    assert(miInd.getDouble(0) === 0.0)
    assert(miInd.getLong(2) === 4L)
  }

  test("groupTrend recovers a planted slope exactly; degenerate keys null") {
    import spark.implicits._
    val dayUs = 86400000000L
    val base = 1700000000000000L
    // key "a": value = 2.5/day exactly (2-dp values on day marks);
    // key "b": constant (slope 0); key "c": one point (null)
    val rows =
      (0 until 20).map(i => ("a", base + i * dayUs,
        math.floor((10.0 + 2.5 * i) * 100) / 100)) ++
      (0 until 9).map(i => ("b", base + i * dayUs, 7.25)) ++
      Seq(("c", base, 1.0))
    val df = rows.toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
      .repartition(4)
    val got = Features.groupTrend(df, "k", "ts", "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got("a") === Some(2.5))
    assert(got("b") === Some(0.0))
    assert(got("c") === None) // single point: zero x-variance
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

  test("rankNormalize: percent_rank with ties and singleton groups") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0),
      ("a", 4L, 30.0), ("b", 5L, 7.0))
      .toDF("g", "id", "v")
    val got = Features.rankNormalize(df.repartition(3), "v", "g")
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    // ranks in 'a': 10->1, 20->2 (tied), 30->4 of n=4 -> /(n-1)=3
    assert(got === Map(1L -> 0.0, 2L -> (1.0 / 3), 3L -> (1.0 / 3),
      4L -> 1.0, 5L -> 0.0))
  }

  test("interArrivalStats: hand gaps, Poisson-ish CV, degenerate keys") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val df = Seq(
      (1L, ts(0), 1L, 0.0), (1L, ts(10), 2L, 0.0), (1L, ts(40), 3L, 0.0),
      (2L, ts(5), 4L, 0.0), // single event: null stats
      (3L, ts(7), 5L, 0.0), (3L, ts(7), 6L, 0.0)) // zero gap: sg=0
      .toDF("user_id", "ts", "event_id", "value")
    val got = Features.interArrivalStats(df.repartition(3),
        "user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    // user 1: gaps 10s, 30s -> mean 20s; var = (100+900)e12/2 - 400e12
    //   = 100e12 µs² -> sd 10s -> cv 0.5
    assert(got === Seq(
      (1L, 3L, Some(20.0), Some(0.5)),
      (2L, 1L, None, None),
      (3L, 2L, Some(0.0), None)))
  }

  test("chiSquare: independent table scores ~0, dof and counts exact") {
    import spark.implicits._
    // perfectly independent 2x2: counts (10,20,10,20)
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    val got = Features.chiSquare(
      rows.toDF("u", "v").repartition(3), "u", "v").head()
    assert(got.getDouble(0) === 0.0)
    assert(got.getLong(1) === 1L)
    assert(got.getLong(2) === 60L)
    assert(got.getLong(3) === 4L)
    // dependence raises it: replica-checked cell term
    val dep = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val chi = Features.chiSquare(
      dep.toDF("u", "v").repartition(2), "u", "v").head().getDouble(0)
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def term(o: Double, cx: Double, cy: Double) = {
      val e = cx * cy / 40.0; r12((o - e) * (o - e) / e)
    }
    val exp = (term(30, 30, 30) + term(0, 30, 10) + term(0, 10, 30) +
      term(10, 10, 10)).toDouble
    assert(chi === exp)
  }

  test("pcaPowerTop recovers the analytic 2x2 eigenpair") {
    import spark.implicits._
    // y = 2x + structured residual +-3 (never proportional), so the
    // 2x2 corr matrix is [[1, r], [r, 1]] with 0 < r < 1: top
    // eigenvector (1,1)/sqrt(2), eigenvalue 1 + r
    val rows = (1 to 200).map { i =>
      val x = i.toDouble
      (x, 2.0 * x + (if (i % 2 == 0) 3.0 else -3.0))
    }
    val got = Features.pcaPowerTop(
        rows.toDF("x", "y").repartition(5), Seq("x", "y"), iters = 25)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val inv = 1.0 / math.sqrt(2.0)
    got.foreach { case (_, loading, _) =>
      assert(math.abs(loading - inv) < 1e-6, loading)
    }
    val lambda = got.head._3
    assert(lambda > 1.0 && lambda < 2.0, lambda)
    // lambda = 1 + r where r is the corr — cross-check vs Spark's corr
    val r = rows.toDF("x", "y").agg(corr(col("x"), col("y")))
      .head().getDouble(0)
    assert(math.abs(lambda - (1.0 + r)) < 1e-6, (lambda, r))
    // determinism under repartition
    val again = Features.pcaPowerTop(
        rows.toDF("x", "y").repartition(13), Seq("x", "y"), iters = 25)
      .collect().map(r2 => (r2.getString(0), r2.getDouble(1), r2.getDouble(2)))
    assert(again.toSeq === got.toSeq)
  }

  test("pcaPowerTop refuses zero variance and bad params") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(intercept[IllegalArgumentException](
      Features.pcaPowerTop(df, Seq("x", "y"), 5))
      .getMessage.contains("zero variance"))
    assert(intercept[IllegalArgumentException](
      Features.pcaPowerTop(df, Seq("x"), 5))
      .getMessage.contains("two columns"))
  }

  test("pcaPowerTop refuses null inputs loudly instead of biasing the moments") {
    import spark.implicits._
    // a partly-null column: sum() skips the null while count(*) counts
    // the row, so proceeding would silently bias every covariance —
    // and an ALL-null column would NPE on the null aggregated Decimal
    val partly = Seq((1.0, Option(2.0)), (2.0, None), (3.0, Option(5.0)))
      .toDF("x", "y")
    val e1 = intercept[IllegalArgumentException](
      Features.pcaPowerTop(partly, Seq("x", "y"), 5))
    assert(e1.getMessage.contains("null value") &&
      e1.getMessage.contains("y"), e1.getMessage)
    val allNull = Seq((1.0, Option.empty[Double]), (2.0, None))
      .toDF("x", "y")
    val e2 = intercept[IllegalArgumentException](
      Features.pcaPowerTop(allNull, Seq("x", "y"), 5))
    assert(e2.getMessage.contains("null value"), e2.getMessage)
  }
}
