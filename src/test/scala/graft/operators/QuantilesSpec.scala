package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {

  test("quantileBucket splits evenly, monotonically, and handles nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val values = Seq.fill(1000)(rnd.nextDouble() * 1e6)
    val df = (values.map(Option(_)) :+ Option.empty[Double])
      .toDF("v").repartition(7)

    val out = Quantiles.quantileBucket(df, "v", 10).cache()
    try {
      assert(out.where(col("v").isNull && col("bucket").isNotNull).count() === 0)
      val counts = out.where(col("v").isNotNull)
        .groupBy("bucket").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(counts.map(_._1) === (1 to 10))
      assert(counts.map(_._2).sum === 1000L)
      // continuous draws, exact interpolated boundaries → 100 ± 1 each
      assert(counts.forall { case (_, n) => n >= 99 && n <= 101 }, counts)
      // monotone: every value in bucket i is <= every value in i+1
      val ranges = out.where(col("v").isNotNull)
        .groupBy("bucket").agg(min("v").as("lo"), max("v").as("hi"))
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
        case _ =>
      }
    } finally out.unpersist()
  }

  test("quantileBucket fails loudly when no boundaries exist") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("v")
    val allNull = Seq(Option.empty[Double], Option.empty[Double]).toDF("v")
    for (df <- Seq(empty, allNull)) {
      val ex = intercept[IllegalArgumentException] {
        Quantiles.quantileBucket(df, "v", 4)
      }
      assert(ex.getMessage.contains("no non-null values"))
    }
  }

  test("quantileBucket assignment runs without a Window operator") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val plan = Quantiles.quantileBucket(df, "v", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("winsorize clips to the exact interpolated band; nulls pass") {
    import spark.implicits._
    val vals = (1 to 100).map(_.toDouble)
    val df = (vals.map(Option(_)) :+ None).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(5)
    // interpolated boundary, Spark's arithmetic: pos = p·(n−1),
    // v[⌊pos⌋] + frac·(v[⌊pos⌋+1] − v[⌊pos⌋])
    def pct(p: Double): Double = {
      val pos = p * (vals.size - 1); val lo = pos.toInt
      vals(lo) + (pos - lo) * (vals(lo + 1) - vals(lo))
    }
    val (lo, hi) = (pct(0.1), pct(0.9))
    val got = Quantiles.winsorize(df, "v", 0.1, 0.9, "w")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) === Some(math.min(math.max(v, lo), hi)))
    }
    assert(got(100L) === None) // null passes through as null
    // no Window in the plan (the clip is literal expressions)
    val plan = Quantiles.winsorize(df, "v", 0.1, 0.9, "w")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    intercept[IllegalArgumentException] {
      Quantiles.winsorize(df, "v", 0.9, 0.1, "w")
    }
    intercept[IllegalArgumentException] {
      Quantiles.winsorize(df.where("v IS NULL"), "v", 0.1, 0.9, "w")
    }
  }

  test("robustScale: (x − median)/IQR exactly; constant column null") {
    import spark.implicits._
    val vals = (1 to 101).map(_.toDouble) // median 51, q1 26, q3 76
    val df = (vals.map(Option(_)) :+ None).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(4)
    val got = Quantiles.robustScale(df, "v", "r")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) === Some((v - 51.0) / 50.0))
    }
    assert(got(101L) === None) // null passes through
    // constant column: zero IQR -> null, never ±Inf
    val const = (0 until 10).map(i => (i.toLong, 3.0)).toDF("id", "v")
    assert(Quantiles.robustScale(const, "v", "r")
      .where(col("r").isNotNull).count() === 0L)
  }

  test("histogram artifact: append ≡ rebuild, ceil-rank probe exact") {
    import spark.implicits._
    def artDir(tag: String): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_hist_$tag").toString
      new java.io.File(d).deleteOnExit(); d
    }
    // 100 values 0.0, 1.0, ..., 99.0; bin width 10 -> bins 0..9 of 10
    val all = (0 until 100).map(i => (i.toLong, i.toDouble))
    val df = all.toDF("id", "v")
    val p1 = artDir("a")
    Quantiles.writeHistogram(df.where(col("id") % 3 =!= 0), "v", 10.0, p1)
    Quantiles.appendToHistogram(spark, p1, df.where(col("id") % 3 === 0), "v")
    val p2 = artDir("b")
    Quantiles.writeHistogram(df, "v", 10.0, p2)
    def binsOf(p: String) = spark.read.parquet(
      graft.sources.Artifacts.latestDir(spark, p) + "/bins")
    assert(binsOf(p1).orderBy("bin").collect().toSeq
      === binsOf(p2).orderBy("bin").collect().toSeq)
    // p50: rank ceil(50) = 50 -> bin 4 (cum through bin 4 = 50);
    // p90: rank 90 -> bin 8; p99: rank 99 -> bin 9
    val got = Quantiles.histogramQuantiles(spark, p1,
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("p50", 100L, 40.0), ("p90", 100L, 80.0),
      ("p99", 100L, 90.0)))
    // appending to a non-artifact fails loudly
    assert(intercept[IllegalArgumentException](
      Quantiles.appendToHistogram(spark, "/nonexistent_graft", df, "v"))
      .getMessage.contains("no histogram artifact"))
  }

  test("histogram probe guards the single-task window against a pathological binWidth") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_hist_guard").toString
    new java.io.File(d).deleteOnExit()
    // 100 distinct values at binWidth 1.0 -> 100 occupied bins
    Quantiles.writeHistogram(
      (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v"),
      "v", 1.0, d)
    spark.conf.set("spark.graft.histogram.maxProbeBins", "5")
    try {
      val e = intercept[IllegalArgumentException](
        Quantiles.histogramQuantiles(spark, d, Seq(("p50", 1L, 2L))))
      assert(e.getMessage.contains("occupied bins"))
    } finally spark.conf.unset("spark.graft.histogram.maxProbeBins")
    // and under the cap the same probe answers
    assert(Quantiles.histogramQuantiles(spark, d, Seq(("p50", 1L, 2L)))
      .collect().head.getDouble(2) === 49.0)
  }

  test("histogram ceil-rank stays exact past double precision (decimal cross-multiply)") {
    import spark.implicits._
    // counts a real 100-TB corpus produces: n·num would overflow a long
    // and lose integer exactness as a double. Write the counter table
    // directly (the artifact layout is the contract) with
    // cnt(bin0) = 2^60+1 — not double-representable — and probe the
    // quantile whose exact ceil-rank is EXACTLY cum(bin0): the decimal
    // cross-multiplied predicate must put it in bin0, not bin1.
    val d = java.nio.file.Files.createTempDirectory("graft_hist_big").toString
    new java.io.File(d).deleteOnExit()
    val big = (1L << 60) + 1L
    graft.sources.Artifacts.publishVersion(spark, d) { vdir =>
      Seq((0L, big), (1L, 1L)).toDF("bin", "cnt")
        .coalesce(1).write.parquet(s"$vdir/bins")
      Seq(10.0).toDF("bin_width").coalesce(1).write.parquet(s"$vdir/meta")
    }
    val got = Quantiles.histogramQuantiles(spark, d,
        Seq(("pbig", big, big + 1L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // n = 2^60+2, rank = ceil(n·big/(big+1)) = ceil(big·(big+1)/(big+1))
    //   = big = cum(bin0) exactly -> bin 0, lower edge 0.0
    assert(got.toSeq === Seq(("pbig", big + 1L, 0.0)))
  }
}
