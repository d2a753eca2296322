package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FrequencySpec extends SparkSpec {

  private def toks(ts: String*) = {
    import spark.implicits._
    ts.toDF("tok")
  }

  test("heavy hitters equal the direct group-count at any sketch size") {
    // 60 'a', 25 'b', 10 'c', 5 distinct singletons -> N = 100
    val data = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      Seq("u1", "u2", "u3", "u4", "u5")
    val df = toks(data: _*).repartition(7) // spread across partitions
    // threshold 8% of 100 = 8 -> {a, b, c}
    val got = Frequency.heavyHitters(df, "tok", minFrac = 0.08)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 60L), ("b", 25L), ("c", 10L)))
  }

  test("tiny sketch still misses nothing above the deficiency bound") {
    // sketchSize 3 -> bound 1/4; threshold 30% clears it. The hitter
    // is interleaved with churn that constantly evicts MG counters.
    val churn = (1 to 60).map(i => s"x$i")
    val data = (Seq.fill(40)("hot") ++ churn).toList
    val df = toks(new scala.util.Random(42).shuffle(data): _*)
      .repartition(5)
    val got = Frequency.heavyHitters(df, "tok", minFrac = 0.3,
      sketchSize = 3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("hot", 40L)))
  }

  test("threshold below the deficiency bound fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Frequency.heavyHitters(toks("a"), "tok", minFrac = 0.1,
        sketchSize = 4)
    }
    assert(e.getMessage.contains("deficiency bound"))
  }

  test("phase-2 recount joins broadcast and prunes before the aggregate") {
    val df = toks(Seq.fill(30)("a") ++ (1 to 20).map(_.toString): _*)
    val plan = Frequency.heavyHitters(df, "tok", minFrac = 0.2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(5).mkString("\n"))
  }

  // ------------------------------------------------------- CountMin

  private def cmFixture = {
    // zipf-ish: 'a'×50, 'b'×20, 'c'×8, 30 singletons
    val data = Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ Seq.fill(8)("c") ++
      (1 to 30).map(i => s"s$i")
    toks(new scala.util.Random(7).shuffle(data): _*).repartition(5)
  }

  test("countMin estimates dominate true counts; exact when wide") {
    val df = cmFixture
    val truth = df.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
    def ests(width: Int) = Frequency.countMinEstimate(
        Frequency.countMinSketch(df, "tok", depth = 4, width = width),
        truth.select("tok"), "tok", depth = 4, width = width)
      .join(truth, "tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // narrow sketch: overestimates allowed, underestimates never
    val narrow = ests(width = 8)
    assert(narrow.forall { case (_, est, t) => est >= t })
    assert(narrow.length === 33)
    // wide sketch: 4 independent rows of 4096 cells over 33 keys —
    // a min-of-4 collision survivor is (33²/2/4096)⁴-improbable, and
    // this fixed fixture has none
    assert(ests(width = 4096).forall { case (_, est, t) => est === t })
  }

  test("countMinMerge of disjoint halves equals the full-corpus sketch") {
    val df = cmFixture.withColumn(
      "half", pmod(xxhash64(col("tok")), lit(2)))
    val a = Frequency.countMinSketch(
      df.where(col("half") === 0), "tok", depth = 3, width = 16)
    val b = Frequency.countMinSketch(
      df.where(col("half") === 1), "tok", depth = 3, width = 16)
    val merged = Frequency.countMinMerge(a, b)
      .orderBy("i", "idx").collect().toSeq
    val full = Frequency.countMinSketch(df, "tok", depth = 3, width = 16)
      .orderBy("i", "idx").collect().toSeq
    assert(merged === full)
  }

  test("persisted CountMin artifact: append ≡ rebuild bitwise, probe answers from disk") {
    val d = java.nio.file.Files
      .createTempDirectory("graft_cm_artifact").toString
    new java.io.File(d).deleteOnExit()
    val df = cmFixture.withColumn(
      "half", pmod(xxhash64(col("tok")), lit(2)))
    // lifecycle: build from half 0, fold half 1 in via staged swap
    Frequency.writeCountMin(
      df.where(col("half") === 0), "tok", depth = 3, width = 16, d)
    Frequency.appendToCountMin(spark, d, df.where(col("half") === 1), "tok")
    val merged = spark.read.parquet(
      graft.sources.Artifacts.latestDir(spark, d) + "/counters")
      .orderBy("i", "idx").collect().toSeq
    val full = Frequency.countMinSketch(cmFixture, "tok",
        depth = 3, width = 16)
      .orderBy("i", "idx").collect().toSeq
    assert(merged === full)
    // probe reads depth/width from the artifact meta and answers with
    // the sketch guarantee (est >= true) for every key
    val truth = cmFixture.groupBy("tok").agg(count(lit(1)).as("t"))
    val est = Frequency.countMinEstimatePersisted(
        spark, d, truth.select("tok"), "tok")
      .join(truth, "tok")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(est.length === 33 && est.forall { case (e, t) => e >= t })
    // missing artifact fails loudly, not with a parquet stack trace
    assert(intercept[IllegalArgumentException](
      Frequency.countMinEstimatePersisted(spark, "/nonexistent_graft_cm",
        truth.select("tok"), "tok"))
      .getMessage.contains("no CountMin artifact"))
  }

  test("countMin sketch build carries no key column past the explode") {
    // the shuffle moves (i, idx) partials only — the plan must not
    // reference the key column after the projection feeding the agg
    val plan = Frequency.countMinSketch(cmFixture, "tok", 4, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("Exchange hashpartitioning(tok"), plan)
  }
}
