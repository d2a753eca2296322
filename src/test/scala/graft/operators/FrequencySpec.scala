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
}
