package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim

/** The partitioning-preserving eager localCheckpoint
  * (graftshim.localCheckpointPartitioned) — the device the iterative
  * graph operators use so a per-round checkpoint does not re-pay the
  * rank/label table's exchange every round. Pins: (1) data identity
  * with the plain checkpoint, (2) the declared partitioning actually
  * removes the downstream exchange a plain checkpoint re-introduces,
  * (3) graceful fallback when the executed plan has no hash
  * partitioning. */
class GraftshimCheckpointSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  // exchanges in the FINAL plan only (formatted explain repeats the
  // initial plan under AQE; count the operator list section lines)
  private def exchanges(df: DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Reused"))
  }

  test("shim checkpoint: identical rows, downstream agg loses its exchange") {
    import spark.implicits._
    val base = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "v")
      .repartition(col("k"))
    val plainCk = base.localCheckpoint(true)
    val shimCk = graftshim.localCheckpointPartitioned(base)

    // (1) bit-identical contents
    assert(shimCk.orderBy("k", "v").collect().toSeq ==
      plainCk.orderBy("k", "v").collect().toSeq)

    // (2) the same aggregate over the plain checkpoint shuffles; over
    // the shim checkpoint the declared hashpartitioning(k) satisfies
    // the aggregate's distribution and the exchange disappears
    val aggPlain = plainCk.groupBy("k").agg(sum("v").as("s"))
    val aggShim = shimCk.groupBy("k").agg(sum("v").as("s"))
    assert(aggShim.orderBy("k").collect().toSeq ==
      aggPlain.orderBy("k").collect().toSeq)
    val ePlain = exchanges(aggPlain)
    val eShim = exchanges(aggShim)
    assert(ePlain >= 1, s"plain-checkpoint agg lost its exchange? plan:\n${plan(aggPlain)}")
    assert(eShim == ePlain - 1,
      s"shim checkpoint did not remove the agg exchange " +
        s"(plain=$ePlain shim=$eShim):\n${plan(aggShim)}")
  }

  test("shim checkpoint: non-hash-partitioned input falls back to plain") {
    import spark.implicits._
    // a union has UnknownPartitioning — the shim must not invent one
    val a = (1L to 50L).toDF("v")
    val u = a.union(a.select(col("v") + 100L))
    val ck = graftshim.localCheckpointPartitioned(u)
    assert(ck.orderBy("v").collect().toSeq == u.orderBy("v").collect().toSeq)
    // downstream agg still shuffles (no partitioning was declared)
    assert(exchanges(ck.groupBy("v").count()) >= 1)
  }
}
