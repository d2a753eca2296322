package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Error-bound and plan-shape checks for the approx sketch tier
  * (approx_count_distinct = HLL++, approx_percentile). Sketch values
  * are engine-specific and can never be cross-engine hash-checked, so
  * the hard signals are: relative error against the exact value,
  * run-to-run determinism (both sketches are hash-based, no RNG), and
  * the partial/final aggregate split that makes them one-pass at
  * 100 TB. The harness-level twins are q51/q52, whose oracles check
  * the same bounds through the DuckDB compare. */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct lands within 2.5x the configured rsd") {
    val rows = sources.Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("approx_percentile lands within max(5%, 1.0) of exact quantile_cont") {
    val rows = sources.Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("exact50"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx50"),
        expr("percentile(l_extendedprice, 0.9)").as("exact90"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("approx90"))
      .collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val e50 = r.getDouble(1); val a50 = r.getDouble(2)
      assert(math.abs(a50 - e50) <= math.max(0.05 * e50, 1.0),
        s"${r.getString(0)}: p50 approx=$a50 exact=$e50")
      val e90 = r.getDouble(3); val a90 = r.getDouble(4)
      assert(math.abs(a90 - e90) <= math.max(0.05 * e90, 1.0),
        s"${r.getString(0)}: p90 approx=$a90 exact=$e90")
    }
  }

  test("sketches are deterministic across runs (hash-based, no RNG)") {
    def run(): Seq[(String, Long)] =
      sources.Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"))
        .orderBy("o_orderpriority")
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(run() === run())
  }

  // `(n) NodeName` appears exactly once per physical node in formatted
  // explain (tree lines would double-count)
  private def nodes(p: String, name: String): Int =
    s"""\\(\\d+\\) $name""".r.findAllIn(p).size

  test("HLL sketch aggregation keeps the partial/final split") {
    val p = sources.Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // two HashAggregate nodes around one exchange: the sketch merges
    // map-side (fixed-width HLL register buffer), only k registers
    // cross the shuffle — the property that makes it the 100 TB
    // cardinality operator
    assert(nodes(p, "HashAggregate") == 2, p)
    assert(nodes(p, "Exchange") == 1, p)
  }

  test("approx_percentile keeps the partial/final split (ObjectHashAggregate)") {
    val p = sources.Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(nodes(p, "ObjectHashAggregate") == 2, p)
    assert(nodes(p, "Exchange") == 1, p)
  }
}
