package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables

/** The co-location contract: a sort-merge join of two tables bucketed
  * by the join key into the same bucket count, and a downstream
  * aggregation on that key, run with NO shuffle exchange — and the
  * result is identical to the plain join (bucketing is physical layout
  * only). */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed SMJ and key-grouped agg plan with zero exchanges; result == plain join") {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val base = Files.createTempDirectory("graft_bkt_spec_").toString
    val bc = Bucketing.writeBucketed(
      c, "spec_bkt_customer", s"$base/customer", "c_custkey", 4)
    val bo = Bucketing.writeBucketed(
      o, "spec_bkt_orders", s"$base/orders", "o_custkey", 4)

    // disable broadcast so the join must pick SMJ — the shape the
    // co-location claim is about (a broadcastable side needs no
    // bucketing in the first place)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bc.join(bo, bc("c_custkey") === bo("o_custkey"))
      val perKey = joined.groupBy(bc("c_custkey"))
        .count()
      val plan = perKey.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)

      // physical layout must not change results: same join output as
      // the unbucketed parquet join, and per-key counts match
      val plain = c.join(o, c("c_custkey") === o("o_custkey"))
      assert(joined.count() == plain.count())
      val bucketedCounts = perKey.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plainCounts = plain.groupBy(c("c_custkey")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bucketedCounts == plainCounts)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed write produces one file per bucket (sorted reads need it)") {
    val docs = Tables(spark, dir, "customer")
    val base = Files.createTempDirectory("graft_bkt_files_").toString
    Bucketing.writeBucketed(
      docs, "spec_bkt_files", s"$base/t", "c_custkey", 4)
    val parts = new java.io.File(s"$base/t").listFiles()
      .filter(f => f.getName.startsWith("part-"))
    // repartition(buckets, key) aligns writer tasks with buckets:
    // exactly one data file per bucket
    assert(parts.length == 4, parts.map(_.getName).mkString(","))
  }
}
