package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  /** Rows the parquet scan actually emitted = rows in row groups that
    * survived min/max pruning (AQE off so the scan node is reachable;
    * record-level filtering happens in the downstream Filter). */
  private def scannedRows(path: String, cond: Column): Long = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(path).where(cond)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def resultIds(path: String, cond: Column): Seq[Long] =
    spark.read.parquet(path).where(cond)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("z-ordered layout skips row groups on a 2-D box; results are layout-invariant") {
    import spark.implicits._
    // two pseudo-random dims decorrelated from id so an id-ordered or
    // hash-shuffled layout has every file spanning the full range
    val n = 100000
    val df = (0 until n).map { i =>
      (i.toLong, ((i.toLong * 7919L) % 317L).toInt,
        ((i.toLong * 104729L) % 317L).toInt)
    }.toDF("id", "x", "y")
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_zorder_spec_${ProcessHandle.current().pid()}"
    val plainPath = s"$tmp/plain"
    val zPath = s"$tmp/zorder"
    df.repartition(32, col("id")).write.mode("overwrite").parquet(plainPath)
    ZOrder.writeZOrdered(df, Seq("x", "y"), zPath, numFiles = 32, bits = 8)

    val box = col("x") < 20 && col("y") < 20
    assert(resultIds(zPath, box) === resultIds(plainPath, box))

    val plainScanned = scannedRows(plainPath, box)
    val zScanned = scannedRows(zPath, box)
    // hash layout: every file's min/max spans the range → nothing skips
    assert(plainScanned > (n * 0.9).toLong, s"plain=$plainScanned")
    // the box is ~0.4% of the z-plane → a handful of row groups
    assert(zScanned < n / 4, s"zorder=$zScanned vs plain=$plainScanned")
  }

  test("zValueOf interleaves bits and rejects bad arity") {
    import spark.implicits._
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L)).toDF("a", "b")
    // ranges are [0,3] → 2-bit scale at bits=2; interleave: a even bits
    val z = df.withColumn("z", ZOrder.zValueOf(df, Seq("a", "b"), bits = 2))
      .orderBy("a", "b")
      .collect().map(_.getLong(2)).toSeq
    // (0,0)->0; (0,3)->0b1010=10; (3,0)->0b0101=5; (3,3)->15
    assert(z === Seq(0L, 10L, 5L, 15L))
    intercept[IllegalArgumentException] {
      ZOrder.zValueOf(df, Seq("a"), bits = 2)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValueOf(df, Seq("a", "b"), bits = 40)
    }
  }
}
