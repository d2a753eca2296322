package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The oracle gate runs every streaming query over ONE micro-batch (a
  * single parquet file). This spec forces genuinely incremental
  * ingestion (maxFilesPerTrigger=1 over several files) and proves the
  * two claims the single-batch run can't:
  *
  *   1. the update-log max-struct collapse equals the batch aggregate
  *      under a multi-batch split, windows updated across batches
  *      included;
  *   2. the 2h watermark actually drops a row that arrives later than
  *      the watermark — the state-eviction semantics the unbounded
  *      deployment relies on (and the documented, deliberate
  *      divergence from a batch aggregate over the same files).
  */
class EventWindowsMultiBatchSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(s"2024-01-01 ${"%02d".format(minute / 60)}:${"%02d".format(minute % 60)}:00")

  /** Write rows as ONE parquet file named `name` directly under
    * `dir` (FileStreamSource lists plain files; a per-write subdir
    * would hide them), with strictly increasing mtimes so the source
    * ingests files in write order. */
  private def writeFile(
      dir: String, name: String, seq: Int,
      rows: Seq[(Timestamp, String, Double)]): Unit = {
    import spark.implicits._
    val tmp = s"$dir/_tmp_$name"
    rows.toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$dir/$name"))
    new File(s"$dir/$name").setLastModified(1700000000000L + seq * 60000L)
    new File(tmp).listFiles().foreach(_.delete()); new File(tmp).delete()
  }

  private def batchAgg(df: DataFrame): Array[(Long, String, Long, Double)] =
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

  test("multi-batch collapse ≡ batch aggregate; late row is dropped by the watermark") {
    val dir = Files.createTempDirectory("graft_mb_").toString

    // file 1 (batch 0): hours 0 and 1
    val f1 = (0 until 10).map(i => (ts(i * 6), "view", 1.5)) ++
      (0 until 5).map(i => (ts(60 + i * 6), "click", 2.25))
    // file 2 (batch 1): hour 2, PLUS more hour-1 clicks — the hour-1
    // window is updated in two different batches, so the collapse must
    // pick the cross-batch final count, not the largest single batch
    val f2 = (0 until 8).map(i => (ts(120 + i * 6), "view", 0.5)) ++
      (0 until 4).map(i => (ts(95 + i), "click", 2.25))
    // file 3 (batch 2): hour 3
    val f3 = (0 until 6).map(i => (ts(180 + i * 6), "purchase", 10.0))
    // file 4 (batch 3): benign filler — its only job is to complete a
    // trigger so the watermark math below has settled
    val f4 = Seq((ts(216), "purchase", 10.0))
    // file 5 (batch 4): ONE late hour-0 row. Two subtleties, both
    // verified by this spec against Spark's watermark-propagation
    // semantics (3.4+): lateness is judged by the row's WINDOW END
    // (not its event time), and the late-event filter uses the
    // PREVIOUS trigger's watermark while state eviction uses the
    // current one. Watermark after batch 2 = max(3:30) − 2h = 1:30 >
    // hour-0's end 1:00, so by batch 4 the filter wm is 1:30 and this
    // row is discarded on ingest — n_events(hour 0) stays 10. (Two
    // batches earlier the same row would still have been aggregated:
    // filter wm was 0:42.)
    val f5 = Seq((ts(10), "view", 99.0))

    writeFile(dir, "f1.parquet", 1, f1)
    writeFile(dir, "f2.parquet", 2, f2)
    writeFile(dir, "f3.parquet", 3, f3)
    writeFile(dir, "f4.parquet", 4, f4)
    writeFile(dir, "f5.parquet", 5, f5)

    val streamed = EventWindows.hourlyByType(spark, dir,
        glob = "f*.parquet", maxFilesPerTrigger = 1)
      .select(col("hour_epoch"), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    import spark.implicits._
    val all = (f1 ++ f2 ++ f3 ++ f4 ++ f5).toDF("ts", "event_type", "value")
    val withoutLate = all.where(col("value") =!= 99.0)

    // 1. exactness under the multi-batch split, minus the late row
    assert(streamed.toSeq == batchAgg(withoutLate).toSeq,
      s"streamed=${streamed.mkString(",")}")
    // 2. the late row WOULD have changed the batch aggregate — i.e.
    //    the watermark really dropped it, this isn't a vacuous pass
    assert(streamed.toSeq != batchAgg(all).toSeq)
    // hour-1 clicks: 5 in batch 0 + 4 in batch 1 = 9 cross-batch —
    // the collapse picked the cross-batch final, not a single batch's
    assert(streamed.count(t => t._2 == "click" && t._3 == 9L) == 1)
  }

  test("dropDuplicatesWithinWatermark: horizon duplicates dropped, post-eviction re-emit") {
    val dir = Files.createTempDirectory("graft_dw_").toString
    // watermark delay 1h; dedup key = event_type
    // f1: k1 and k2 arrive
    writeFile(dir, "f1.parquet", 1,
      Seq((ts(0), "k1", 1.0), (ts(6), "k2", 1.0)))
    // f2: duplicate k1 INSIDE the horizon (dropped), plus an advancing
    // row that pushes the watermark to 2:00 — past k1's expiry
    // (0:00 + 1h)
    writeFile(dir, "f2.parquet", 2,
      Seq((ts(30), "k1", 2.0), (ts(180), "adv", 1.0)))
    // f3: spacer trigger. Eviction runs with the PREVIOUS trigger's
    // watermark (same semantics the hourly spec pins down), so k1's
    // state survives the batch that ADVANCED the watermark and is
    // reclaimed only while this batch runs with wm = 2:00
    writeFile(dir, "f3.parquet", 3,
      Seq((ts(185), "spacer", 1.0)))
    // f4: k1 again with a NEW event time, after eviction → re-emitted
    // (the documented bounded-state trade)
    writeFile(dir, "f4.parquet", 4,
      Seq((ts(190), "k1", 3.0)))

    val got = EventWindows.dedupWithinWatermark(spark, dir,
        keyCols = Seq("event_type"), delay = "1 hour",
        glob = "f*.parquet", maxFilesPerTrigger = 1)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sorted.toSeq

    // k1 twice (original + post-eviction), the in-horizon duplicate
    // (value 2.0) gone; a GLOBAL dropDuplicates would keep k1 once —
    // the state-size-vs-horizon trade, asserted not just documented
    assert(got === Seq(("adv", 1.0), ("k1", 1.0), ("k1", 3.0),
      ("k2", 1.0), ("spacer", 1.0)))
  }

  test("Trigger.AvailableNow backfill self-terminates and matches the batch aggregate") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_an_").toString
    val f1 = (0 until 10).map(i => (ts(i * 6), "view", 1.5))
    val f2 = (0 until 5).map(i => (ts(60 + i * 6), "click", 2.25))
    writeFile(dir, "f1.parquet", 1, f1)
    writeFile(dir, "f2.parquet", 2, f2)

    // the deployment backfill shape: AvailableNow snapshots the file
    // listing at start, drains it in rate-limited batches
    // (maxFilesPerTrigger honored), and STOPS — unlike the default
    // trigger, which runs until told to stop. processAllAvailable is
    // the verification-harness device; this is what a scheduled
    // catch-up job actually runs.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = s.read.option("pathGlobFilter", "f*.parquet").parquet(dir).schema
    val q = s.readStream.schema(schema)
      .option("pathGlobFilter", "f*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .writeStream.outputMode("update").format("memory")
      .queryName("graft_an").trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "AvailableNow did not self-terminate")
    finally {
      q.stop()
      org.apache.spark.sql.graftshim.unloadAllStateStores()
    }
    val got = s.table("graft_an")
      .groupBy(unix_timestamp(col("w.start")).as("hp"), col("event_type"))
      .agg(max(struct(col("n_events"), col("sum_value"))).as("last"))
      .select(col("hp"), col("event_type"),
        col("last.n_events"), col("last.sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    s.catalog.dropTempView("graft_an")
    import spark.implicits._
    assert(got.toSeq ==
      batchAgg((f1 ++ f2).toDF("ts", "event_type", "value")).toSeq)
  }
}
