package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native streaming session_window twin (q112): sentinel-flush
  * device, append-mode emission, equality with the batch sessionizer. */
class StreamingSessionSpec extends SparkSpec {

  test("native sessions merge across micro-batch boundaries") {
    import spark.implicits._
    // a session SPLIT mid-way across two files must come out as ONE
    // session — the claim the custom flatMapGroupsWithState form
    // (q21) explicitly does not make (it sessionizes per batch and
    // relies on single-batch delivery); the native session_window
    // keeps the open session in the state store and merges on arrival
    val dir = Files.createTempDirectory("graft_sess_mb_").toString
    def writeFile(name: String, seq: Int, rows: Seq[(Long, Long)]): Unit = {
      val tmp = s"$dir/_tmp"
      rows.toDF("user_id", "us")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
      new File(s"$dir/$name").setLastModified(1700000000000L + seq * 60000L)
    }
    val base = 1700000000000000L
    val gapUs = 600L * 1000000L // 10-minute gap
    // file 1: user 1 events at t0, t0+5min (session open at batch end)
    writeFile("f1.parquet", 0, Seq((1L, base), (1L, base + 300L * 1000000L)))
    // file 2: user 1 event at t0+9min — within gap of the OPEN session
    // (must merge), plus a flush row far in the future
    writeFile("f2.parquet", 1, Seq((1L, base + 540L * 1000000L)))
    writeFile("f3.parquet", 2, Seq((-1L, base + 86400L * 1000000L)))
    writeFile("f4.parquet", 3, Seq((-1L, base + 2L * 86400L * 1000000L)))

    val schema = spark.read.parquet(dir).schema
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"),
        count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("s")).as("s"),
        unix_micros(col("e")).as("e"), col("n"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_mb")
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_mb")
      .where(col("user_id") >= 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    spark.catalog.dropTempView("sess_mb")
    // ONE merged session spanning both batches, 3 events
    assert(got.toSeq === Seq((1L, base, base + 540L * 1000000L, 3L)), got.toSeq)
  }

  test("sessionizeNative(stream) equals batch sessionize on testdata") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventWindows.sessionizeNative(spark, dir, gapMinutes = 30)
      .orderBy("user_id", "start_us")
      .collect().map(_.toString).toSeq
    val batch = graft.operators.TimeSeries.sessionize(
        graft.sources.Tables(spark, dir, "events"),
        "user_id", "ts", "event_id", gapSeconds = 1800)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"), col("n_events"))
      .orderBy("user_id", "start_us")
      .collect().map(_.toString).toSeq
    assert(stream.nonEmpty && stream === batch)
  }
}
