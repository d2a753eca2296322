package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native streaming session_window twin (q112): sentinel-flush
  * device, append-mode emission, equality with the batch sessionizer. */
class StreamingSessionSpec extends SparkSpec {

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
