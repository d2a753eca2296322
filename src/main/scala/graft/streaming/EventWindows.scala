package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming surface: windowed aggregation over the `events`
  * table driven as a file stream (the reference is batch-only — this is
  * part of the beyond-reference pipeline surface).
  *
  * For verification the stream is run synchronously to completion over
  * the static parquet (memory sink + processAllAvailable) — the same
  * plan that, pointed at a real unbounded source with a watermark,
  * runs incrementally with state cleanup.
  */
object EventWindows {

  private val counter = new AtomicInteger(0)

  /** Tumbling-window aggregate per event_type: row count and value sum.
    * Window = 1 hour aligned to the epoch (matches `date_trunc('hour')`).
    * Sum goes through decimal so it is exact/associative — deterministic
    * under any merge order of streaming state. */
  /** File-stream source over the events table: the sf dir is the stream
    * directory (FileStreamSource requires a directory, not a file) with a
    * glob filter selecting the events parquet. */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir),
      Seq("ts"))
  }

  def hourlyByType(spark: SparkSession, dir: String): DataFrame = {
    val stream = eventsStream(spark, dir)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
    val name = s"graft_events_hourly_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(
        unix_timestamp(col("w.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Stateful sessionization shape (flatMapGroupsWithState is exercised
    * in tests on a bounded stream): count events per user per hour. */
  def hourlyPerUser(spark: SparkSession, dir: String): DataFrame = {
    val stream = eventsStream(spark, dir)
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val name = s"graft_events_user_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(unix_timestamp(col("w.start")).as("hour_epoch"),
        col("user_id"), col("n_events"))
  }
}
