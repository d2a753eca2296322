package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LEFT OUTER watermarked stream-stream join (q137): unmatched rows
  * emit with nulls once the watermark passes their match window;
  * matches emit immediately, including across micro-batch boundaries. */
class StreamOuterJoinSpec extends SparkSpec {

  test("outer join: cross-batch match joins, unmatched click emits null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_oj_mb_").toString
    def writeFile(
        name: String, seq: Int,
        rows: Seq[(Long, Long, String)]): Unit = {
      val tmp = s"$dir/_tmp"
      rows.toDF("user_id", "us", "event_type")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("event_type"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
      new File(s"$dir/$name").setLastModified(1700000000000L + seq * 60000L)
    }
    val base = 1700000000000000L
    val min = 60L * 1000000L
    // batch 1: three clicks; user 1's purchase arrives IN-batch
    writeFile("f1.parquet", 0, Seq(
      (1L, base, "click"), (2L, base, "click"), (3L, base, "click"),
      (1L, base + 10L * min, "purchase")))
    // batch 2: user 3's purchase arrives in a LATER batch, still
    // inside the 30-min window (buffered click state must match it);
    // user 2 never gets one
    writeFile("f2.parquet", 1, Seq((3L, base + 5L * min, "purchase")))
    // two-sided sentinel-flush batches far past every deadline
    val flush = base + 86400L * 1000000L
    writeFile("f3.parquet", 2,
      Seq((-1L, flush, "click"), (-1L, flush, "purchase")))
    writeFile("f4.parquet", 3,
      Seq((-1L, flush + 86400L * 1000000L, "click"),
        (-1L, flush + 86400L * 1000000L, "purchase")))

    val schema = spark.read.parquet(dir).schema
    def side(tpe: String, u: String, t: String) =
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .where(col("event_type") === tpe)
        .select(col("user_id").as(u), col("ts").as(t))
        .withWatermark(t, "2 hours")
    val q = side("click", "c_user", "c_ts")
      .join(side("purchase", "p_user", "p_ts"),
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .writeStream.outputMode("append").format("memory")
      .queryName("oj_mb").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("oj_mb").where(col("c_user") >= 0)
      .select(col("c_user"),
        unix_micros(col("p_ts")).as("p_us")) // null for unmatched
      .collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(identity).toSeq
    spark.catalog.dropTempView("oj_mb")
    assert(got === Seq(
      (1L, base + 10L * min), // in-batch match
      (2L, -1L),              // unmatched: null row via watermark
      (3L, base + 5L * min))) // cross-batch match
  }

  test("streamClickPurchaseOuter equals the batch LEFT JOIN on testdata") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventWindows
      .streamClickPurchaseOuter(spark, dir, windowMinutes = 30)
      .orderBy("user_id").collect().map(_.toString).toSeq
    val ev = graft.sources.Tables(spark, dir, "events")
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("p_ts")).as("n_matched"),
        sum(when(col("p_ts").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(stream.nonEmpty && stream === batch)
    // the outer form must actually exercise unmatched clicks
    assert(EventWindows
      .streamClickPurchaseOuter(spark, dir, windowMinutes = 30)
      .agg(sum(col("n_unmatched"))).head().getLong(0) > 0L)
  }
}
