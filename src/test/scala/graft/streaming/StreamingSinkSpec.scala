package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The deployment path the memory-sink verification harness doesn't
  * exercise: a checkpointed parquet file sink that stops, misses
  * input, restarts, and resumes EXACTLY-ONCE — no loss, no
  * duplicates — including stateful dedup whose state store must come
  * back from the checkpoint. */
class StreamingSinkSpec extends SparkSpec {

  private def writeBatch(path: String, ids: Range): Unit = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"u${i % 10}")).toDF("id", "user")
      .write.mode("append").parquet(path)
  }

  private def runOnce(transform: DataFrame => DataFrame,
                      in: String, out: String, ckpt: String): Unit = {
    val q = transform(
      spark.readStream.schema("id LONG, user STRING").parquet(in))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      org.apache.spark.sql.graftshim.unloadAllStateStores()
    }
  }

  test("file sink resumes exactly-once after input arrives while down") {
    val base = Files.createTempDirectory("graft_sink_").toString
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    writeBatch(in, 1 to 100)
    runOnce(identity, in, out, ckpt)
    assert(spark.read.parquet(out).count() == 100)

    // input lands while no query is running; the restarted query must
    // pick up exactly the unprocessed files from the checkpoint log
    writeBatch(in, 101 to 150)
    runOnce(identity, in, out, ckpt)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 150)
    assert(rows.select("id").distinct().count() == 150)
  }

  test("dedup state survives restart: re-sent ids are not re-emitted") {
    val base = Files.createTempDirectory("graft_sink_dedup_").toString
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    writeBatch(in, 1 to 100)
    runOnce(_.dropDuplicates("id"), in, out, ckpt)
    assert(spark.read.parquet(out).count() == 100)

    // 51-100 are duplicates only the RESTORED state store can know
    writeBatch(in, 51 to 150)
    runOnce(_.dropDuplicates("id"), in, out, ckpt)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 150, "restored dedup state must drop re-sent ids")
    assert(rows.select("id").distinct().count() == 150)
  }

  test("streamUpsertMaterialize snapshot equals the batch latest-per-key") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventWindows.streamUpsertMaterialize(spark, dir)
      .orderBy("user_id").collect().map(_.toString).toSeq
    val batch = graft.sources.Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("last"))
      .select(col("user_id"), unix_micros(col("last.ts")).as("ts_us"),
        col("last.event_id").as("event_id"),
        col("last.event_type").as("event_type"),
        col("last.value").as("value"))
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(stream.nonEmpty && stream === batch)
    // deterministic across full re-runs (fresh state dir per call)
    val again = EventWindows.streamUpsertMaterialize(spark, dir)
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(again === batch)
  }

  test("streamCountMin: micro-batch folds equal the one-shot sketch of the corpus") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventWindows.streamCountMin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // counter sums commute: the 3-micro-batch artifact must equal the
    // sketch built in one pass over the whole corpus
    val ev = graft.sources.Tables(spark, dir, "events")
    val oneShot = graft.operators.Frequency.countMinSketch(
      ev.select(col("user_id")), "user_id", 4, 2048)
    val truth = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
      .orderBy(desc("true_cnt"), col("user_id")).limit(20)
    val batch = graft.operators.Frequency.countMinEstimate(
        oneShot, truth.select("user_id"), "user_id", 4, 2048)
      .join(truth, "user_id")
      .select(col("user_id"), col("true_cnt"), col("est"))
      .orderBy(desc("true_cnt"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stream.nonEmpty && stream === batch)
    // CountMin guarantee on every probed line: est >= true
    assert(stream.forall { case (_, t, e) => e >= t })
  }
}
