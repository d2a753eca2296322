package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.TimeSeries

/** The oracle gate runs q125 over ONE micro-batch. This spec forces a
  * genuine 3-batch split (maxFilesPerTrigger=1 over three time-ordered
  * files) and proves the claim the single-batch run can't: the
  * GroupState decimal carries the recurrence across batch boundaries,
  * so the streamed EWMA equals the batch operator row-for-row —
  * including users whose series straddles all three batches.
  */
class EwmaStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(
      s"2024-01-01 ${"%02d".format(minute / 60)}:${"%02d".format(minute % 60)}:00")

  /** One parquet file directly under `dir` with a seq-ordered mtime
    * (the EventWindowsMultiBatchSpec fixture device). */
  private def writeFile(
      dir: String, name: String, seq: Int,
      rows: Seq[(Long, Timestamp, Long, Double)]): Unit = {
    import spark.implicits._
    val tmp = s"$dir/_tmp_$name"
    rows.toDF("user_id", "ts", "event_id", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$dir/$name"))
    new File(s"$dir/$name").setLastModified(1700000000000L + seq * 60000L)
    new File(tmp).listFiles().foreach(_.delete()); new File(tmp).delete()
  }

  test("streamEwma across 3 forced batches equals the batch operator") {
    val dir = Files.createTempDirectory("graft_ewma_mb_").toString
    val rnd = new scala.util.Random(21L)
    var id = 0L
    def mk(users: Seq[Long], mins: Range): Seq[(Long, Timestamp, Long, Double)] =
      for { m <- mins; u <- users } yield {
        id += 1
        (u, ts(m), id, math.floor(rnd.nextDouble() * 10000) / 100.0)
      }
    // three time-ordered files; users 1-3 appear in every file, so
    // their recurrences MUST ride the GroupState across batches
    writeFile(dir, "ev0.parquet", 0, mk(Seq(1L, 2L, 3L), 0 until 10))
    writeFile(dir, "ev1.parquet", 1, mk(Seq(1L, 2L, 3L), 10 until 20))
    writeFile(dir, "ev2.parquet", 2, mk(Seq(1L, 3L), 20 until 30))

    val streamed = EventWindows.streamEwma(spark, dir, alpha = 0.25,
        glob = "*.parquet", maxFilesPerTrigger = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val batch = TimeSeries.ewma(
        graft.sources.Tables.normalizeTs(
          spark.read.parquet(dir), Seq("ts")),
        "user_id", "ts", "event_id", "value", alpha = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(streamed.size === 80 && streamed === batch)
  }
}
