package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec

/** The oracle gate runs q173 over ONE micro-batch. This spec forces a
  * 3-batch split and proves the causal accumulators ride GroupState
  * across batch boundaries: the streamed z of an event in batch 3
  * reflects ALL prior events from batches 1-2, and equals an
  * independent scalar replay over the concatenated feed.
  */
class ZScoreStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(
      s"2024-01-01 ${"%02d".format(minute / 60)}:${"%02d".format(minute % 60)}:00")

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

  private def brute(
      rows: Seq[(Long, Long, Double)]): Map[(Long, Long), Option[Double]] = {
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_._1).flatMap { case (u, rs) =>
      var n = 0L; var su = 0L; var sq = BigInt(0)
      rs.sortBy(_._2).map { case (_, id, v) =>
        val xu = math.round(v * 10000.0)
        val z =
          if (n < 3) None
          else {
            val nd = n.toDouble
            val m = su.toDouble / nd
            val vr = sq.toDouble / nd - m * m
            if (vr > 0) Some(r9((xu.toDouble - m) / math.sqrt(vr)))
            else None
          }
        n += 1; su += xu; sq += BigInt(xu) * BigInt(xu)
        (u, id) -> z
      }
    }
  }

  test("streamZScore across 3 forced batches equals the scalar replay") {
    val dir = Files.createTempDirectory("graft_zs_mb_").toString
    val rnd = new scala.util.Random(47L)
    var id = 0L
    def mk(users: Seq[Long], mins: Range): Seq[(Long, Timestamp, Long, Double)] =
      for { m <- mins; u <- users } yield {
        id += 1
        (u, ts(m), id, math.floor(rnd.nextDouble() * 10000) / 100.0)
      }
    val f0 = mk(Seq(1L, 2L), 0 until 10)
    val f1 = mk(Seq(1L, 2L), 10 until 20)
    val f2 = mk(Seq(1L, 2L, 3L), 20 until 30)
    writeFile(dir, "ev0.parquet", 0, f0)
    writeFile(dir, "ev1.parquet", 1, f1)
    writeFile(dir, "ev2.parquet", 2, f2)

    val got = EventWindows.streamZScore(spark, dir,
        glob = "*.parquet", maxFilesPerTrigger = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val exp = brute((f0 ++ f1 ++ f2).map(r => (r._1, r._3, r._4)))
    assert(got === exp)
    // user 3 only ever sees batch-3 rows: its first three are null,
    // later ones scored — proving per-key state, not per-batch
    val u3 = (f2.filter(_._1 == 3L).map(_._3)).sorted
    assert(u3.take(3).forall(i => got((3L, i)).isEmpty))
    assert(got((3L, u3.last)).isDefined)
    // user 1's batch-3 scores differ from a batch-3-only replay —
    // the state genuinely carried batches 1-2
    val b3only = brute(f2.filter(_._1 == 1L).map(r => (r._1, r._3, r._4)))
    assert(f2.filter(_._1 == 1L).map(_._3)
      .exists(i => got((1L, i)) != b3only((1L, i))))
  }
}
