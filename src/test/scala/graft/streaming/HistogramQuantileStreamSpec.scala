package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec

/** The oracle gate runs q159 over ONE micro-batch. This spec forces a
  * genuine 3-batch split (maxFilesPerTrigger=1 over three mtime-ordered
  * files) and proves what the single-batch run can't: the per-key bin
  * histogram rides GroupState across batch boundaries, so the final
  * collapsed estimate equals a from-scratch computation over ALL rows
  * — including keys whose values straddle every batch.
  */
class HistogramQuantileStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(
      s"2024-01-01 ${"%02d".format(minute / 60)}:${"%02d".format(minute % 60)}:00")

  private def writeFile(
      dir: String, name: String, seq: Int,
      rows: Seq[(String, Timestamp, Double)]): Unit = {
    import spark.implicits._
    val tmp = s"$dir/_tmp_$name"
    rows.toDF("event_type", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$dir/$name"))
    new File(s"$dir/$name").setLastModified(1700000000000L + seq * 60000L)
    new File(tmp).listFiles().foreach(_.delete()); new File(tmp).delete()
  }

  private def brute(
      rows: Seq[(String, Double)], w: Double,
      qs: Seq[(String, Long, Long)]): Set[(String, String, Long, Double)] =
    rows.groupBy(_._1).flatMap { case (k, vs) =>
      val bins = vs.map(v => math.floor(v._2 / w).toLong)
        .groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val n = vs.size.toLong
      qs.map { case (qn, num, den) =>
        val rank = (n * num + den - 1L) / den
        var cum = 0L
        val bin = bins.iterator.map { case (b, c) =>
          cum += c; (b, cum)
        }.collectFirst { case (b, c) if c >= rank => b }.get
        (k, qn, n, bin * w)
      }
    }.toSet

  test("streamHistogramQuantile across 3 forced batches equals brute") {
    val dir = Files.createTempDirectory("graft_hq_mb_").toString
    val rnd = new scala.util.Random(31L)
    def mk(types: Seq[String], mins: Range): Seq[(String, Timestamp, Double)] =
      for { m <- mins; t <- types } yield
        (t, ts(m), math.floor(rnd.nextDouble() * 5000) / 100.0)
    // 'a' and 'b' straddle all three batches; 'c' only the last
    writeFile(dir, "ev0.parquet", 0, mk(Seq("a", "b"), 0 until 40))
    writeFile(dir, "ev1.parquet", 1, mk(Seq("a", "b"), 40 until 80))
    writeFile(dir, "ev2.parquet", 2, mk(Seq("a", "b", "c"), 80 until 120))

    val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L))
    val got = EventWindows.streamHistogramQuantile(spark, dir,
        binWidth = 5.0, quantiles = qs,
        glob = "*.parquet", maxFilesPerTrigger = 1)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val all = spark.read.parquet(dir).collect()
      .map(r => (r.getString(r.fieldIndex("event_type")),
        r.getDouble(r.fieldIndex("value")))).toSeq
    assert(got === brute(all, 5.0, qs))
    // the collapse kept the FINAL (max-n) emission per key
    assert(got.filter(_._1 == "a").forall(_._3 === 120L))
    assert(got.filter(_._1 == "c").forall(_._3 === 40L))
  }

  test("streamHistogramQuantile validates its parameters") {
    val e = intercept[IllegalArgumentException](
      EventWindows.streamHistogramQuantile(spark, "/nonexistent",
        binWidth = 0.0, quantiles = Seq(("p50", 1L, 2L))))
    assert(e.getMessage.contains("binWidth"))
    val e2 = intercept[IllegalArgumentException](
      EventWindows.streamHistogramQuantile(spark, "/nonexistent",
        binWidth = 1.0, quantiles = Seq(("bad", 3L, 2L))))
    assert(e2.getMessage.contains("num <= den"))
  }
}
