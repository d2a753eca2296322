package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds on
  * SPARK_GRAFT_SF_DIR (driver default sf0.1).
  *
  * Measurement protocol (BASELINE.md): a full untimed warmup pass over
  * the same queries at the target SF first — paying per-JVM one-time
  * costs (whole-stage codegen compilation per query shape, JIT, Spark
  * 4's ~40s collation/ICU static init, parquet footer caching) outside
  * the timed region, exactly as a long-running cluster has them
  * amortized; measured skew without it is ~10× on sub-second queries —
  * then each query timed once, forced end-to-end via the noop sink
  * (`count()` would let Catalyst prune projections and undercount work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata has parquet TIMESTAMP(NANOS) columns (see sources.Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a failed query would otherwise register as a near-zero time and
    // silently deflate a pass total — count failures and refuse to
    // publish a clean record when any timed pass had one
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    def force(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          failures.incrementAndGet()
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // 1-minute load average — diagnoses a contended host in the record
    // itself (co-scheduled harness work inflates micro-batch streaming
    // and big-shuffle lines far more than simple scans)
    def loadAvg(): Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      catch { case _: Throwable => -1.0 }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val load0 = loadAvg()
    // untimed warmup pass at the target SF (codegen/JIT/ICU/reader init)
    names.foreach(force(_, sfDir))
    failures.set(0) // only TIMED-pass failures taint the record
    // per-query time = min of 2 measured runs: single runs showed up to
    // ~15× run-to-run variance from GC/OS noise on sub-second queries;
    // min-of-N is the steady-state cost the plan actually has
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }
    cleanup()
    val pass1 = names.map(n => n -> force(n, sfDir)).toMap
    cleanup()
    val pass2 = names.map(n => n -> force(n, sfDir)).toMap
    // contention gate (BASELINE.md's judgeability rule, enforced here
    // instead of trusted to the reader): pass totals that disagree by
    // more than 20% mean a co-scheduled process inflated one pass —
    // run a THIRD pass and take min-of-3, and if even the two closest
    // totals still disagree >20%, say so in the record itself via
    // "contended": true rather than publishing a silently-bad number.
    // NaN-proof: a degenerate pass total (zero, negative, NaN — e.g.
    // from systemic failures) must read as disagreement, not slip
    // through the `NaN > x == false` trapdoor
    def disagree(a: Double, b: Double): Boolean =
      !(a > 0.0) || !(b > 0.0) ||
        !(math.abs(a - b) / math.min(a, b) <= 0.20)
    val retried = disagree(pass1.values.sum, pass2.values.sum)
    val pass3: Option[Map[String, Double]] =
      if (retried) {
        System.err.println("[bench] pass totals disagree >20% — " +
          "contended host suspected, running a third pass")
        cleanup()
        Some(names.map(n => n -> force(n, sfDir)).toMap)
      } else None
    val load1 = loadAvg()
    val passes = Seq(pass1, pass2) ++ pass3
    val passTotals = passes.map(_.values.sum)
    val bestTwo = passTotals.sorted.take(2)
    val nFailed = failures.get()
    // any timed-pass failure taints the record: per-query mins are no
    // longer comparable, so say so instead of publishing silently
    val contended = disagree(bestTwo(0), bestTwo(1)) || nFailed > 0
    val results = names.map(n => n -> passes.map(_(n)).min)
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val pts = passTotals.map(t => f"$t%.1f").mkString("[", ",", "]")
    // per-artifact build seconds (the once-per-JVM builds land in the
    // untimed warmup pass by design — this table keeps their cost
    // machine-readable next to the per-query floors)
    val artifacts = SparkEntry.artifactBuildCosts.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""pass_totals":$pts,"retried":$retried,"contended":$contended,""" +
        s""""failures":$nFailed,""" +
        f""""load_avg":[$load0%.1f,$load1%.1f],""" +
        s""""artifact_build_sec":$artifacts,""" +
        s""""sf":"$sfDir"}"""
    println(line)
    // capture-proof copy: BENCH_r05's stdout tail was truncated by the
    // driver, losing q01-q18 and the total — the file survives that
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "bench_out.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: $e") }
    spark.stop()
    // The driver's round artifact keeps only the LAST 2000 chars of
    // stdout (measured from BENCH_r05-r08: tail_len exactly 2000, with
    // sbt's ~80-char "[success]" epilogue inside it), so the ~4.5 KB
    // full record above can never survive intact — three rounds of
    // "parsed": null. The LAST line is therefore a compact twin that
    // fits the window WITH the full per-query map: keys are the digits
    // of the query's unique qNN id prefix, values are the per-query
    // min in centiseconds ("q_csec_by_id"). bench_out.json (written
    // above) keeps the full-precision long-form record.
    def compactLine(unitName: String, scale: Double): String = {
      val qsCompact = results.map { case (k, v) =>
        "\"" + k.drop(1).takeWhile(_ != '_') + "\":" +
          math.round(v * scale)
      }.mkString("{", ",", "}")
      val sfName = sfDir.split('/').last
      s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec",""" +
        s""""$unitName":$qsCompact,"pass_totals":$pts,""" +
        s""""retried":$retried,"contended":$contended,""" +
        s""""failures":$nFailed,""" +
        f""""load_avg":[$load0%.1f,$load1%.1f],""" +
        s""""artifact_build_sec":$artifacts,""" +
        s""""sf":"$sfName","full_record":"bench_out.json"}"""
    }
    val cs = compactLine("q_csec_by_id", 100.0)
    // belt-and-braces: if the map ever outgrows the window, drop to
    // decisecond values rather than re-losing the record to truncation
    println(if (cs.length <= 1880) cs
      else compactLine("q_dsec_by_id", 10.0))
  }
}
