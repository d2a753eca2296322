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
  * then each query timed per pass, forced end-to-end via the noop sink
  * (`count()` would let Catalyst prune projections and undercount work).
  *
  * SELF-BUDGETING (round 14): the driver runs this under a hard
  * timeout; round 13's record was lost to it (`BENCH_r13.json`
  * rc 124, `parsed: null`) when host contention stretched pass totals
  * to 305-467 s and the contention-retry third pass (1064 s in r12!)
  * no longer fit. A missing record is strictly worse than a degraded
  * one, so the harness now tracks its own wall clock against
  * SPARK_GRAFT_BENCH_BUDGET_SEC (default 1700 s, chosen well inside
  * the driver window that r12's ~2400 s run survived):
  *   - extra timed passes run only if the previous pass's total fits
  *     the remaining budget;
  *   - inside a pass, each query checks the deadline first — a
  *     ballooning pass aborts mid-way and keeps its partial floors;
  *   - a query with no timed measurement falls back to its WARMUP
  *     time (inflated by one-time costs — counted in
  *     "warm_fallback" so the reader knows);
  *   - a JVM shutdown hook prints the best-known compact record if
  *     the driver's timeout fires anyway.
  */
object Bench {
  // best-known compact record, refreshed after warmup and each pass;
  // printed by the shutdown hook iff the normal path didn't finish
  @volatile private var snapshot: String = null
  @volatile private var finished: Boolean = false
  @volatile private var sessionForHook: SparkSession = null

  /** Pass totals disagreeing >20% (or degenerate: zero/negative/NaN
    * must read as disagreement, not slip through the
    * `NaN > x == false` trapdoor) — the contention gate. */
  private[graft] def disagree(a: Double, b: Double): Boolean =
    !(a > 0.0) || !(b > 0.0) ||
      !(math.abs(a - b) / math.min(a, b) <= 0.20)

  /** Would another pass of ~`estimate` seconds fit the remaining
    * budget, with `reserve` seconds of finish-and-print headroom and
    * 15% contingency for drift within the pass? */
  private[graft] def passFits(
      remaining: Double, estimate: Double, reserve: Double): Boolean =
    remaining > 1.15 * estimate + reserve

  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - benchT0) / 1e9
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1700")
      .toDouble
    def remaining(): Double = budgetSec - elapsed()
    // headroom a single query may still need after its deadline check
    // passes (worst observed contended line ~15 s; leave stop+print room)
    val reserveSec = 60.0

    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!finished && snapshot != null) {
        // Spark's own shutdown hook runs CONCURRENTLY with this one and
        // its teardown can log ERROR lines (task-rejected noise) after
        // our record prints — and the driver keeps only the last 2000
        // chars of merged output. Best-effort: mute logging first.
        try { if (sessionForHook != null)
          sessionForHook.sparkContext.setLogLevel("OFF") }
        catch { case _: Throwable => () }
        println(snapshot)
        try java.nio.file.Files.write(
          java.nio.file.Paths.get(sys.env.getOrElse(
            "SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
          (snapshot + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => () }
      }
    }))

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
    // ERROR, not WARN: the driver's round artifact keeps only the LAST
    // 2000 chars of merged output, and streaming lines emit WARN
    // chatter (ResolveWriteToStream / MicroBatchExecution / cancel-job
    // noise — see the r13 tail) that can evict the record line printed
    // by the shutdown hook if the driver's timeout fires mid-run.
    spark.sparkContext.setLogLevel("ERROR")
    sessionForHook = spark

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

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }

    // ---- record assembly (shared by the normal path and the hook) ----
    def buildRecords(
        warm: Map[String, Double],
        passes: Seq[Map[String, Double]],
        passTotals: Seq[Double],
        retried: Boolean,
        contendedIn: Boolean,
        nFailed: Int,
        load1: Double,
        partial: Boolean): (String, String) = {
      // per-query floor over timed passes; warmup time (inflated) only
      // when the budget cut every timed measurement of that query
      var warmFallback = 0
      var unmeasured = 0
      val results = names.map { n =>
        val timed = passes.flatMap(_.get(n))
        if (timed.nonEmpty) n -> timed.min
        else warm.get(n) match {
          case Some(w) => warmFallback += 1; n -> w
          // never emit NaN (invalid JSON): a query the budget cut from
          // BOTH warmup and every timed pass reads as 0 + "unmeasured"
          case None => unmeasured += 1; n -> 0.0
        }
      }
      val contended = contendedIn || nFailed > 0
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
      val meta =
        s""""pass_totals":$pts,"retried":$retried,""" +
          s""""contended":$contended,"failures":$nFailed,""" +
          f""""load_avg":[$load0%.1f,$load1%.1f],""" +
          s""""timed_passes":${passes.size},""" +
          s""""warm_fallback":$warmFallback,"unmeasured":$unmeasured,""" +
          s""""partial":$partial"""
      val line =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
          meta +
          f""","budget_sec":$budgetSec%.0f,"elapsed_sec":${elapsed()}%.0f""" +
          s""","artifact_build_sec":$artifacts,"sf":"$sfDir"}"""
      // The driver's round artifact keeps only the LAST 2000 chars of
      // stdout (measured from BENCH_r05-r08: tail_len exactly 2000, with
      // sbt's ~80-char "[success]" epilogue inside it), so the ~4.5 KB
      // full record above can never survive intact — three rounds of
      // "parsed": null. The LAST line is therefore a compact twin that
      // fits the window WITH the full per-query map: keys are the digits
      // of the query's unique qNN id prefix, values are the per-query
      // min in centiseconds ("q_csec_by_id"). bench_out.json keeps the
      // full-precision long-form record.
      def compactLine(unitName: String, scale: Double): String = {
        val qsCompact = results.map { case (k, v) =>
          "\"" + k.drop(1).takeWhile(_ != '_') + "\":" +
            math.round(v * scale)
        }.mkString("{", ",", "}")
        val sfName = sfDir.split('/').last
        // compact meta only — artifact/budget detail lives in
        // bench_out.json; the 2000-char stdout tail is nearly full
        // (r12's line: 1803 chars)
        s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec",""" +
          s""""$unitName":$qsCompact,""" + meta +
          s""","sf":"$sfName","full_record":"bench_out.json"}"""
      }
      val cs = compactLine("q_csec_by_id", 100.0)
      // belt-and-braces: if the map ever outgrows the window, drop to
      // decisecond values rather than re-losing the record to truncation
      val compact = if (cs.length <= 1880) cs
        else compactLine("q_dsec_by_id", 10.0)
      (line, compact)
    }

    // ---- warmup (timed per query only as the last-resort fallback) ----
    // cap warmup at 45% of the budget: on a pathologically contended
    // host a degraded-warmup record still beats no record
    val warm = scala.collection.mutable.Map[String, Double]()
    var warmAborted = false
    names.foreach { n =>
      if (!warmAborted && elapsed() > 0.45 * budgetSec) {
        warmAborted = true
        System.err.println(f"[bench] warmup aborted at ${elapsed()}%.0f s " +
          s"(budget $budgetSec) — remaining queries run cold")
      }
      if (!warmAborted) warm(n) = force(n, sfDir)
    }
    failures.set(0) // only TIMED-pass failures taint the record
    snapshot = buildRecords(warm.toMap, Nil, Nil, retried = false,
      contendedIn = true, nFailed = 0, load1 = loadAvg(),
      partial = true)._2

    // ---- timed passes, budget-gated ----
    // a pass runs each query after a deadline check; a ballooning pass
    // aborts mid-way and keeps its partial floors (complete = false)
    def runPass(): (Map[String, Double], Boolean) = {
      cleanup()
      val acc = scala.collection.mutable.Map[String, Double]()
      var aborted = false
      names.foreach { n =>
        if (!aborted && remaining() < reserveSec) {
          aborted = true
          System.err.println(f"[bench] pass aborted at ${elapsed()}%.0f s " +
            s"— keeping ${acc.size}/${names.size} partial floors")
        }
        if (!aborted) acc(n) = force(n, sfDir)
      }
      (acc.toMap, !aborted)
    }

    val passes = scala.collection.mutable.ArrayBuffer[Map[String, Double]]()
    val completeTotals = scala.collection.mutable.ArrayBuffer[Double]()
    def pushPass(p: Map[String, Double], complete: Boolean,
        load1: Double, retried: Boolean, contendedIn: Boolean): Unit = {
      passes += p
      if (complete) completeTotals += p.values.sum
      snapshot = buildRecords(warm.toMap, passes.toSeq,
        completeTotals.toSeq, retried, contendedIn, failures.get(),
        load1, partial = true)._2
    }

    val (p1, p1done) = runPass()
    pushPass(p1, p1done, loadAvg(), retried = false, contendedIn = !p1done)

    // per-query time = min of 2 measured runs when the budget allows:
    // single runs showed up to ~15× run-to-run variance from GC/OS noise
    // on sub-second queries; min-of-N is the steady-state cost
    def fits(estimate: Double): Boolean =
      passFits(remaining(), estimate, reserveSec)
    val p1total = p1.values.sum
    if (p1done && fits(p1total)) {
      val (p2, p2done) = runPass()
      pushPass(p2, p2done, loadAvg(), retried = false,
        contendedIn = !p2done)
    } else if (p1done) System.err.println(
      f"[bench] skipping pass 2: ${remaining()}%.0f s left < " +
        f"1.15×$p1total%.0f+$reserveSec%.0f")

    // contention gate (BASELINE.md's judgeability rule): complete-pass
    // totals that disagree by more than 20% mean a co-scheduled process
    // inflated one pass — run a THIRD pass (budget permitting) and take
    // min-of-3; if even the two closest totals still disagree >20%,
    // say so via "contended": true rather than publishing a silently-
    // bad number.
    var retried = false
    if (completeTotals.size >= 2 &&
        disagree(completeTotals(0), completeTotals(1))) {
      retried = true
      if (fits(completeTotals.min)) {
        System.err.println("[bench] pass totals disagree >20% — " +
          "contended host suspected, running a third pass")
        val (p3, p3done) = runPass()
        pushPass(p3, p3done, loadAvg(), retried = true,
          contendedIn = !p3done)
      } else System.err.println(
        f"[bench] contended but no budget for a third pass " +
          f"(${remaining()}%.0f s left) — publishing min-of-2 as contended")
    }

    val load1 = loadAvg()
    val bestTwo = completeTotals.sorted.take(2)
    val contended =
      if (bestTwo.size >= 2) disagree(bestTwo(0), bestTwo(1))
      else true // fewer than 2 complete passes: floors unconfirmed
    val (line, compact) = buildRecords(warm.toMap, passes.toSeq,
      completeTotals.toSeq, retried, contended, failures.get(), load1,
      partial = false)
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
    println(compact)
    finished = true
  }
}
