package graft.operators

import scala.jdk.CollectionConverters._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  /** Independent in-memory replica of the same fixpoint: 12-dp-rounded
    * contributions summed exactly (BigDecimal), 9-dp-rounded damped
    * update; with `dangling` the sink mass (12-dp DECIMAL sum over one
    * double division by N) joins the damped term. */
  private def brute(
      edges: Seq[(Long, Long)], iters: Int, d: Double,
      dangling: Boolean = false): Map[Long, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes =
      (if (dangling) e.flatMap(p => Seq(p._1, p._2)) else e.map(_._1))
        .distinct.sorted
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dmn =
        if (!dangling) 0.0
        else nodes.filterNot(out.contains)
          .map(v => BigDecimal(r(v))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / n
      val sums = e
        .map { case (s, t) =>
          t -> BigDecimal(r(s) / out(s).toDouble)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map { v =>
        val s = sums.getOrElse(v, BigDecimal(0)).toDouble
        val inner = if (dangling) s + dmn else s
        v -> BigDecimal((1.0 - d) / n + d * inner)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r
  }

  // undirected square with one diagonal, fed as both directions
  private val undirected = Seq(
    1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L)
  private val edges = undirected ++ undirected.map(_.swap)

  test("pageRank matches an independent in-memory fixpoint") {
    import spark.implicits._
    val got = Graph.pageRank(
        edges.toDF("src", "dst").repartition(3), "src", "dst", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === brute(edges, 8, 0.85))
  }

  test("pageRank ranks the higher-degree nodes of the diagonal first") {
    import spark.implicits._
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 8)
      .collect().map(_.getLong(0)).toSeq
    // 1 and 3 have degree 3; 2 and 4 degree 2
    assert(got.take(2).toSet === Set(1L, 3L))
  }

  // directed triangle with a sink: node 3 has in-edges, no out-edge
  private val directed = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L)

  test("pageRank fails loudly on a sink node without the correction") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(directed.toDF("src", "dst"), "src", "dst", iters = 3)
    }
    assert(ex.getMessage.contains("rank mass"), ex.getMessage)
  }

  test("danglingCorrection matches the replica and conserves mass") {
    import spark.implicits._
    val got = Graph.pageRank(directed.toDF("src", "dst").repartition(3),
        "src", "dst", iters = 6, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === brute(directed, 6, 0.85, dangling = true))
    // the sink's mass is recycled, not leaked
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    // and the sink itself holds rank (it receives from 1 and 2)
    assert(got(3L) > got(2L))
  }

  test("danglingCorrection on a sink-free graph equals the cheap path") {
    import spark.implicits._
    val plain = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val corrected = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        4, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(plain === corrected)
  }

  test("pageRank mass stays ~1 and is partitioning-invariant") {
    import spark.implicits._
    val a = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val b = Graph.pageRank(
        edges.toDF("src", "dst").repartition(7), "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(a === b)
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-6)
  }

  // ------------------------------------------- distributed rank table

  test("distributedRanks is bit-identical to the driver loop (undirected)") {
    import spark.implicits._
    val driver = Graph.pageRank(
        edges.toDF("src", "dst").repartition(3), "src", "dst", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val dist = Graph.pageRank(
        edges.toDF("src", "dst").repartition(3), "src", "dst", iters = 8,
        distributedRanks = Some(true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(dist === driver)
  }

  test("distributedRanks is bit-identical to the driver loop (dangling)") {
    import spark.implicits._
    val driver = Graph.pageRank(directed.toDF("src", "dst"), "src", "dst",
        iters = 6, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val dist = Graph.pageRank(directed.toDF("src", "dst"), "src", "dst",
        iters = 6, danglingCorrection = true, distributedRanks = Some(true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(dist === driver)
  }

  test("distributedRanks parity holds on a 300-node seeded random graph") {
    import spark.implicits._
    // deterministic pseudo-random digraph with sinks: every node gets
    // 1-4 out-edges except multiples of 17 (pure sinks)
    val rnd = new scala.util.Random(42)
    val g = (0L until 300L).flatMap { s =>
      if (s % 17 == 0) Seq.empty
      else (0 until (1 + rnd.nextInt(4))).map(_ => s -> rnd.nextInt(300).toLong)
    }.distinct
    val driver = Graph.pageRank(g.toDF("src", "dst").repartition(5),
        "src", "dst", iters = 7, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val dist = Graph.pageRank(g.toDF("src", "dst").repartition(5),
        "src", "dst", iters = 7, danglingCorrection = true,
        distributedRanks = Some(true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(dist === driver)
    assert(math.abs(dist.map(_._2).sum - 1.0) < 1e-6)
  }

  test("distributed loop performs zero driver-side collects") {
    import spark.implicits._
    // CopyOnWriteArrayList: iteration (the .asScala.contains polls
    // below) is snapshot-safe against the listener thread's concurrent
    // adds — a synchronizedList would CME without external locking
    val recorded =
      new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { recorded.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // drain the bus first: a collect() from a PREVIOUS test can be
      // delivered after this listener registers — flush with a
      // sentinel, then clear, so the measured region starts clean
      spark.range(1).collect()
      val drain = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!recorded.asScala.contains("collect") &&
          System.nanoTime() < drain) Thread.sleep(50)
      Thread.sleep(200)
      recorded.clear()
      // distributed path: build+loop runs inside; the returned frame is
      // NOT collected here, so any "collect" would come from the loop
      Graph.pageRank(directed.toDF("src", "dst"), "src", "dst", iters = 4,
        danglingCorrection = true, distributedRanks = Some(true))
      // sentinel: the listener bus is FIFO, so once the sentinel's
      // "collect" arrives every loop event has been delivered
      spark.range(1).collect()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!recorded.asScala.contains("collect") &&
          System.nanoTime() < deadline) Thread.sleep(50)
      val collects = recorded.asScala.count(_ == "collect")
      assert(collects === 1, s"loop collected: ${recorded.asScala.toList}")

      // contrast: the driver-resident loop collects its node and
      // dangling lists up front (Dataset collects the listener sees;
      // the per-round merge is an RDD action) — proving the listener
      // records driver-body collects, so the distributed loop's zero
      // above is not a false negative
      recorded.clear()
      Graph.pageRank(directed.toDF("src", "dst"), "src", "dst", iters = 4,
        danglingCorrection = true)
      val deadline2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (recorded.asScala.count(_ == "collect") < 2 &&
          System.nanoTime() < deadline2) Thread.sleep(50)
      assert(recorded.asScala.count(_ == "collect") >= 2)
    } finally spark.listenerManager.unregister(listener)
  }

  // ----------------------------------------------- epsilon convergence

  /** Replica round-by-round: rank maps after each round (index 0 = the
    * uniform start), for epsilon-stop expectations. */
  private def bruteRounds(
      edges: Seq[(Long, Long)], iters: Int, d: Double,
      dangling: Boolean): Seq[Map[Long, Double]] =
    (0 to iters).map(r =>
      if (r == 0) {
        val e = edges.distinct
        val nodes =
          (if (dangling) e.flatMap(p => Seq(p._1, p._2)) else e.map(_._1))
            .distinct
        nodes.map(_ -> 1.0 / nodes.size).toMap
      } else brute(edges, r, d, dangling))

  test("epsilon stop: inclusive <= boundary, driver and distributed") {
    import spark.implicits._
    val rounds = bruteRounds(directed, 10, 0.85, dangling = true)
    val deltas = (1 to 10).map(r =>
      rounds(r).map { case (k, v) => math.abs(v - rounds(r - 1)(k)) }.max)
    // eps exactly equal to round-3's delta: the inclusive boundary must
    // stop at the FIRST round whose delta <= eps
    val eps = deltas(2) // delta after round 3 (0-indexed seq of rounds 1..10)
    val stopRound = (1 to 10).find(r => deltas(r - 1) <= eps).get
    assert(rounds(stopRound) !== rounds(stopRound + 1),
      "degenerate fixture: ranks already stationary")
    for (dist <- Seq(false, true)) {
      val got = Graph.pageRank(directed.toDF("src", "dst"), "src", "dst",
          iters = 10, danglingCorrection = true, distributedRanks = Some(dist),
          epsilon = Some(eps))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === rounds(stopRound), s"distributedRanks=$dist")
    }
  }

  // ------------------------------------------- personalized PageRank

  /** In-memory PPR replica: reset mass on the seed distribution,
    * dangling mass riding the same distribution, same 12-dp/9-dp
    * rounding devices. */
  private def brutePpr(
      edges: Seq[(Long, Long)], seedSet: Set[Long], iters: Int,
      d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val k = nodes.count(seedSet)
    val rv = nodes.map(v =>
      v -> (if (seedSet(v)) 1.0 / k else 0.0)).toMap
    var r = rv
    (1 to iters).foreach { _ =>
      val dmt = nodes.filterNot(out.contains)
        .map(v => BigDecimal(r(v))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val sums = e
        .map { case (u, v) =>
          v -> BigDecimal(r(u) / out(u).toDouble)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map { v =>
        val s = sums.getOrElse(v, BigDecimal(0)).toDouble
        v -> BigDecimal((1.0 - d) * rv(v) + d * (s + dmt * rv(v)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r
  }

  test("personalizedPageRank matches the replica and conserves mass") {
    import spark.implicits._
    val got = Graph.personalizedPageRank(
        directed.toDF("src", "dst").repartition(3), "src", "dst",
        Seq(1L).toDF("node"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === brutePpr(directed, Set(1L), 6, 0.85))
    // sink mass recycles to the seed: total mass stays ~1
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    // the seed outranks everything it feeds only indirectly
    assert(got(1L) > got(2L))
  }

  test("personalizedPageRank parity on the 300-node random digraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val g = (0L until 300L).flatMap { s =>
      if (s % 17 == 0) Seq.empty
      else (0 until (1 + rnd.nextInt(4))).map(_ => s -> rnd.nextInt(300).toLong)
    }.distinct
    val seeds = (0L until 300L by 10).toSet
    val got = Graph.personalizedPageRank(
        g.toDF("src", "dst").repartition(5), "src", "dst",
        seeds.toSeq.toDF("node"), iters = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === brutePpr(g, seeds, 7, 0.85))
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("PPR auto-selects the loop body by node count; both gate " +
    "sides bit-identical") {
    import spark.implicits._
    val confKey = "spark.graft.graph.maxDriverRankNodes"
    try {
      spark.conf.set(confKey, "2") // 7 nodes > 2 → the DISTRIBUTED body
      val viaDist = Graph.personalizedPageRank(
          directed.toDF("src", "dst"), "src", "dst",
          Seq(1L, 3L).toDF("node"), iters = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      spark.conf.set(confKey, "1000") // 7 <= 1000 → the DRIVER body
      val viaDriver = Graph.personalizedPageRank(
          directed.toDF("src", "dst"), "src", "dst",
          Seq(1L, 3L).toDF("node"), iters = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // the triangle-envelope discipline: crossing the gate must never
      // change the answer — and both match the in-memory replica
      assert(viaDist === viaDriver)
      assert(viaDriver.map(t => t._1 -> t._2).toMap ===
        brutePpr(directed, Set(1L, 3L), 5, 0.85))
    } finally spark.conf.unset(confKey)
  }

  test("PPR with all nodes as seeds equals uniform dangling PageRank") {
    import spark.implicits._
    // r(v) = 1/N uniformly and dm·r = dm/N, so the updates coincide —
    // up to one ulp from (1−d)·(1/N) vs (1−d)/N association, which
    // the 9-dp round absorbs (deterministically on this fixed
    // fixture). A consistency pin tying the two operators together.
    val allNodes = directed.flatMap(p => Seq(p._1, p._2)).distinct
    val ppr = Graph.personalizedPageRank(directed.toDF("src", "dst"),
        "src", "dst", allNodes.toDF("node"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val uniform = Graph.pageRank(directed.toDF("src", "dst"), "src", "dst",
        iters = 6, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(ppr === uniform)
  }

  test("personalizedPageRank rejects seed sets disjoint from the graph") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(directed.toDF("src", "dst"),
        "src", "dst", Seq(99L).toDF("node"), iters = 3)
    }
    assert(ex.getMessage.contains("seed"), ex.getMessage)
  }

  test("personalized loop performs zero driver-side collects") {
    import spark.implicits._
    // CopyOnWriteArrayList: iteration (the .asScala.contains polls
    // below) is snapshot-safe against the listener thread's concurrent
    // adds — a synchronizedList would CME without external locking
    val recorded =
      new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { recorded.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // drain stray events from previous tests (see the distributed
      // listener test), then measure
      spark.range(1).collect()
      val drain = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!recorded.asScala.contains("collect") &&
          System.nanoTime() < drain) Thread.sleep(50)
      Thread.sleep(200)
      recorded.clear()
      Graph.personalizedPageRank(directed.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), iters = 4, distributedRanks = Some(true))
      spark.range(1).collect() // FIFO sentinel
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!recorded.asScala.contains("collect") &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(recorded.asScala.count(_ == "collect") === 1,
        s"loop collected: ${recorded.asScala.toList}")
    } finally spark.listenerManager.unregister(listener)
  }

  // --------------------------------------------------------------- HITS

  /** In-memory Jacobi-HITS replica: 12-dp DECIMAL gathers, exact L1
    * totals, 9-dp rounded normalized scores. */
  private def bruteHits(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size.toDouble
    var auth = nodes.map(_ -> 1.0 / n).toMap
    var hub = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val ar = nodes.map(v =>
        v -> e.filter(_._2 == v).map(p => r12(hub(p._1))).sum).toMap
      val hr = nodes.map(v =>
        v -> e.filter(_._1 == v).map(p => r12(auth(p._2))).sum).toMap
      val ta = ar.values.sum.toDouble
      val th = hr.values.sum.toDouble
      auth = nodes.map(v => v -> r9(ar(v).toDouble / ta)).toMap
      hub = nodes.map(v => v -> r9(hr(v).toDouble / th)).toMap
    }
    nodes.map(v => v -> (auth(v), hub(v))).toMap
  }

  test("hits matches the replica; sink hubs and source auths are zero") {
    import spark.implicits._
    val got = Graph.hits(directed.toDF("src", "dst").repartition(3),
        "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got === bruteHits(directed, 5))
    // L1-normalized: each score vector sums to ~1
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-6)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-6)
    // node 3 is a pure sink (best authority, zero hub); 1 a pure source
    assert(got(3L)._2 === 0.0)
    assert(got(1L)._1 === 0.0)
    assert(got(3L)._1 > got(2L)._1)
  }

  test("hits rounds run the FUSED single-gather plan: stage budget " +
    "per round is half the two-gather form's") {
    import spark.implicits._
    val group = s"graft-hits-fused-${System.nanoTime()}"
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id")) {
          jobs.incrementAndGet()
          stages.addAndGet(js.stageInfos.size)
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(jl)
    spark.sparkContext.setJobGroup(group, "hits fused-gather test")
    try {
      val got = Graph.hits(directed.toDF("src", "dst").repartition(3),
          "src", "dst", iters = 8, distributedScores = Some(true))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      assert(got === bruteHits(directed, 8))
      // the collect above means every job has ENDED; drain the async
      // bus deterministically instead of a flaky fixed sleep
      org.apache.spark.graftshim.drainListenerBus(spark.sparkContext)
      // each round is ONE localCheckpoint job (fused: a single
      // score-join + a single two-sum aggregate feed it); the
      // two-gather form submitted the same jobs but planned TWO
      // score joins + TWO aggregates per round — about twice the
      // stages. Fused measures ~6 stages/round; the bound flags any
      // regression back to the split plan (~11/round) while leaving
      // AQE headroom.
      assert(jobs.get() >= 8, s"jobs = ${jobs.get()}")
      assert(stages.get() <= jobs.get() * 8,
        s"stages = ${stages.get()} over ${jobs.get()} jobs")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(jl)
    }
  }

  test("hits parity on the 300-node random digraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val g = (0L until 300L).flatMap { s =>
      if (s % 17 == 0) Seq.empty
      else (0 until (1 + rnd.nextInt(4))).map(_ => s -> rnd.nextInt(300).toLong)
    }.distinct
    val got = Graph.hits(g.toDF("src", "dst").repartition(5),
        "src", "dst", iters = 6)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got === bruteHits(g, 6))
  }

  test("hits auto-selects the loop body by node count; both gate " +
    "sides bit-identical") {
    import spark.implicits._
    val confKey = "spark.graft.graph.maxDriverRankNodes"
    try {
      spark.conf.set(confKey, "2") // 7 nodes > 2 → the DISTRIBUTED body
      val viaDist = Graph.hits(directed.toDF("src", "dst"), "src",
          "dst", iters = 5)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      spark.conf.set(confKey, "1000") // 7 <= 1000 → the DRIVER body
      val viaDriver = Graph.hits(directed.toDF("src", "dst"), "src",
          "dst", iters = 5)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      // the triangle-envelope discipline: crossing the gate must never
      // change the answer — and both match the in-memory replica
      assert(viaDist === viaDriver)
      assert(viaDriver.map(t => t._1 -> (t._2, t._3)).toMap ===
        bruteHits(directed, 5))
    } finally spark.conf.unset(confKey)
  }

  test("epsilon stop: iters cap binds when epsilon is never reached") {
    import spark.implicits._
    for (dist <- Seq(false, true)) {
      val capped = Graph.pageRank(directed.toDF("src", "dst"), "src", "dst",
          iters = 3, danglingCorrection = true, distributedRanks = Some(dist),
          epsilon = Some(1e-18))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(capped === brute(directed, 3, 0.85, dangling = true),
        s"distributedRanks=$dist")
    }
  }

  // --------------------------------------------- HITS epsilon stop

  /** Round-by-round HITS replica for epsilon expectations. */
  private def bruteHitsRounds(
      edges: Seq[(Long, Long)],
      iters: Int): Seq[Map[Long, (Double, Double)]] = {
    val nodes = edges.distinct.flatMap(p => Seq(p._1, p._2)).distinct
    val n = nodes.size.toDouble
    val r0 = nodes.map(v => v -> (1.0 / n, 1.0 / n)).toMap
    (0 to iters).map(r => if (r == 0) r0 else bruteHits(edges, r))
  }

  test("hits epsilon: inclusive <= boundary stops at the first round") {
    import spark.implicits._
    val rounds = bruteHitsRounds(directed, 8)
    val deltas = (1 to 8).map { r =>
      rounds(r).map { case (k, (a, h)) =>
        math.max(math.abs(a - rounds(r - 1)(k)._1),
          math.abs(h - rounds(r - 1)(k)._2))
      }.max
    }
    // eps exactly equal to a mid-round delta: the inclusive boundary
    // must stop at the FIRST round whose delta <= eps
    val eps = deltas(1) // delta of round 2
    val stopRound = (1 to 8).find(r => deltas(r - 1) <= eps).get
    assert(rounds(stopRound) !== rounds(stopRound + 1),
      "degenerate fixture: scores already stationary")
    val got = Graph.hits(directed.toDF("src", "dst"), "src", "dst",
        iters = 8, epsilon = Some(eps))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got === rounds(stopRound))
  }

  test("hits epsilon: iters cap binds when epsilon is never reached") {
    import spark.implicits._
    val got = Graph.hits(directed.toDF("src", "dst"), "src", "dst",
        iters = 3, epsilon = Some(1e-18))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got === bruteHits(directed, 3))
  }

  test("hits rejects an empty graph loudly") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Graph.hits(Seq.empty[(Long, Long)].toDF("src", "dst"),
        "src", "dst", iters = 2)
    }
    assert(ex.getMessage.contains("no nodes"), ex.getMessage)
  }

  // ------------------------------------------- weighted PageRank

  /** Weighted replica: contribution r(s)·w/Σw, out-weight totals as
    * 12-dp DECIMAL sums, same dangling + 9-dp update devices. */
  private def bruteWeighted(
      edges: Seq[(Long, Long, Double)], iters: Int,
      d: Double): Map[Long, Double] = {
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val wout = edges.groupBy(_._1).view
      .mapValues(es => es.map(e => r12(e._3)).sum.toDouble).toMap
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dmn = nodes.filterNot(wout.contains)
        .map(v => r12(r(v))).sum.toDouble / n
      val sums = edges
        .map { case (s, t, w) => t -> r12(r(s) * w / wout(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map { v =>
        val s = sums.getOrElse(v, BigDecimal(0)).toDouble
        v -> BigDecimal((1.0 - d) / n + d * (s + dmn))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r
  }

  private val weighted = Seq(
    (1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 2.0), (2L, 1L, 0.5))

  test("weighted pageRank matches the replica and conserves mass") {
    import spark.implicits._
    for (dist <- Seq(false, true)) {
      val got = Graph.pageRank(
          weighted.toDF("src", "dst", "w").repartition(3), "src", "dst",
          iters = 6, danglingCorrection = true,
          distributedRanks = Some(dist), weightCol = Some("w"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === bruteWeighted(weighted, 6, 0.85),
        s"distributedRanks=$dist")
      assert(math.abs(got.values.sum - 1.0) < 1e-6)
      // node 2 receives the heavy 3.0 edge: it outranks node 1
      assert(got(2L) > got(1L))
    }
  }

  test("uniform weights reproduce the unweighted ranks bit-for-bit") {
    import spark.implicits._
    val uni = directed.map { case (s, t) => (s, t, 1.0) }
    val plain = Graph.pageRank(directed.toDF("src", "dst"), "src", "dst",
        iters = 6, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val w = Graph.pageRank(uni.toDF("src", "dst", "w"), "src", "dst",
        iters = 6, danglingCorrection = true, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(w === plain)
  }

  test("parallel edges combine weights; uniform-weight PPR = plain PPR") {
    import spark.implicits._
    // two parallel (1,2) half-weight edges combine to the single
    // full-weight edge — same fixpoint
    val split = Seq((1L, 2L, 1.5), (1L, 2L, 1.5), (1L, 3L, 1.0),
      (2L, 3L, 2.0), (2L, 1L, 0.5))
    val got = Graph.pageRank(split.toDF("src", "dst", "w"), "src", "dst",
        iters = 5, danglingCorrection = true, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val whole = Graph.pageRank(weighted.toDF("src", "dst", "w"),
        "src", "dst", iters = 5, danglingCorrection = true,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got === whole)
    // weighted PPR with uniform weights = unweighted PPR
    val uni = directed.map { case (s, t) => (s, t, 1.0) }
    val pprU = Graph.personalizedPageRank(uni.toDF("src", "dst", "w"),
        "src", "dst", Seq(1L).toDF("node"), iters = 5,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val pprP = Graph.personalizedPageRank(directed.toDF("src", "dst"),
        "src", "dst", Seq(1L).toDF("node"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(pprU === pprP)
  }

  // --------------------------------------------- label propagation

  /** In-memory Jacobi LPA replica: most frequent in-neighbor label,
    * min label on ties, keep-own when no in-edges. */
  private def bruteLpa(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var lbl = nodes.map(v => v -> v).toMap
    (1 to iters).foreach { _ =>
      val inc = e.groupBy(_._2)
      lbl = nodes.map { v =>
        inc.get(v) match {
          case None => v -> lbl(v)
          case Some(es) =>
            val cnt = es.map(p => lbl(p._1))
              .groupBy(identity).view.mapValues(_.size).toMap
            v -> cnt.toSeq.map { case (l, c) => (-c, l) }.min._2
        }
      }.toMap
    }
    lbl
  }

  test("labelPropagation matches the replica on two joined triangles") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the single bridge 3-4
    val tri = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L,
      6L -> 4L, 3L -> 4L)
    val both = tri ++ tri.map(_.swap)
    val got = Graph.labelPropagation(both.toDF("src", "dst").repartition(3),
        "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bruteLpa(both, 5))
  }

  test("labelPropagation stops at the stationary fixpoint, result identical to full run") {
    import spark.implicits._
    // two disjoint triangles converge to their min labels in 2 rounds;
    // with the fixpoint stop, iters=100 must (a) answer identically to
    // the 100-round replica and (b) run a bounded number of Spark jobs
    // (each LPA round costs a handful; 100 live rounds would cost
    // hundreds)
    val tri = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 7L -> 8L, 8L -> 9L,
      9L -> 7L)
    val both = tri ++ tri.map(_.swap)
    // suites share the SparkContext and run in parallel, so count ONLY
    // this test's jobs: the job group is thread-local and inherited by
    // every job the LPA loop (and its localCheckpoints) submits
    val group = s"graft-lpa-fixpoint-${System.nanoTime()}"
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          counter.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(jl)
    spark.sparkContext.setJobGroup(group, "lpa fixpoint test")
    try {
      val got = Graph.labelPropagation(both.toDF("src", "dst"),
          "src", "dst", iters = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bruteLpa(both, 100))
      assert(got.values.toSet === Set(1L, 7L))
      // listener events are async — drain the bus deterministically
      org.apache.spark.graftshim.drainListenerBus(spark.sparkContext)
      // build+3 live rounds (the changed-nothing round included) is
      // ~20 jobs; 100 live rounds would be several hundred
      assert(counter.get() < 60, s"jobs = ${counter.get()}")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(jl)
    }
  }

  test("labelPropagation parity on the 300-node random digraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val g = (0L until 300L).flatMap { s =>
      if (s % 17 == 0) Seq.empty
      else (0 until (1 + rnd.nextInt(4))).map(_ => s -> rnd.nextInt(300).toLong)
    }.distinct
    val got = Graph.labelPropagation(g.toDF("src", "dst").repartition(5),
        "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bruteLpa(g, 4))
  }

  // ------------------------------------------------ graph artifact

  test("persisted graph artifact: load-then-iterate == inline-build") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_gt_spec").toString
    try {
      Graph.writeGraphTable(directed.toDF("src", "dst"), "src", "dst",
        s"$dir/d")
      val gt = Graph.readGraphTable(spark, s"$dir/d")
      assert(gt.numNodes === 3 && gt.numSrcNodes === 2 &&
        gt.numEdges === 3 && gt.numDangling === 1)
      // PageRank (both bodies), PPR, HITS, LPA all answer identically
      // from the artifact and from the inline build
      for (dist <- Seq(false, true)) {
        val art = gt.pageRank(iters = 5, danglingCorrection = true,
            distributedRanks = Some(dist))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
        val inl = Graph.pageRank(directed.toDF("src", "dst"), "src",
            "dst", iters = 5, danglingCorrection = true,
            distributedRanks = Some(dist))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
        assert(art === inl, s"distributedRanks=$dist")
      }
      val pprA = gt.personalizedPageRank(Seq(1L).toDF("node"), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      val pprI = Graph.personalizedPageRank(directed.toDF("src", "dst"),
          "src", "dst", Seq(1L).toDF("node"), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      assert(pprA === pprI)
      val hA = gt.hits(iters = 4).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      val hI = Graph.hits(directed.toDF("src", "dst"), "src", "dst",
          iters = 4).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      assert(hA === hI)
      val lA = gt.labelPropagation(iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val lI = Graph.labelPropagation(directed.toDF("src", "dst"),
          "src", "dst", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      assert(lA === lI)
      // the artifact carries the sink count: the cheap path fails fast
      val ex = intercept[IllegalArgumentException](gt.pageRank(iters = 2))
      assert(ex.getMessage.contains("rank mass"), ex.getMessage)
    } finally
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
  }

  test("weighted artifact roundtrips wout exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_gt_specw").toString
    try {
      Graph.writeGraphTable(weighted.toDF("src", "dst", "w"), "src",
        "dst", s"$dir/w", weightCol = Some("w"))
      val gt = Graph.readGraphTable(spark, s"$dir/w")
      val art = gt.pageRank(iters = 6, danglingCorrection = true)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(art === bruteWeighted(weighted, 6, 0.85))
    } finally
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
  }

  // ------------------------------------------------ body auto-switch

  test("pageRank auto-selects the loop body by node count") {
    import spark.implicits._
    // CopyOnWriteArrayList: iteration (the .asScala.contains polls
    // below) is snapshot-safe against the listener thread's concurrent
    // adds — a synchronizedList would CME without external locking
    val recorded =
      new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { recorded.add(funcName); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val confKey = "spark.graft.graph.maxDriverRankNodes"
    try {
      // drain stray events (see the distributed listener test)
      spark.range(1).collect()
      val drain = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!recorded.asScala.contains("collect") &&
          System.nanoTime() < drain) Thread.sleep(50)
      Thread.sleep(200)

      // 3 nodes > threshold 2 → the DISTRIBUTED body (zero collects)
      spark.conf.set(confKey, "2")
      recorded.clear()
      val viaDist = Graph.pageRank(directed.toDF("src", "dst"), "src",
          "dst", iters = 4, danglingCorrection = true)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
      spark.range(1).collect() // FIFO sentinel
      val d1 = System.nanoTime() + 30L * 1000 * 1000 * 1000
      // 2 collects are OURS (the rank readback + the sentinel); the
      // loop body itself must contribute zero
      while (recorded.asScala.count(_ == "collect") < 2 &&
          System.nanoTime() < d1) Thread.sleep(50)
      assert(recorded.asScala.count(_ == "collect") === 2,
        s"auto(distributed) collected: ${recorded.asScala.toList}")

      // 3 nodes <= threshold 1000 → the DRIVER body: node + dangling
      // list collects plus our readback = 3 Dataset collects (the
      // per-round merge is an RDD action the listener doesn't see) —
      // one MORE than the distributed body's 2, so selection is still
      // listener-discriminable
      spark.conf.set(confKey, "1000")
      recorded.clear()
      val viaDriver = Graph.pageRank(directed.toDF("src", "dst"), "src",
          "dst", iters = 4, danglingCorrection = true)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val d2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (recorded.asScala.count(_ == "collect") < 3 &&
          System.nanoTime() < d2) Thread.sleep(50)
      assert(recorded.asScala.count(_ == "collect") >= 3)

      // the triangle-envelope discipline: crossing the gate must never
      // change the answer — both auto-selected bodies bit-identical
      assert(viaDist.toSeq === viaDriver.toSeq)
    } finally {
      spark.conf.unset(confKey)
      spark.listenerManager.unregister(listener)
    }
  }

  // ------------- structural tier: triangles / clustering coeff / k-core

  /** Seeded random simple graph, returned as the symmetric
    * double-edged feed. */
  private def randomSym(n: Int, m: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val pairs = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
    while (pairs.size < m) {
      val a = rnd.nextInt(n); val b = rnd.nextInt(n)
      if (a != b)
        pairs += ((math.min(a, b).toLong, math.max(a, b).toLong))
    }
    pairs.toSeq ++ pairs.toSeq.map(_.swap)
  }

  /** Per-node triangle counts by direct neighborhood intersection —
    * independent of the engine's degree orientation. */
  private def bruteTriangles(sym: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    adj.map { case (v, nb) =>
      v -> nb.toSeq.sorted.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }.toLong
    }
  }

  /** Jacobi peel replica (the k-core is unique, so the schedule does
    * not matter — this mirrors the engine's simultaneous removal). */
  private def bruteKCore(sym: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = sym.toSet
    var changed = true
    while (changed && es.nonEmpty) {
      val deg = es.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  test("triangleCounts matches neighborhood intersection on a random graph") {
    import spark.implicits._
    val sym = randomSym(40, 150, seed = 7L)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      val got = gt.triangleCounts().collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val tri = bruteTriangles(sym)
      assert(got.keySet === deg.keySet)
      got.foreach { case (v, (d, t)) =>
        assert(d === deg(v), s"deg of $v")
        assert(t === tri(v), s"tri of $v")
      }
      // each triangle is credited to exactly its 3 corners
      assert(got.values.map(_._2).sum % 3 === 0)
    } finally gt.unpersist()
  }

  test("wedge family: the size-gated broadcast close and the " +
      "shuffle_hash form are bit-identical") {
    import spark.implicits._
    val sym = randomSym(40, 150, seed = 7L)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    val pairs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L),
      (2L, 11L), (4L, 12L), (1L, 12L), (4L, 13L)).toDF("c", "p")
    val key = "spark.graft.graph.wedgeBroadcastMaxRows"
    def runAll() = (
      gt.triangleCounts().collect().toSeq,
      gt.edgeJaccard().collect().toSeq,
      gt.adamicAdar(maxDegree = 10).collect().toSeq,
      Graph.bipartiteProject(pairs, "c", "p", maxRightDegree = 3)
        .orderBy("src", "dst").collect().toSeq)
    try {
      // force the wedge algorithm: under the default auto selector
      // these tiny graphs resolve to csr, which ignores this gate
      spark.conf.set("spark.graft.graph.triangleAlgo", "wedge")
      spark.conf.set(key, "0") // every edge count exceeds the gate
      val viaShuffle = runAll()
      spark.conf.unset(key) // default gate: these tiny graphs broadcast
      val viaBroadcast = runAll()
      assert(viaBroadcast === viaShuffle)
    } finally {
      spark.conf.unset("spark.graft.graph.triangleAlgo")
      spark.conf.unset(key)
      gt.unpersist()
    }
  }

  test("triangle algo: csr (grouped-adjacency intersect) is " +
      "bit-identical to the wedge stream, both gate sides") {
    import spark.implicits._
    val sym = randomSym(40, 150, seed = 11L)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    val algoKey = "spark.graft.graph.triangleAlgo"
    val gateKey = "spark.graft.graph.wedgeBroadcastMaxRows"
    def runBoth() = (
      gt.triangleCounts().collect().toSeq,
      gt.clusteringCoefficient().collect().toSeq,
      gt.edgeJaccard().collect().toSeq)
    try {
      val viaAuto = runBoth() // default: auto resolves to csr here
      spark.conf.set(algoKey, "wedge")
      val viaWedge = runBoth() // forced wedge, small-graph device
      spark.conf.set(gateKey, "0")
      val viaWedgeBig = runBoth() // forced wedge, shuffle_hash form
      spark.conf.unset(gateKey)
      spark.conf.set(algoKey, "csr")
      val viaCsr = runBoth() // forced csr
      assert(viaCsr === viaAuto)
      assert(viaCsr === viaWedge)
      assert(viaCsr === viaWedgeBig)
      spark.conf.set(algoKey, "nonsense")
      val e = intercept[IllegalArgumentException](gt.triangleCounts())
      assert(e.getMessage.contains(algoKey))
    } finally {
      spark.conf.unset(algoKey)
      spark.conf.unset(gateKey)
      gt.unpersist()
    }
  }

  test("clusteringCoefficient: complete graph 1.0, path graph 0.0") {
    import spark.implicits._
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)).toSeq
    val g1 = Graph.buildGraphTable(k4.toDF("src", "dst"), "src", "dst",
      assumeDistinct = true)
    try {
      val cc1 = g1.clusteringCoefficient().collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(cc1.values.forall(_ === 1.0), cc1)
    } finally g1.unpersist()
    val path = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val g2 = Graph.buildGraphTable(
      (path ++ path.map(_.swap)).toDF("src", "dst"), "src", "dst",
      assumeDistinct = true)
    try {
      val cc2 = g2.clusteringCoefficient().collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(cc2.values.forall(_ === 0.0), cc2)
    } finally g2.unpersist()
  }

  test("triangleCounts refuses a directed (sink-bearing) feed") {
    import spark.implicits._
    val gt = Graph.buildGraphTable(
      Seq(1L -> 2L).toDF("src", "dst"), "src", "dst")
    try {
      val e = intercept[IllegalArgumentException](gt.triangleCounts())
      assert(e.getMessage.contains("symmetric"))
    } finally gt.unpersist()
  }

  test("kCore matches the peel replica on a random graph") {
    import spark.implicits._
    val sym = randomSym(60, 220, seed = 11L)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      val k = 5
      val got = gt.kCore(k, maxRounds = 50).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bruteKCore(sym, k))
      // every surviving node really has in-core degree >= k
      assert(got.values.forall(_ >= k))
    } finally gt.unpersist()
  }

  test("triangleCountEstimate: keepPct=100 is exact; sampling is deterministic") {
    import spark.implicits._
    val sym = randomSym(40, 150, seed = 7L)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      val exactTotal = bruteTriangles(sym).values.sum / 3
      val full = gt.triangleCountEstimate(keepPct = 100, seed = 13L).head()
      assert(full.getLong(0) === sym.size / 2)
      assert(full.getLong(1) === exactTotal)
      assert(full.getDouble(2) === exactTotal.toDouble)
      // the seeded-md5 coin makes the sample partitioning-invariant
      val s1 = gt.triangleCountEstimate(keepPct = 30, seed = 5L).head()
      val gt2 = Graph.buildGraphTable(
        sym.toDF("src", "dst").repartition(7), "src", "dst",
        assumeDistinct = true)
      try {
        val s2 = gt2.triangleCountEstimate(keepPct = 30, seed = 5L).head()
        assert(s1.toSeq === s2.toSeq)
      } finally gt2.unpersist()
    } finally gt.unpersist()
  }

  test("bfsLevels matches an in-memory BFS; depth cap truncates") {
    import spark.implicits._
    val sym = randomSym(50, 120, seed = 19L)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = Seq(0L, 1L, 2L)
    def bruteBfs(cap: Int): Map[Long, Int] = {
      val lvl = scala.collection.mutable.Map[Long, Int]()
      var frontier = seeds.filter(adj.contains).toSet
      frontier.foreach(lvl(_) = 0)
      var d = 0
      while (d < cap && frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(adj(_)).filterNot(lvl.contains)
        frontier.foreach(lvl(_) = d)
      }
      lvl.toMap
    }
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      Seq(2, 10).foreach { cap =>
        val got = gt.bfsLevels(seeds.toDF("node"), maxDepth = cap)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got === bruteBfs(cap), s"cap $cap")
      }
    } finally gt.unpersist()
  }

  test("shortestPaths matches in-memory Bellman–Ford; round cap binds") {
    import spark.implicits._
    // deterministic integer costs 1..5 per directed pair
    val we = randomSym(50, 120, seed = 29L)
      .map { case (s, t) => (s, t, ((s * 31 + t * 17) % 5 + 1).toDouble) }
    val seeds = Seq(0L, 1L, 2L, 999L) // 999 absent from the graph
    def bruteSp(cap: Int): Map[Long, Double] = {
      val present = we.flatMap(e => Seq(e._1, e._2)).toSet
      var dist = seeds.filter(present).map(_ -> 0.0).toMap
      (1 to cap).foreach { _ =>
        val relax = we
          .flatMap { case (s, t, w) => dist.get(s).map(d => t -> (d + w)) }
          .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        dist = (dist.keySet ++ relax.keySet).map { n =>
          n -> math.min(dist.getOrElse(n, Double.MaxValue),
            relax.getOrElse(n, Double.MaxValue))
        }.toMap
      }
      dist
    }
    val gt = Graph.buildGraphTable(
      we.toDF("src", "dst", "w").repartition(3), "src", "dst",
      weightCol = Some("w"), assumeDistinct = true)
    try {
      Seq(0, 2, 20).foreach { cap => // 20 > diameter: early-stop ≡ cap
        val got = gt.shortestPaths(seeds.toDF("node"), maxRounds = cap)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got === bruteSp(cap), s"cap $cap")
      }
      // cheaper multi-hop detours must beat direct heavy edges: some
      // node's distance strictly improves between cap 1 and fixpoint
      assert(bruteSp(20).exists { case (n, d) =>
        bruteSp(1).get(n).exists(_ > d)
      })
    } finally gt.unpersist()
  }

  test("shortestPaths parity on a 300-node random weighted digraph") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    val we = (0 until 1200).map { _ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong,
        (rnd.nextInt(9) + 1).toDouble)
    }.distinct.filter(e => e._1 != e._2)
    val seeds = Seq(0L, 1L, 2L, 3L, 4L)
    def brute(cap: Int): Map[Long, Double] = {
      val present = we.flatMap(e => Seq(e._1, e._2)).toSet
      var dist = seeds.filter(present).map(_ -> 0.0).toMap
      (1 to cap).foreach { _ =>
        val relax = we
          .flatMap { case (s, t, w) => dist.get(s).map(d => t -> (d + w)) }
          .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        dist = (dist.keySet ++ relax.keySet).map { n =>
          n -> math.min(dist.getOrElse(n, Double.MaxValue),
            relax.getOrElse(n, Double.MaxValue))
        }.toMap
      }
      dist
    }
    val gt = Graph.buildGraphTable(
      we.toDF("src", "dst", "w").repartition(7), "src", "dst",
      weightCol = Some("w"), assumeDistinct = true)
    try {
      val got = gt.shortestPaths(seeds.toDF("node"), maxRounds = 50)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === brute(50)) // 50 > any shortest path's hop count
      assert(got.size > 250, s"reach should be near-total, got ${got.size}")
    } finally gt.unpersist()
  }

  test("loop twins auto-select by the maxDriverLoopEdges gate; both " +
    "sides bit-identical (label prop, k-core, BFS, shortest paths)") {
    import spark.implicits._
    val confKey = "spark.graft.graph.maxDriverLoopEdges"
    val sym = randomSym(60, 220, seed = 41L)
    // directed weighted feed for the Bellman–Ford pair (weights need
    // not be symmetric — the operator takes any weighted edge list)
    val we = sym.map { case (s, t) =>
      (s, t, ((s * 13 + t * 7) % 4 + 1).toDouble)
    }
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    val gtw = Graph.buildGraphTable(
      we.toDF("src", "dst", "w").repartition(3), "src", "dst",
      weightCol = Some("w"), assumeDistinct = true)
    val seeds = Seq(0L, 1L, 2L, 999L) // 999 absent from the graph
    try {
      def runAll() = (
        gt.labelPropagation(iters = 4).collect().map(_.toSeq).toSeq,
        gt.kCore(5, maxRounds = 50).collect().map(_.toSeq).toSeq,
        gt.bfsLevels(seeds.toDF("node"), maxDepth = 3)
          .collect().map(_.toSeq).toSeq,
        gtw.shortestPaths(seeds.toDF("node"), maxRounds = 4)
          .collect().map(_.toSeq).toSeq)
      spark.conf.set(confKey, "0") // edges > 0 → the DISTRIBUTED bodies
      val viaDist = runAll()
      spark.conf.unset(confKey) // default gate → the DRIVER twins
      val viaDriver = runAll()
      // the triangle-envelope discipline: crossing the gate must never
      // change the answer, for any of the four loop twins
      assert(viaDist._1 === viaDriver._1, "labelPropagation")
      assert(viaDist._2 === viaDriver._2, "kCore")
      assert(viaDist._3 === viaDriver._3, "bfsLevels")
      assert(viaDist._4 === viaDriver._4, "shortestPaths")
      assert(viaDriver._1.nonEmpty && viaDriver._2.nonEmpty &&
        viaDriver._3.nonEmpty && viaDriver._4.nonEmpty)
    } finally {
      spark.conf.unset(confKey)
      gt.unpersist()
      gtw.unpersist()
    }
  }

  test("edgeJaccard matches the adjacency-set replica") {
    import spark.implicits._
    val sym = randomSym(40, 150, seed = 23L)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = sym.filter(e => e._1 < e._2).map { case (u, v) =>
      val common = (adj(u) & adj(v)).size.toLong
      (u, v, adj(u).size.toLong, adj(v).size.toLong, common,
        common.toDouble / (adj(u).size + adj(v).size - common))
    }.toSet
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      val got = gt.edgeJaccard().collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSet
      assert(got === exp)
    } finally gt.unpersist()
  }

  test("adamicAdar matches the adjacency-set replica, hub cap applied") {
    import spark.implicits._
    val sym = randomSym(40, 150, seed = 29L)
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = sym.toSet
    val cap = 9 // excludes some centers of this graph (max deg ~12)
    assert(adj.values.exists(_.size > cap),
      "fixture must contain at least one capped hub")
    // exact long micro-units, mirroring the engine's 12-dp × 10¹² form
    def units(b: Long): Long =
      (BigDecimal(1.0 / math.log(adj(b).size.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000000000L)).toLongExact
    val nodes = adj.keySet
    val exp = (for {
      u <- nodes.toSeq; w <- nodes.toSeq
      if u < w && !edgeSet.contains((u, w))
      cs = (adj(u) & adj(w))
        .filter(b => adj(b).size >= 2 && adj(b).size <= cap)
      if cs.nonEmpty
    } yield (u, w, cs.size.toLong,
      cs.toSeq.map(units).sum.toDouble / 1.0e12)).toSet
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      val got = gt.adamicAdar(maxDegree = cap).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === exp)
    } finally gt.unpersist()
  }

  test("adamicAdar packed-key gate: an id >= 2^31 that is only a " +
      "degree-1 NEIGHBOR (never an eligible center) disables packing " +
      "and the result still matches the set replica") {
    import spark.implicits._
    // 2^33 + 7: if packed as u·2^32 + w this spills into u's bits and
    // unpacks as a DIFFERENT pair — the latent aliasing the probe must
    // catch. Degree 1 keeps it out of the eligible-center set, so an
    // eligible-only id probe (the round-14 bug) would wrongly enable
    // the packed plan.
    val big = 8589934599L
    val und = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 2L -> big, 3L -> 4L)
    val sym = (und ++ und.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = sym.toSet
    val cap = 10
    def units(b: Long): Long =
      (BigDecimal(1.0 / math.log(adj(b).size.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000000000L)).toLongExact
    val nodes = adj.keySet
    val exp = (for {
      u <- nodes.toSeq; w <- nodes.toSeq
      if u < w && !edgeSet.contains((u, w))
      cs = (adj(u) & adj(w))
        .filter(b => adj(b).size >= 2 && adj(b).size <= cap)
      if cs.nonEmpty
    } yield (u, w, cs.size.toLong,
      cs.toSeq.map(units).sum.toDouble / 1.0e12)).toSet
    assert(exp.exists(t => t._1 == big || t._2 == big),
      "fixture must score at least one pair involving the big id")
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      val got = gt.adamicAdar(maxDegree = cap).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === exp)
    } finally gt.unpersist()
  }

  test("adamicAdar refuses a directed feed and a degenerate cap") {
    import spark.implicits._
    val gt = Graph.buildGraphTable(
      Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst"), "src", "dst")
    try {
      assert(intercept[IllegalArgumentException](gt.adamicAdar())
        .getMessage.contains("symmetric"))
    } finally gt.unpersist()
    val sym2 = Seq(1L -> 2L, 2L -> 1L)
    val gt2 = Graph.buildGraphTable(
      sym2.toDF("src", "dst"), "src", "dst")
    try {
      assert(intercept[IllegalArgumentException](
        gt2.adamicAdar(maxDegree = 1)).getMessage.contains("maxDegree"))
    } finally gt2.unpersist()
  }

  test("modularity: two triangles + bridge match the hand formula; " +
    "one community scores zero") {
    import spark.implicits._
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L,
      6L -> 4L, 3L -> 4L)
    val sym = und ++ und.map(_.swap)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    try {
      val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L,
        4L -> 20L, 5L -> 20L, 6L -> 20L).toDF("node", "lbl")
      val got = gt.modularity(labels).head()
      // per community: ein = 6 directed, deg sum = 2+2+3 = 7, m = 14
      val term = r12(6.0 / 14.0 - (7.0 / 14.0) * (7.0 / 14.0))
      assert(got.getDouble(0) === (term + term).toDouble)
      assert(got.getLong(1) === 2L)
      assert(got.getLong(2) === 14L)
      // everything in one community: Q = m/m - 1^2 = 0
      val one = gt.modularity(
        (1L to 6L).map(_ -> 99L).toDF("node", "lbl")).head()
      assert(one.getDouble(0) === 0.0)
      assert(one.getLong(1) === 1L)
    } finally gt.unpersist()
  }

  test("modularity over PARQUET-round-tripped label-prop labels is " +
    "bit-identical to scoring the in-flight labels (the q164 artifact)") {
    import spark.implicits._
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L,
      6L -> 4L, 3L -> 4L)
    val sym = und ++ und.map(_.swap)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst").repartition(3), "src", "dst",
      assumeDistinct = true)
    try {
      val labels = Graph.labelPropagationImpl(gt, iters = 5)
      val dir = java.nio.file.Files.createTempDirectory("lbl").toString
      labels.write.mode("overwrite").parquet(dir)
      val inline = gt.modularity(labels).head()
      val loaded = gt.modularity(spark.read.parquet(dir)).head()
      assert(loaded.getDouble(0) === inline.getDouble(0))
      assert(loaded.getLong(1) === inline.getLong(1))
      assert(loaded.getLong(2) === inline.getLong(2))
    } finally gt.unpersist()
  }

  test("bipartiteProject matches the shared-right replica; hubs drop") {
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    val pairs = (for (_ <- 1 to 300) yield
      (rnd.nextInt(20).toLong, rnd.nextInt(12).toLong)).distinct
    // a hub right node incident to EVERY left — must not contribute
    val hub = (0L until 20L).map(l => (l, 99L))
    val all = pairs ++ hub
    val cap = 15
    val byRight = all.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct).toMap
    assert(byRight(99L).size > cap)
    val exp = byRight.values.filter(_.size <= cap)
      .flatMap(ls => for {
        a <- ls; b <- ls if a < b
      } yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .map { case ((a, b), w) => (a, b, w) }.toSet
    val got = Graph.bipartiteProject(
        all.toDF("l", "r").repartition(3), "l", "r", maxRightDegree = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === exp)
    assert(intercept[IllegalArgumentException](
      Graph.bipartiteProject(all.toDF("l", "r"), "l", "r", 1))
      .getMessage.contains("maxRightDegree"))
  }

  test("appendToGraphTable: append ≡ rebuild, unweighted and weighted") {
    import spark.implicits._
    def artDir(tag: String): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_gapp_$tag").toString
      new java.io.File(d).deleteOnExit(); d
    }
    // unweighted: re-appending known edges must be a set-union no-op
    val e1 = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val e2 = Seq(2L -> 3L, 3L -> 4L, 4L -> 1L) // overlaps e1 on (2,3)
    val p1 = artDir("u")
    Graph.writeGraphTable(e1.toDF("src", "dst"), "src", "dst", p1)
    Graph.appendToGraphTable(spark, p1, e2.toDF("src", "dst"), "src", "dst")
    val got = Graph.readGraphTable(spark, p1)
    val want = Graph.buildGraphTable(
      (e1 ++ e2).toDF("src", "dst"), "src", "dst")
    try {
      assert((got.numNodes, got.numSrcNodes, got.numEdges) ===
        ((want.numNodes, want.numSrcNodes, want.numEdges)))
      assert(got.edges.orderBy("src", "dst").collect().toSeq ===
        want.edges.orderBy("src", "dst").collect().toSeq)
    } finally want.unpersist()
    // weighted: batch weights SUM into existing pair weights
    val w1 = Seq((1L, 2L, 2.0), (2L, 3L, 1.0))
    val w2 = Seq((1L, 2L, 3.0), (3L, 1L, 1.5))
    val p2 = artDir("w")
    Graph.writeGraphTable(w1.toDF("src", "dst", "w"), "src", "dst", p2,
      weightCol = Some("w"))
    Graph.appendToGraphTable(spark, p2, w2.toDF("src", "dst", "w"),
      "src", "dst", weightCol = Some("w"))
    val gotW = Graph.readGraphTable(spark, p2)
    val wantW = Graph.buildGraphTable(
      (w1 ++ w2).toDF("src", "dst", "w"), "src", "dst",
      weightCol = Some("w"))
    try {
      assert(gotW.edges.orderBy("src", "dst").collect().toSeq ===
        wantW.edges.orderBy("src", "dst").collect().toSeq)
    } finally wantW.unpersist()
    // missing artifact fails loudly
    val e = intercept[IllegalArgumentException](
      Graph.appendToGraphTable(spark, "/nonexistent/graft_gapp",
        e1.toDF("src", "dst"), "src", "dst"))
    assert(e.getMessage.contains("no graph artifact"))
  }

  test("kCore returns empty when k exceeds every degree") {
    import spark.implicits._
    val sym = randomSym(20, 40, seed = 3L)
    val gt = Graph.buildGraphTable(
      sym.toDF("src", "dst"), "src", "dst", assumeDistinct = true)
    try assert(gt.kCore(1000, maxRounds = 10).count() === 0L)
    finally gt.unpersist()
  }
}
