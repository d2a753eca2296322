package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Prebuilt graph scaffolding: the distinct (optionally weighted) edge
  * list with per-source out-weight totals attached, the node list with
  * a source flag, and the three counts every algorithm needs. Build it
  * once ([[Graph.buildGraphTable]]), or persist it as a parquet
  * artifact ([[Graph.writeGraphTable]] / [[Graph.readGraphTable]] —
  * the persisted PQ/IVF-index precedent applied to graphs) and run
  * every iterative algorithm against the same artifact: at 100 TB the
  * distinct+degree+node-list scaffolding is a full pass over the edge
  * pipeline, and a deployment builds it once and iterates many, not
  * once per query.
  *
  * Schema contract (what [[Graph.readGraphTable]] expects):
  *  - `edges`:  (src, dst, w DOUBLE, wout DOUBLE) — distinct pairs;
  *    `w` is 1.0 for unweighted graphs, `wout` = Σw over the source's
  *    out-edges (12-dp DECIMAL sum cast to double — exact and
  *    order-independent; for unweighted graphs exactly the out-degree).
  *  - `nodes`:  (node, is_src BOOLEAN) — src ∪ dst nodes; a node with
  *    `is_src = false` has in-edges but no out-edges (a sink).
  *
  * `cached` records whether the frames are persisted (built in-memory)
  * or plain parquet reads (loaded artifact); algorithms that re-scan
  * the edge list per round persist their own view when it is false.
  */
final case class GraphTable(
    edges: DataFrame,
    nodes: DataFrame,
    numNodes: Long,
    numSrcNodes: Long,
    numEdges: Long,
    cached: Boolean) {

  /** Sinks: nodes with in-edges but no out-edges. */
  def numDangling: Long = numNodes - numSrcNodes

  def pageRank(
      iters: Int,
      damping: Double = 0.85,
      danglingCorrection: Boolean = false,
      distributedRanks: Option[Boolean] = None,
      epsilon: Option[Double] = None): DataFrame =
    Graph.pageRankImpl(this, iters, damping, danglingCorrection,
      distributedRanks, epsilon)

  def personalizedPageRank(
      seeds: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      epsilon: Option[Double] = None,
      distributedRanks: Option[Boolean] = None): DataFrame =
    Graph.personalizedPageRankImpl(this, seeds, iters, damping, epsilon,
      distributedRanks)

  def hits(iters: Int, epsilon: Option[Double] = None,
      distributedScores: Option[Boolean] = None): DataFrame =
    Graph.hitsImpl(this, iters, epsilon, distributedScores)

  def labelPropagation(iters: Int): DataFrame =
    Graph.labelPropagationImpl(this, iters)

  def triangleCounts(): DataFrame = Graph.triangleCountsImpl(this)

  def triangleCountEstimate(keepPct: Int, seed: Long): DataFrame =
    Graph.triangleCountEstimateImpl(this, keepPct, seed)

  def clusteringCoefficient(): DataFrame =
    Graph.clusteringCoefficientImpl(this)

  def kCore(k: Int, maxRounds: Int): DataFrame =
    Graph.kCoreImpl(this, k, maxRounds)

  def bfsLevels(seeds: DataFrame, maxDepth: Int): DataFrame =
    Graph.bfsLevelsImpl(this, seeds, maxDepth)

  def shortestPaths(seeds: DataFrame, maxRounds: Int): DataFrame =
    Graph.shortestPathsImpl(this, seeds, maxRounds)

  def edgeJaccard(): DataFrame = Graph.edgeJaccardImpl(this)

  def adamicAdar(maxDegree: Int = Int.MaxValue): DataFrame =
    Graph.adamicAdarImpl(this, maxDegree)

  def modularity(labels: DataFrame): DataFrame =
    Graph.modularityImpl(this, labels)

  /** Release the build-time caches (no-op on a loaded artifact). */
  def unpersist(): Unit =
    if (cached) {
      edges.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      ()
    }
}

/** Iterative graph analytics over plain edge DataFrames (the
  * connected-components sibling lives in [[Components]]). */
object Graph {

  private val Dec12 = DecimalType(38, 12)

  /** Target rows per task inside the iterative rank-table loops. The
    * per-round working sets (E contribution rows, N rank rows) are
    * latency-bound, not throughput-bound — at small graphs, 32 tasks
    * of a few thousand rows each cost more in scheduling barriers
    * than in work (measured: q107 6.9 → 4.0 s at sf0.1 when the
    * round stages drop from 32 to ~4 tasks). */
  private val iterRowsPerTask = 250000L

  /** Shuffle-partition count for an iterative body over `rows`-row
    * working sets: ⌈rows / target⌉, clamped to [1, session setting].
    * The session setting stays the CEILING — on a cluster where the
    * operator sized `spark.sql.shuffle.partitions` to the data,
    * rows/target far exceeds it and behavior is unchanged; only
    * small-graph rounds get fewer, larger tasks. */
  private[operators] def iterPartitions(
      spark: org.apache.spark.sql.SparkSession, rows: Long): Int =
    iterPartitions(spark.sessionState.conf.numShufflePartitions, rows)

  /** Ceiling-explicit form for callers that size an INNER scope from
    * the TRUE session setting (inside [[withShufflePartitions]] the
    * conf reads back the scoped value, which would wrongly cap a
    * larger inner stage — the wedge stream is bigger than the edge
    * list it came from). */
  private[operators] def iterPartitions(ceiling: Int, rows: Long): Int =
    math.max(1L, math.min(ceiling.toLong,
      (rows + iterRowsPerTask - 1) / iterRowsPerTask)).toInt

  /** Per-session monitor for [[withShufflePartitions]]: two wrapped
    * calls on the same session from different threads must not
    * interleave their save/set/restore (an interleave could leave the
    * session permanently at a scoped value). Weak keys so a retired
    * session doesn't pin its lock object. */
  private val confScopeLocks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, Object]())

  /** Run `f` with `spark.sql.shuffle.partitions` scoped to `p`,
    * restoring the previous value after. Every action the iterative
    * bodies run (per-round eager checkpoints, cache-priming counts,
    * epsilon probes) executes inside `f`, so all their exchanges —
    * including the groupBy aggregates the DataFrame API gives no
    * partition-count handle for — plan at `p`. Results are unchanged
    * by construction: every accumulation in these bodies is either
    * integer-exact or a 12-dp-rounded DECIMAL sum (exact and
    * associative), so partitioning cannot move a bit.
    *
    * Concurrency contract: scoped regions on the same session are
    * SERIALIZED (per-session monitor), so overlapping wrapped calls
    * cannot interleave save/restore; and the restore is conditional —
    * if something else changed the conf while `f` ran, that outside
    * write wins rather than being clobbered by our stale saved value.
    * Unrelated user queries planned on the same session WHILE a scoped
    * region runs still see the scoped value — inherent to session-conf
    * scoping and documented here; callers that interleave foreign
    * queries with iterative graph calls should use separate
    * `SparkSession.newSession()` handles (isolated conf, shared
    * context). */
  private[operators] def withShufflePartitions[A](
      spark: org.apache.spark.sql.SparkSession, p: Int)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val lock = confScopeLocks.computeIfAbsent(spark, _ => new Object)
    lock.synchronized {
      val old = spark.conf.get(key)
      if (old == p.toString) f
      else {
        spark.conf.set(key, p.toString)
        try f finally {
          if (spark.conf.get(key) == p.toString) spark.conf.set(key, old)
        }
      }
    }
  }

  /** [[withShufflePartitions]] sized for `gt`'s loop working sets. */
  private def withIterParallelism[A](gt: GraphTable)(f: => A): A = {
    val spark = gt.edges.sparkSession
    withShufflePartitions(spark,
      iterPartitions(spark, math.max(gt.numEdges, gt.numNodes)))(f)
  }

  /** Oriented-list ROW count (E/2) below which the wedge-join family
    * (triangles, clustering coefficient, edge Jaccard, Adamic-Adar)
    * takes its SMALL-graph path: scale-aware scoped task counts, an
    * exact wedge-volume probe, and a broadcast build side that lets
    * the O(E^1.5) wedge stream fuse map-side with no exchange. Above
    * the gate the plain ambient-partition shuffle_hash plan runs with
    * no probe job. The 300k default is set by round-12 min-of-five
    * in-bench floors at sf0.1, NOT by broadcast-memory headroom: at
    * 1.2M oriented rows the device COSTS ~1-3 s per line (q119 floor
    * 4.97→6.12, q156 5.42→8.32, q160 3.38→4.27, untouched controls
    * flat ±0.3 s — the probe job, the narrower scaffolding scope, and
    * the big shared broadcast relation each hurt; per-partition
    * shuffle_hash maps fit cache, one 100 MB relation does not),
    * while a 0.24M-row side wins outright (q127 floor 4.77→4.01, and
    * 4.8→1.6 s isolated). Override with
    * `spark.graft.graph.wedgeBroadcastMaxRows`. */
  def wedgeBroadcastMaxRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.graph.wedgeBroadcastMaxRows")
      .map { v =>
        try v.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            "spark.graft.graph.wedgeBroadcastMaxRows must be a long row " +
              s"count, got '$v'")
        }
      }.getOrElse(300000L)

  /** Node count above which [[pageRank]] auto-selects the distributed
    * rank-table loop body (the rank table must fit the driver/broadcast
    * envelope on the driver-resident body — ~16 bytes a row broadcast
    * plus map overhead driver-side, so 2M nodes ≈ tens of MB broadcast
    * and a few hundred MB of driver heap: comfortably inside a default
    * driver, and well past the point where the distributed body's
    * per-round overhead has amortized). Override with
    * `spark.graft.graph.maxDriverRankNodes`.
    *
    * Scale note (the 100 TB posture): the switch is only as good as
    * this node-count probe, and the probe is FREE and EXACT — it reads
    * [[GraphTable.numNodes]], counted once at artifact build/load time
    * (meta row), never re-scanned per query. At 100× today's graphs
    * every directed-family call crosses the 2M default and lands on
    * the distributed body (listener-proven zero driver collects); the
    * driver-resident body is strictly a small-graph latency
    * optimization, never load-bearing for correctness. */
  def maxDriverRankNodes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.graph.maxDriverRankNodes")
      .map(_.toLong).getOrElse(2000000L)

  // ------------------------------------------------------ graph table

  /** Build the reusable scaffolding from a raw edge list: distinct the
    * pairs (skippable via `assumeDistinct`; with a `weightCol`,
    * parallel edges instead COMBINE by weight sum — 12-dp DECIMAL, so
    * the combined weight is partition-order-independent), attach the
    * per-source out-weight total via a broadcast of the one-row-per-
    * source totals (the E-row side never shuffles), and flag source
    * nodes. Frames come back persisted (MEMORY_AND_DISK) and counted;
    * release with [[GraphTable.unpersist]] when done. */
  def buildGraphTable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      assumeDistinct: Boolean = false): GraphTable = {
    val e0 = weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      case Some(w) =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(w).cast("double").as("w"))
    }
    val eD = (if (assumeDistinct) e0
      else weightCol match {
        case None => e0.distinct()
        case Some(_) =>
          e0.groupBy("src", "dst")
            .agg(sum(round(col("w"), 12).cast(Dec12)).cast("double")
              .as("w"))
      }).persist(StorageLevel.MEMORY_AND_DISK)
    val withW =
      if (weightCol.isDefined) eD else eD.withColumn("w", lit(1.0))
    // out-weight totals are one row per source node — broadcast them
    // back onto the edge list so the E-row side never shuffles.
    // (A fused single-aggregate variant — node list, is_src, and
    // out-weights in ONE tagged union agg, counts derived — measured
    // WORSE at sf0.1 (append 1.7→2.6 s warm): it serializes what the
    // two concurrent jobs below overlap, and the od pass it removes
    // was the cheap one. Kept the overlapped two-job shape.)
    val od = weightCol match {
      case None =>
        eD.groupBy("src")
          .agg(count(lit(1)).cast("double").as("wout"))
      case Some(_) =>
        eD.groupBy("src")
          .agg(sum(round(col("w"), 12).cast(Dec12)).cast("double")
            .as("wout"))
    }
    val edgesFull = withW.join(broadcast(od), "src")
      .select(col("src"), col("dst"), col("w"), col("wout"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE shuffle for the node list: a node is a source iff it ever
    // appears on the src side, so max(is_src) over the tagged union
    // of both endpoint columns is exactly the old distinct+anti-join
    // derivation (3 shuffles) — partial aggregation collapses the 2E
    // tagged rows to distinct nodes map-side before the exchange.
    val nodesDf = eD.select(col("src").as("node"), lit(true).as("is_src"))
      .unionByName(eD.select(col("dst").as("node"),
        lit(false).as("is_src")))
      .groupBy("node")
      .agg(max(col("is_src")).as("is_src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The two count actions share the eD cache (block-level locks:
    // first computes, the other reuses) and are independent jobs —
    // overlap them instead of leaving 32 cores half-idle twice.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val numEdgesF = Future(edgesFull.count()) // also materializes eD
    val cntsF = Future(nodesDf
      .agg(count(lit(1)).as("n"),
        count(when(col("is_src"), lit(1))).as("ns"))
      .head())
    val numEdges = Await.result(numEdgesF, Duration.Inf)
    val cnts = Await.result(cntsF, Duration.Inf)
    eD.unpersist(blocking = false)
    GraphTable(edgesFull, nodesDf, cnts.getLong(0), cnts.getLong(1),
      numEdges, cached = true)
  }

  /** Write the scaffolding as a parquet artifact at `path`
    * (`edges/`, `nodes/`, one-row `meta/`) — build once, iterate many:
    * the artifact read replays NO distinct/degree/node shuffles, only
    * column-pruned scans. */
  def writeGraphTable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      path: String,
      weightCol: Option[String] = None,
      assumeDistinct: Boolean = false): Unit = {
    val spark = edges.sparkSession
    val gt = buildGraphTable(edges, srcCol, dstCol, weightCol,
      assumeDistinct)
    try publishGraphArtifact(spark, path, gt)
    finally gt.unpersist()
  }

  /** Publish a built [[GraphTable]] as the next artifact version.
    * The three component writes read already-persisted frames and are
    * mutually independent jobs, so they run CONCURRENTLY — same
    * rationale as the parallel scaffold build: each write alone is a
    * small job that underutilizes the cluster, and on a real cluster
    * overlapping them hides each table's commit/IO latency behind
    * another's compute. */
  private def publishGraphArtifact(
      spark: SparkSession, path: String, gt: GraphTable): Unit = {
    import spark.implicits._
    // NOTE (measured, round 15): coalescing these writes to
    // row-count-sized file counts (the iterPartitions heuristic) was
    // tried and REVERTED — at sf0.1 the compact layout collapses the
    // artifact's read side to a single scan split (open-cost packing),
    // serializing every consumer's first pass (q130's rank phase
    // 1.6 → 3.2 s, q98/q102 similarly); the commit-overhead saving was
    // ~0.2 s. Ambient-partition writes keep the read side parallel.
    graft.sources.Artifacts.publishVersion(spark, path) { vdir =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val writes = Seq(
        Future(gt.edges.write.mode("overwrite").parquet(s"$vdir/edges")),
        Future(gt.nodes.write.mode("overwrite").parquet(s"$vdir/nodes")),
        Future(Seq((gt.numNodes, gt.numSrcNodes, gt.numEdges))
          .toDF("n_nodes", "n_src", "n_edges")
          .coalesce(1).write.mode("overwrite").parquet(s"$vdir/meta")))
      try writes.foreach(Await.result(_, Duration.Inf))
      finally pool.shutdown()
    }
  }

  private def latestGraphDir(spark: SparkSession, path: String): String =
    try graft.sources.Artifacts.latestDir(spark, path)
    catch { case e: IllegalArgumentException =>
      throw new IllegalArgumentException(
        s"no graph artifact at $path (${e.getMessage})")
    }

  /** Merge a new edge batch into a persisted graph artifact — the
    * IVF-append lifecycle applied to graphs: a deployment builds the
    * artifact once from the raw feed and then folds in edge deltas
    * without re-running the raw-feed extraction pipeline (at 100 TB
    * the joins/distincts producing the edge list from raw logs are
    * the expensive part; the merge below is one pass over artifact +
    * batch).
    *
    * Semantics mirror [[buildGraphTable]]'s: unweighted appends are
    * SET UNION (re-appending a known edge is a no-op); weighted
    * appends SUM the batch's pair weights into the existing ones
    * (12-dp DECIMAL, partition-order-exact — the "purchase count
    * increment" semantics), so append-then-read is bit-identical to
    * rebuilding from the concatenated feeds (GraphSpec proves both).
    * Out-weight totals, the node list, and the meta row are
    * recomputed in the same pass.
    *
    * The merged artifact publishes as the next version
    * ([[graft.sources.Artifacts.publishVersion]]): readers resolve a
    * complete version at any moment, so probes may run concurrently
    * with an append; concurrent APPENDS must still be serialized
    * (single-writer, like any artifact fold). */
  def appendToGraphTable(
      spark: SparkSession,
      path: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None): Unit = {
    val existing = spark.read
      .parquet(s"${latestGraphDir(spark, path)}/edges")
      .select("src", "dst", "w")
    val merged = weightCol match {
      case None =>
        // the batch needs no pre-distinct of its own: the set-union
        // distinct below already dedupes within the batch and against
        // the artifact — one exchange instead of two
        existing.select("src", "dst")
          .union(edges.select(col(srcCol).as("src"),
            col(dstCol).as("dst")))
          .distinct().withColumn("w", lit(1.0))
      case Some(w) =>
        val batch = edges.select(col(srcCol).as("src"),
            col(dstCol).as("dst"), col(w).cast("double").as("w"))
          .groupBy("src", "dst")
          .agg(sum(round(col("w"), 12).cast(Dec12)).cast("double").as("w"))
        existing.union(batch).groupBy("src", "dst")
          .agg(sum(round(col("w"), 12).cast(Dec12)).cast("double").as("w"))
    }
    val gt = buildGraphTable(merged, "src", "dst",
      weightCol = weightCol.map(_ => "w"), assumeDistinct = true)
    try publishGraphArtifact(spark, path, gt)
    finally gt.unpersist()
  }

  /** Re-open a persisted graph artifact. Counts come from `meta/`
    * (one row), so preconditions (sink check, body auto-selection)
    * cost nothing at query time. */
  def readGraphTable(spark: SparkSession, path: String): GraphTable = {
    val vdir = latestGraphDir(spark, path)
    val m = spark.read.parquet(s"$vdir/meta")
      .select("n_nodes", "n_src", "n_edges").head()
    GraphTable(
      spark.read.parquet(s"$vdir/edges"),
      spark.read.parquet(s"$vdir/nodes"),
      m.getLong(0), m.getLong(1), m.getLong(2), cached = false)
  }

  // -------------------------------------------------------- PageRank

  /** Damped PageRank over a directed edge list.
    *
    * Dangling nodes (nodes with in-edges but no out-edges) leak rank
    * mass if ignored, so the operator never ignores them: with
    * `danglingCorrection = true` their mass is redistributed uniformly
    * each round (the standard correction — rank sums stay ~1 and sinks
    * participate as first-class nodes); with it false (the cheap path
    * for graphs that cannot have sinks, e.g. an undirected graph fed
    * as both edge directions), the operator REQUIRES the no-sink
    * precondition and fails loudly instead of silently producing wrong
    * ranks on the first directed feed. (The check reads
    * [[GraphTable.numDangling]], already counted at build time, so it
    * is free; `assumeNoSinks` is retained for callers whose
    * construction proves it but no longer buys anything.)
    *
    * With `weightCol` set, a contribution is rank·w/Σw over the
    * source's out-edges instead of rank/outdeg (uniform weights
    * reproduce the unweighted ranks bit-for-bit: w = 1 makes
    * rank·1.0/Σ1.0 the same IEEE expression as rank/outdeg).
    *
    * Scale posture — TWO loop bodies behind one set of semantics,
    * auto-selected by node count unless `distributedRanks` pins one
    * (`Some(false)`/`Some(true)`); the threshold is
    * `spark.graft.graph.maxDriverRankNodes` (default 2M — see
    * [[maxDriverRankNodes]]):
    *
    *  - driver-resident (the small-N fast path): each round broadcasts
    *    the N-entry rank array into the edge partitions (the edges
    *    never move) and folds contributions into a per-partition DENSE
    *    array of exact 12-dp decimals — the map-side combiner taken to
    *    its limit: ONE zero-shuffle task wave per round, merged exactly
    *    (BigDecimal addition is associative, the K-Means A3 merge
    *    discipline — collect-fold below
    *    `spark.graft.graph.treeReducePartitions`, 2-level treeReduce
    *    above it). No exchange ever carries edge rows; edges are lifted
    *    ONCE to primitive columnar partitions keyed by dense node
    *    index, so the per-round job deserializes no rows and hashes no
    *    keys. The rank array lives on the driver between rounds:
    *    broadcasting it already collects all N ranks driver-side every
    *    round, so driver residency adds no new constraint. Cap: N must
    *    fit the driver/executor broadcast envelope — which is exactly
    *    what the auto-switch threshold encodes.
    *
    *  - distributed rank table (the 100-TB path): the rank table NEVER
    *    visits the driver. Edges (out-weights pre-attached) are
    *    hash-repartitioned on `src` and persisted once; ranks live as
    *    a DataFrame hash-partitioned on `node`, `localCheckpoint`ed
    *    per round (the [[Components]] lineage-truncation device, with
    *    the same release-previous-round bookkeeping). Each round is a
    *    shuffled-hash join of the cached edge partitions with the rank
    *    table (the E-row side reuses its cached partitioning; only the
    *    N-row rank side moves), a partial/final DECIMAL aggregate on
    *    `dst`, and a left join back onto the (also cached,
    *    co-partitioned) node list. The dangling mass is a ONE-ROW
    *    aggregate cross-joined into the update — a plan, not a
    *    collect: no loop step moves more than a broadcast-sized
    *    payload to the driver, so the plan's ceiling is cluster
    *    memory/disk, not the driver heap. (GraphSpec asserts via a
    *    QueryExecutionListener that the distributed loop performs zero
    *    `collect` actions, and that both bodies produce bit-identical
    *    ranks.)
    *
    * Convergence: `iters` is the hard round cap. With
    * `epsilon = Some(eps)` the loop additionally stops as soon as
    * max |Δrank| <= eps after a round (inclusive boundary — the same
    * fixpoint discipline as the K-Means loop's A7 semantics, where the
    * `<=` edge counts as converged). The fixed-iteration behavior
    * (`epsilon = None`) is exactly the pre-flag semantics. The epsilon
    * check is a one-row aggregate per round (a bounded scalar action,
    * the K-Means-convergence category, never an N-row collect).
    *
    * Determinism: per-edge contributions are rounded to 12 dp and
    * summed as DECIMAL(38,12) (exact and associative, so the result is
    * independent of partitioning and merge order); the dangling mass
    * uses the same 12-dp DECIMAL device before one double division by
    * N; the damped update `(1-d)/N + d·(s + dm/N)` is the same
    * fixed-association double arithmetic whether evaluated per-row by
    * codegen or per-node on the driver (round = BigDecimal HALF_UP in
    * both — `round(x, 12)` on a double then cast to DECIMAL(38,12) is
    * lossless because distinct 12-dp decimals differ by ≥1e-12, far
    * beyond a double's ulp at rank magnitudes). By induction every
    * iteration's rank column is bit-identical across the two loop
    * bodies and any engine that evaluates the same tree. With
    * `danglingCorrection = false` the `+ dm/N` term is absent
    * entirely, preserving the pre-flag semantics.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85,
      assumeDistinct: Boolean = false,
      danglingCorrection: Boolean = false,
      assumeNoSinks: Boolean = false,
      distributedRanks: Option[Boolean] = None,
      epsilon: Option[Double] = None,
      weightCol: Option[String] = None): DataFrame = {
    val gt = buildGraphTable(edges, srcCol, dstCol, weightCol,
      assumeDistinct)
    try pageRankImpl(gt, iters, damping, danglingCorrection,
      distributedRanks, epsilon)
    finally gt.unpersist()
  }

  private[operators] def pageRankImpl(
      gt: GraphTable,
      iters: Int,
      damping: Double,
      danglingCorrection: Boolean,
      distributedRanks: Option[Boolean],
      epsilon: Option[Double]): DataFrame = withIterParallelism(gt) {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    epsilon.foreach(e => require(e >= 0.0, s"epsilon must be >= 0, got $e"))
    require(gt.numNodes > 0, "graph has no nodes")
    if (!danglingCorrection)
      // cheap path's precondition: a sink here would silently leak
      // rank mass every round. Free — the counts were taken at build.
      require(gt.numDangling == 0,
        s"${gt.numDangling} node(s) have in-edges but no out-edges; " +
          "their rank mass would silently leak. Pass " +
          "danglingCorrection = true (uniform redistribution) or feed " +
          "sinks their back-edges.")
    // ranks are defined over src nodes on the cheap path (sink-free ⇒
    // src set ⊇ dst set), over src ∪ dst with the correction
    val n = if (danglingCorrection) gt.numNodes else gt.numSrcNodes
    val distributed =
      distributedRanks.getOrElse(
        n > maxDriverRankNodes(gt.edges.sparkSession))
    if (distributed)
      pageRankDistributed(gt, n, iters, damping, danglingCorrection,
        epsilon)
    else
      pageRankDriver(gt, iters, damping, danglingCorrection, epsilon)
  }

  /** Shared machinery for the driver-resident rank loops
    * ([[pageRankDriver]], [[personalizedPageRankDriver]]): lifts the
    * edge list ONCE to primitive columnar partitions keyed by dense
    * node index — each round re-reads THIS cache, so the per-round
    * job deserializes no rows and hashes no keys — and folds one
    * round's contributions round(rank·w/wout, 12) into a dense
    * per-partition array of exact 12-dp decimals (the map-side
    * combiner taken to its limit: a zero-shuffle task wave), merged
    * exactly (BigDecimal addition is associative ⇒ any merge shape —
    * the driver's sequential fold, treeReduce's executor-side
    * pre-merges above `spark.graft.graph.treeReducePartitions` —
    * yields the same cells).
    *
    * Bit-identity with the DataFrame round this replaces (and so with
    * the distributed bodies and the recursive-CTE oracles):
    * `round(rank·w/wout, 12) CAST DECIMAL(38,12)` equals
    * `BigDecimal.valueOf(rank·w/wout).setScale(12, HALF_UP)` — the
    * double round-trip is lossless because distinct 12-dp decimals
    * differ by ≥ 1e-12, orders of magnitude beyond a double's ulp at
    * rank magnitudes, so the shortest-repr cast recovers exactly the
    * rounded decimal. The per-dst sums are then the same exact
    * addends in a different association — equal by associativity. */
  private final class DriverRankHarness(
      ed: DataFrame, val nodeArr: Array[Any]) {
    import java.math.{BigDecimal => JBD}
    import java.math.RoundingMode.HALF_UP
    val spark: SparkSession = ed.sparkSession
    val nN: Int = nodeArr.length
    private val idx = new java.util.HashMap[Any, Integer](nN * 2)
    locally {
      var i = 0
      while (i < nN) { idx.put(nodeArr(i), i); i += 1 }
    }
    def indexOf(v: Any): Int = idx.get(v).intValue()

    private val bcIdx = spark.sparkContext.broadcast(idx)
    private val edgeParts = {
      val bc = bcIdx // local alias: the task closure must not drag
                     // the (non-serializable) harness in via `this`
      ed.select(col("src"), col("dst"), col("w"), col("wout"))
        .rdd.mapPartitions { rows =>
        val m = bc.value
        val si = new scala.collection.mutable.ArrayBuilder.ofInt
        val di = new scala.collection.mutable.ArrayBuilder.ofInt
        val wv = new scala.collection.mutable.ArrayBuilder.ofDouble
        val wo = new scala.collection.mutable.ArrayBuilder.ofDouble
        rows.foreach { r =>
          si += m.get(r.get(0)).intValue()
          di += m.get(r.get(1)).intValue()
          wv += r.getDouble(2)
          wo += r.getDouble(3)
        }
        Iterator.single((si.result(), di.result(), wv.result(),
          wo.result()))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    }
    edgeParts.count()

    private val treeGate =
      spark.conf.getOption("spark.graft.graph.treeReducePartitions")
        .map(_.toInt).getOrElse(1024)

    /** One round's per-dst contribution sums (null cell = no mass). */
    def contribSums(rank: Array[Double]): Array[JBD] = {
      // exact merge of two dense contribution tables; mutates and
      // returns `a` (inputs are task-fresh on every path). A LOCAL
      // function: an instance method would drag the non-serializable
      // harness into the treeReduce closure via `this`.
      def merge(a: Array[JBD], b: Array[JBD]): Array[JBD] = {
        var j = 0
        while (j < a.length) {
          if (b(j) != null)
            a(j) = if (a(j) == null) b(j) else a(j).add(b(j))
          j += 1
        }
        a
      }
      val bcRank = spark.sparkContext.broadcast(rank)
      val nCells = nN
      val partials = edgeParts.mapPartitions { it0 =>
        val rk = bcRank.value
        val acc = new Array[JBD](nCells)
        it0.foreach { case (si, di, wv, wo) =>
          var i = 0
          while (i < si.length) {
            val c = JBD.valueOf(rk(si(i)) * wv(i) / wo(i))
              .setScale(12, HALF_UP)
            val d = di(i)
            acc(d) = if (acc(d) == null) c else acc(d).add(c)
            i += 1
          }
        }
        Iterator.single(acc)
      }
      val sums =
        if (edgeParts.getNumPartitions > treeGate)
          partials.treeReduce(merge _, depth = 2)
        else partials.collect().foldLeft(new Array[JBD](nN))(merge)
      bcRank.unpersist(blocking = false)
      sums
    }

    /** Exact 12-dp sum of the ranks at `which`, as a double. */
    def sinkMass(rank: Array[Double], which: Array[Int]): Double = {
      var s = JBD.ZERO
      which.foreach(d =>
        s = s.add(JBD.valueOf(rank(d)).setScale(12, HALF_UP)))
      s.doubleValue()
    }

    def release(): Unit = {
      edgeParts.unpersist(blocking = false)
      bcIdx.unpersist(blocking = false)
    }
  }

  /** Edge-count gate for the driver-resident LOOP twins
    * ([[labelPropagationDriver]], [[kCoreDriver]], [[bfsLevelsDriver]],
    * [[shortestPathsDriver]]): the lifted primitive edge partitions
    * stay on the EXECUTORS either way (the [[DriverRankHarness]]
    * device), but label propagation's per-round merge is bounded by
    * distinct (node, label) pairs ≤ E rather than N, so the loop
    * family takes a belt-and-braces edge gate the N-merge rank family
    * does not need (8M edges ≈ 64 MB of primitive columns — the
    * [[csrMaxOrientedRows]] envelope argument). At 100 TB every call
    * crosses the gate and lands on the distributed bodies, which are
    * unchanged; the twins are strictly a small-graph latency device
    * (the round-14 rank-loop precedent), never load-bearing. */
  private[operators] def maxDriverLoopEdges(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.graph.maxDriverLoopEdges")
      .map(_.toLong).getOrElse(8000000L)

  /** Both gates: node count within the rank family's broadcast/dense-
    * array envelope AND edge count within [[maxDriverLoopEdges]]. */
  private def useDriverLoop(gt: GraphTable): Boolean = {
    val spark = gt.edges.sparkSession
    gt.numNodes <= maxDriverRankNodes(spark) &&
      gt.numEdges <= maxDriverLoopEdges(spark)
  }

  /** Minimal open-addressing long→long count accumulator (power-of-two
    * capacity, linear probing, −1 as the empty sentinel — packed keys
    * are always ≥ 0). Serializable so executor partials can cross as
    * instances too; [[DriverLoopHarness.labelCounts]] ships the denser
    * (keys, counts) array pair instead. */
  private[operators] final class LongCountMap(expected: Int)
      extends Serializable {
    private var cap = math.max(16,
      java.lang.Integer.highestOneBit(math.max(1, expected)) * 4)
    private var keys = Array.fill(cap)(-1L)
    private var vals = new Array[Long](cap)
    private var used = 0

    def add(k: Long, c: Long): Unit = {
      if (used * 4 >= cap * 3) grow()
      var i = (scala.util.hashing.byteswap64(k) & (cap - 1)).toInt
      var done = false
      while (!done) {
        val kk = keys(i)
        if (kk == k) { vals(i) += c; done = true }
        else if (kk == -1L) {
          keys(i) = k
          vals(i) = c
          used += 1
          done = true
        } else i = (i + 1) & (cap - 1)
      }
    }

    private def grow(): Unit = {
      val ok = keys
      val ov = vals
      cap *= 2
      keys = Array.fill(cap)(-1L)
      vals = new Array[Long](cap)
      used = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != -1L) add(ok(i), ov(i))
        i += 1
      }
    }

    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        if (keys(i) != -1L) f(keys(i), vals(i))
        i += 1
      }
    }

    /** Dense (keys, counts) copy — the executor→driver wire format. */
    def toArrays: (Array[Long], Array[Long]) = {
      val ks = new Array[Long](used)
      val vs = new Array[Long](used)
      var i = 0
      var j = 0
      while (i < keys.length) {
        if (keys(i) != -1L) { ks(j) = keys(i); vs(j) = vals(i); j += 1 }
        i += 1
      }
      (ks, vs)
    }
  }

  /** [[DriverRankHarness]]'s integer sibling for the loop twins: lifts
    * (src, dst[, w]) ONCE to dense-int-indexed primitive columnar
    * partitions cached on the executors; each round is one
    * zero-shuffle task wave over this cache against a broadcast of the
    * N-sized round state, per-partition partials merged on the driver.
    * Every consumer accumulates EXACT values (long counts, boolean
    * reachability, min over exact double sums), so merge order cannot
    * move a bit — unlike the rank harness, no decimal device is even
    * needed for bit-identity with the distributed bodies. */
  private final class DriverLoopHarness(
      ed: DataFrame, val nodeArr: Array[Any], withW: Boolean) {
    val spark: SparkSession = ed.sparkSession
    val nN: Int = nodeArr.length
    private val idx = new java.util.HashMap[Any, Integer](nN * 2)
    locally {
      var i = 0
      while (i < nN) { idx.put(nodeArr(i), i); i += 1 }
    }
    /** Dense index of a node value; -1 when absent (foreign seeds). */
    def indexOf(v: Any): Int = {
      val r = idx.get(v)
      if (r == null) -1 else r.intValue()
    }

    private val bcIdx = spark.sparkContext.broadcast(idx)
    private val edgeParts = {
      val bc = bcIdx // local alias: keep `this` out of the closure
      val w = withW
      ed.rdd.mapPartitions { rows =>
        val m = bc.value
        val si = new scala.collection.mutable.ArrayBuilder.ofInt
        val di = new scala.collection.mutable.ArrayBuilder.ofInt
        val wv = new scala.collection.mutable.ArrayBuilder.ofDouble
        rows.foreach { r =>
          si += m.get(r.get(0)).intValue()
          di += m.get(r.get(1)).intValue()
          if (w) wv += r.getDouble(2)
        }
        Iterator.single((si.result(), di.result(), wv.result()))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    }
    edgeParts.count() // materialize once; every wave reads the cache

    /** Per-(dst, src-label) offer counts for one label-propagation
      * round, merged driver-side as (dstIdx << 32 | lblIdx) → count.
      * Bounded by distinct (dst, label) pairs ≤ E — the reason for
      * the [[maxDriverLoopEdges]] gate. Partials cross as primitive
      * (keys, counts) arrays and merge into a [[LongCountMap]]: the
      * boxed java.util.HashMap form measured ~1.8 s/line at sf0.1
      * volumes (≈2M boxed entries serialized per round), the
      * primitive form ~0.1 s. */
    def labelCounts(lbl: Array[Int]): LongCountMap = {
      val bc = spark.sparkContext.broadcast(lbl)
      val partials = edgeParts.mapPartitions { it0 =>
        val l = bc.value
        val m = new LongCountMap(1 << 12)
        it0.foreach { case (si, di, _) =>
          var i = 0
          while (i < si.length) {
            m.add((di(i).toLong << 32) | (l(si(i)).toLong & 0xffffffffL),
              1L)
            i += 1
          }
        }
        Iterator.single(m.toArrays)
      }.collect()
      val merged = new LongCountMap(
        math.max(1 << 12, partials.iterator.map(_._1.length).sum))
      partials.foreach { case (ks, vs) =>
        var i = 0
        while (i < ks.length) { merged.add(ks(i), vs(i)); i += 1 }
      }
      bc.unpersist(blocking = false)
      merged
    }

    /** Per-src degree over edges whose BOTH endpoints are alive —
      * one k-core peeling round (the edge list is symmetric, so the
      * src-side count is the node's degree and the sum over nodes is
      * the surviving directed edge count). */
    def aliveDegrees(alive: Array[Boolean]): Array[Long] = {
      val bc = spark.sparkContext.broadcast(alive)
      val nCells = nN
      val sums = edgeParts.mapPartitions { it0 =>
        val a = bc.value
        val acc = new Array[Long](nCells)
        it0.foreach { case (si, di, _) =>
          var i = 0
          while (i < si.length) {
            if (a(si(i)) && a(di(i))) acc(si(i)) += 1L
            i += 1
          }
        }
        Iterator.single(acc)
      }.collect().foldLeft(new Array[Long](nN)) { (a, b) =>
        var j = 0
        while (j < a.length) { a(j) += b(j); j += 1 }
        a
      }
      bc.unpersist(blocking = false)
      sums
    }

    /** Nodes reachable in one hop from the frontier (BFS round). */
    def reachable(frontier: Array[Boolean]): Array[Boolean] = {
      val bc = spark.sparkContext.broadcast(frontier)
      val nCells = nN
      val reached = edgeParts.mapPartitions { it0 =>
        val f = bc.value
        val acc = new Array[Boolean](nCells)
        it0.foreach { case (si, di, _) =>
          var i = 0
          while (i < si.length) {
            if (f(si(i))) acc(di(i)) = true
            i += 1
          }
        }
        Iterator.single(acc)
      }.collect().foldLeft(new Array[Boolean](nN)) { (a, b) =>
        var j = 0
        while (j < a.length) { a(j) = a(j) || b(j); j += 1 }
        a
      }
      bc.unpersist(blocking = false)
      reached
    }

    /** Per-dst min of frontier(src) + w — one Bellman–Ford relaxation
      * round; NaN = no candidate. Sums and mins of exact doubles, so
      * merge order cannot change a value. */
    def relax(fdist: Array[Double]): Array[Double] = {
      val bc = spark.sparkContext.broadcast(fdist)
      val nCells = nN
      val cand = edgeParts.mapPartitions { it0 =>
        val f = bc.value
        val acc = Array.fill(nCells)(Double.NaN)
        it0.foreach { case (si, di, wv) =>
          var i = 0
          while (i < si.length) {
            val fs = f(si(i))
            if (!fs.isNaN) {
              val c = fs + wv(i)
              val d = di(i)
              if (acc(d).isNaN || c < acc(d)) acc(d) = c
            }
            i += 1
          }
        }
        Iterator.single(acc)
      }.collect().foldLeft(Array.fill(nN)(Double.NaN)) { (a, b) =>
        var j = 0
        while (j < a.length) {
          if (!b(j).isNaN && (a(j).isNaN || b(j) < a(j))) a(j) = b(j)
          j += 1
        }
        a
      }
      bc.unpersist(blocking = false)
      cand
    }

    def release(): Unit = {
      edgeParts.unpersist(blocking = false)
      bcIdx.unpersist(blocking = false)
    }
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def maxAbsDelta(a: Array[Double], b: Array[Double]): Double = {
    var m = 0.0
    var j = 0
    while (j < a.length) {
      val d = math.abs(a(j) - b(j))
      if (d > m) m = d
      j += 1
    }
    m
  }

  /** Driver-resident loop (see scale posture above): ranks live in a
    * dense array between rounds; each round is ONE zero-shuffle task
    * wave over the cached primitive edge partitions, exact-merged —
    * see [[DriverRankHarness]] for the device and the bit-identity
    * argument. */
  private def pageRankDriver(
      gt: GraphTable,
      iters: Int,
      damping: Double,
      danglingCorrection: Boolean,
      epsilon: Option[Double]): DataFrame = {
    val spark = gt.edges.sparkSession
    // this body re-scans the edge list every round — persist it when
    // the table was loaded from parquet (build-time tables already are)
    val ed =
      if (gt.cached) gt.edges
      else gt.edges.persist(StorageLevel.MEMORY_AND_DISK)
    val nodesDf =
      if (danglingCorrection) gt.nodes.select("node")
      else gt.nodes.where(col("is_src")).select("node")
    // the node list and per-round ranks are driver-resident (see the
    // scale-posture note above — the broadcast already pays this).
    // Non-dangling path: dst ⊆ src is the loud precondition above, so
    // every edge endpoint resolves in the dense index.
    val nodeArr: Array[Any] = nodesDf.collect().map(_.get(0))
    val h = new DriverRankHarness(ed, nodeArr)
    val nN = h.nN
    val n = nN.toDouble
    val danglingIdx: Array[Int] =
      if (danglingCorrection)
        gt.nodes.where(!col("is_src")).select("node")
          .collect().map(r => h.indexOf(r.get(0)))
      else Array.emptyIntArray

    val rankSchema = StructType(Seq(
      StructField("node", gt.nodes.schema.fields(0).dataType,
        nullable = false),
      StructField("rank", DoubleType, nullable = false)))
    def ranksDf(rank: Array[Double]): DataFrame =
      spark.createDataFrame(
        nodeArr.indices.map(i => Row(nodeArr(i), rank(i))).asJava,
        rankSchema)

    var rank: Array[Double] = Array.fill(nN)(1.0 / n)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // dangling mass, redistributed uniformly: the 12-dp DECIMAL sum
      // of sink ranks (exact, order-independent) over one double
      // division by N — free on the driver-resident rank array
      val dmn: Double =
        if (danglingIdx.isEmpty) 0.0
        else h.sinkMass(rank, danglingIdx) / n
      val sums = h.contribSums(rank)
      val next = new Array[Double](nN)
      var v = 0
      while (v < nN) {
        val s = if (sums(v) == null) 0.0 else sums(v).doubleValue()
        val inner = if (danglingCorrection) s + dmn else s
        next(v) = round9((1.0 - damping) / n + damping * inner)
        v += 1
      }
      converged = epsilon.exists(eps => maxAbsDelta(next, rank) <= eps)
      rank = next
      it += 1
    }
    h.release()
    if (!gt.cached) ed.unpersist(blocking = false)
    ranksDf(rank).orderBy(desc("rank"), col("node"))
  }

  /** Distributed loop (see scale posture above): the rank table stays
    * a hash-partitioned, per-round-checkpointed DataFrame; the driver
    * never holds a rank. */
  private def pageRankDistributed(
      gt: GraphTable,
      nL: Long,
      iters: Int,
      damping: Double,
      danglingCorrection: Boolean,
      epsilon: Option[Double]): DataFrame = {
    // edges co-partitioned on src ONCE; every round's rank join reuses
    // the cached partitioning, so only the N-row rank side ever moves
    val ed = gt.edges.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // node list co-partitioned on node: the per-round left join that
    // re-attaches zero-contribution nodes needs no exchange on it.
    // With the dangling correction the SINK FLAG rides the node (and
    // therefore rank) table, so the per-round sink-mass aggregate is a
    // filter over the already-checkpointed ranks — the old per-round
    // semi-join against a dangling table (and its exchanges) is gone.
    val nodesDf =
      (if (danglingCorrection)
         gt.nodes.select(col("node"), (!col("is_src")).as("sink"))
       else gt.nodes.where(col("is_src")).select("node"))
        .repartition(col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nL.toDouble
    // overlap the two cache-priming counts — independent jobs over
    // independent caches (the buildGraphTable device): each alone
    // underutilizes the cluster, and the E-row repartition dominates,
    // so the N-row one rides inside its tail
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fe = Future(ed.count())
      val fn = Future(nodesDf.count())
      Await.result(fe, Duration.Inf)
      Await.result(fn, Duration.Inf)
    }

    val baseTerm = (1.0 - damping) / n
    // round 0 is a LAZY projection over the cached node table — its
    // lineage is one cache read + withColumn, and the projection
    // preserves the cache's hash partitioning, so round 1 plans
    // exactly as it did over the old eager checkpoint (which only
    // re-materialized a second copy of the node rows). Checkpoints
    // start with round 1's output.
    var ranks = nodesDf.withColumn("rank", lit(1.0 / n))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // contributions: shuffled-hash join (rank side builds; edge side
      // streams from cache, already partitioned on src) + 12-dp DECIMAL
      // partial/final aggregate — the round's one E-row shuffle
      val contrib = ed
        .join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst").as("node"),
          round(col("rank") * col("w") / col("wout"), 12)
            .cast(Dec12).as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val sinkCols: Seq[org.apache.spark.sql.Column] =
        if (danglingCorrection) Seq(col("sink")) else Nil
      val joined = nodesDf
        .join(contrib.hint("shuffle_hash"), Seq("node"), "left")
        .select(Seq(col("node")) ++ sinkCols :+
          coalesce(col("s").cast("double"), lit(0.0)).as("sd"): _*)
      // dangling mass: a ONE-ROW aggregate over the checkpointed rank
      // table's sink rows, cross-joined into the update — the scalar
      // stays inside the plan, no driver collect, no per-round join
      val withDm =
        if (danglingCorrection) {
          val dm = ranks.where(col("sink"))
            .agg(coalesce(
              sum(round(col("rank"), 12).cast(Dec12)),
              lit(java.math.BigDecimal.ZERO).cast(Dec12))
              .as("dms"))
            .select((col("dms").cast("double") / lit(n)).as("dmn"))
          joined.crossJoin(broadcast(dm))
        } else joined.withColumn("dmn", lit(0.0))
      // sd + 0.0 == sd for the non-dangling path (contributions are
      // ≥ 0, so no -0.0 edge), keeping the two bodies bit-identical
      // partitioning-preserving eager checkpoint (graftshim): a plain
      // localCheckpoint reports UnknownPartitioning under AQE, which
      // re-exchanged the N-row rank side of BOTH next-round reads
      // (the contribution join and the sink-mass aggregate's scan) —
      // every round. Declaring the executed plan's own
      // hashpartitioning(node) on the checkpoint removes those two
      // exchanges from the steady-state round while keeping the O(1)
      // logical lineage a checkpoint gives (a persist chain doubles
      // the logical plan per round — ranks is referenced twice).
      val next = checkpointPartitioned(
        withDm
          .select(Seq(col("node")) ++ sinkCols :+
            round(lit(baseTerm) + lit(damping) * (col("sd") + col("dmn")), 9)
              .as("rank"): _*))
      converged = epsilon.exists { eps =>
        // bounded scalar action (one row), the K-Means-convergence
        // category — only paid when an epsilon is requested
        val prev = ranks.select(col("node"), col("rank").as("prev_rank"))
        next.join(prev, Seq("node"))
          .agg(max(abs(col("rank") - col("prev_rank"))).as("d"))
          .head().getDouble(0) <= eps
      }
      // the previous round's checkpoint blocks are dead once the next
      // round is materialized (and the epsilon diff has run); round 0
      // has none — it reads the node cache directly
      if (it > 0) releaseCheckpoint(ranks)
      ranks = next
      it += 1
    }
    ed.unpersist()
    nodesDf.unpersist()
    // the returned frame reads the final round's checkpoint blocks —
    // pinned while reachable, reclaimed by the ContextCleaner after
    ranks.select(col("node"), col("rank"))
      .orderBy(desc("rank"), col("node"))
  }

  // --------------------------------------- personalized PageRank

  /** Personalized (topic-sensitive) PageRank: the reset mass lands on
    * the `seeds` distribution instead of uniformly — rank measures
    * proximity to the seed set (the standard seed-biased relevance
    * device: related-document discovery from a trusted subset,
    * authority propagation from labeled-good domains in a curation
    * pipeline). Semantics per Haveliwala 2002 / the standard PPR
    * formulation:
    *
    *   rank'(v) = (1−d)·r(v) + d·(Σ_{u→v} rank(u)·w/Σw + dm·r(v))
    *
    * with r(v) = 1/|S| for v ∈ S else 0, and dm = the total dangling
    * (sink) mass — redistributed over the SEED distribution, so rank
    * mass is conserved and teleports never leak to unrelated nodes.
    * Initial ranks are r itself. Contributions are out-weight-
    * normalized (rank/outdeg on unweighted graphs).
    *
    * Scale posture: TWO loop bodies behind one set of semantics, the
    * [[pageRank]] discipline, auto-selected by node count against
    * [[maxDriverRankNodes]] unless `distributedRanks` pins one:
    *
    *  - distributed (the 100-TB path): ranks live as a
    *    hash-partitioned, per-round-checkpointed DataFrame carrying
    *    the per-node reset weight alongside (computed once from a
    *    seed semi-join; seeds are a DataFrame, not a driver
    *    collection, so the seed set itself can be large); per round
    *    one shuffled-hash join against the cached co-partitioned
    *    edges, a DECIMAL partial/final agg, and a one-row dangling
    *    aggregate cross-joined into the update. No driver collect
    *    anywhere (GraphSpec's listener assertion pins this body).
    *
    *  - driver-resident (the small-N fast path): the
    *    [[DriverRankHarness]] device — the reset weights join is
    *    collected as the N-bounded node table (bounded by N whatever
    *    the seed cardinality), and each round is one zero-shuffle
    *    task wave with the sink mass summed on the driver.
    *
    * Determinism: the same 12-dp DECIMAL contribution sums and 9-dp
    * HALF_UP damped update as [[pageRank]], with the fixed association
    * `(1−d)·r + d·(s + dm·r)` — bit-replayable in any IEEE engine
    * (the q113 oracle), and bit-identical across the two bodies by
    * the [[DriverRankHarness]] argument.
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      assumeDistinct: Boolean = false,
      epsilon: Option[Double] = None,
      weightCol: Option[String] = None,
      distributedRanks: Option[Boolean] = None): DataFrame = {
    val gt = buildGraphTable(edges, srcCol, dstCol, weightCol,
      assumeDistinct)
    try personalizedPageRankImpl(gt, seeds, iters, damping, epsilon,
      distributedRanks)
    finally gt.unpersist()
  }

  private[operators] def personalizedPageRankImpl(
      gt: GraphTable,
      seeds: DataFrame,
      iters: Int,
      damping: Double,
      epsilon: Option[Double],
      distributedRanks: Option[Boolean] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    epsilon.foreach(e => require(e >= 0.0, s"epsilon must be >= 0, got $e"))
    require(gt.numNodes > 0, "graph has no nodes")
    val seedsDf = seeds.select(col(seeds.columns.head).as("node")).distinct()
    // seed precondition checked BEFORE this call registers any cache —
    // a repeated misconfigured call must not accumulate persists
    val k = gt.nodes.join(seedsDf, Seq("node"), "left_semi").count()
    require(k > 0, "no seed node appears in the graph")
    val distributed = distributedRanks.getOrElse(
      gt.numNodes > maxDriverRankNodes(gt.edges.sparkSession))
    if (distributed)
      personalizedPageRankDistributed(gt, seedsDf, k, iters, damping,
        epsilon)
    else
      personalizedPageRankDriver(gt, seedsDf, k, iters, damping, epsilon)
  }

  /** Distributed PPR body (see the scale posture on
    * [[personalizedPageRank]]). */
  private def personalizedPageRankDistributed(
      gt: GraphTable,
      seedsDf: DataFrame,
      k: Long,
      iters: Int,
      damping: Double,
      epsilon: Option[Double]): DataFrame = withIterParallelism(gt) {
    val ed = gt.edges.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rv0 = 1.0 / k
    // node list with the per-node reset weight attached ONCE: 1/|S| on
    // seed nodes (seeds outside the graph are ignored), 0 elsewhere.
    // The SINK FLAG rides along (the pageRankDistributed device), so
    // the per-round sink-mass aggregate filters the checkpointed rank
    // table instead of semi-joining a dangling table.
    val nodesDf = gt.nodes
      .select(col("node"), (!col("is_src")).as("sink"))
      .join(seedsDf.withColumn("_g_seed", lit(true)), Seq("node"), "left")
      .select(col("node"), col("sink"),
        when(col("_g_seed").isNotNull, lit(rv0)).otherwise(lit(0.0)).as("rv"))
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // overlapped cache-priming counts + lazy round 0 — the
    // pageRankDistributed devices (see there for the rationale)
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fe = Future(ed.count())
      val fn = Future(nodesDf.count())
      Await.result(fe, Duration.Inf)
      Await.result(fn, Duration.Inf)
    }

    var ranks = nodesDf
      .select(col("node"), col("sink"), col("rv").as("rank"))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val contrib = ed
        .join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst").as("node"),
          round(col("rank") * col("w") / col("wout"), 12)
            .cast(Dec12).as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val joined = nodesDf
        .join(contrib.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), col("sink"), col("rv"),
          coalesce(col("s").cast("double"), lit(0.0)).as("sd"))
      // total sink mass (NOT divided by N — it rides the reset
      // distribution): a one-row aggregate over the checkpointed rank
      // table's sink rows, cross-joined in — no per-round join
      val dm = ranks.where(col("sink"))
        .agg(coalesce(
          sum(round(col("rank"), 12).cast(Dec12)),
          lit(java.math.BigDecimal.ZERO).cast(Dec12))
          .as("dms"))
        .select(col("dms").cast("double").as("dmt"))
      // partitioning-preserving checkpoint — the pageRankDistributed
      // device (see there): kills the per-round rank-side exchanges a
      // plain checkpoint's UnknownPartitioning re-introduced
      val next = checkpointPartitioned(
        joined.crossJoin(broadcast(dm))
          .select(col("node"), col("sink"),
            round(lit(1.0 - damping) * col("rv") +
              lit(damping) * (col("sd") + col("dmt") * col("rv")), 9)
              .as("rank")))
      converged = epsilon.exists { eps =>
        val prev = ranks.select(col("node"), col("rank").as("prev_rank"))
        next.join(prev, Seq("node"))
          .agg(max(abs(col("rank") - col("prev_rank"))).as("d"))
          .head().getDouble(0) <= eps
      }
      if (it > 0) releaseCheckpoint(ranks)
      ranks = next
      it += 1
    }
    ed.unpersist()
    nodesDf.unpersist()
    ranks.select(col("node"), col("rank"))
      .orderBy(desc("rank"), col("node"))
  }

  /** Driver-resident PPR twin ([[DriverRankHarness]] device): the
    * reset-weight join collapses to an N-bounded (node, rv) collect —
    * bounded by the node count whatever the seed cardinality — and
    * each round is one zero-shuffle task wave with the sink mass
    * riding the reset distribution, summed exactly on the driver. */
  private def personalizedPageRankDriver(
      gt: GraphTable,
      seedsDf: DataFrame,
      k: Long,
      iters: Int,
      damping: Double,
      epsilon: Option[Double]): DataFrame = {
    val spark = gt.edges.sparkSession
    val ed =
      if (gt.cached) gt.edges
      else gt.edges.persist(StorageLevel.MEMORY_AND_DISK)
    val rv0 = 1.0 / k
    // node list with the per-node reset weight attached ONCE: 1/|S| on
    // seed nodes (seeds outside the graph are ignored), 0 elsewhere
    val nodeRows = gt.nodes.select("node")
      .join(seedsDf.withColumn("_g_seed", lit(true)), Seq("node"), "left")
      .select(col("node"),
        when(col("_g_seed").isNotNull, lit(rv0)).otherwise(lit(0.0))
          .as("rv"))
      .collect()
    val nodeArr: Array[Any] = nodeRows.map(_.get(0))
    val h = new DriverRankHarness(ed, nodeArr)
    val nN = h.nN
    val rv: Array[Double] = nodeRows.map(_.getDouble(1))
    val danglingIdx: Array[Int] =
      gt.nodes.where(!col("is_src")).select("node")
        .collect().map(r => h.indexOf(r.get(0)))

    val rankSchema = StructType(Seq(
      StructField("node", gt.nodes.schema.fields(0).dataType,
        nullable = false),
      StructField("rank", DoubleType, nullable = false)))

    var rank: Array[Double] = rv.clone()
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // total sink mass (NOT divided by N — it rides the reset
      // distribution): exact 12-dp sum, one double conversion
      val dmt: Double =
        if (danglingIdx.isEmpty) 0.0
        else h.sinkMass(rank, danglingIdx)
      val sums = h.contribSums(rank)
      val next = new Array[Double](nN)
      var v = 0
      while (v < nN) {
        val sd = if (sums(v) == null) 0.0 else sums(v).doubleValue()
        next(v) = round9(
          (1.0 - damping) * rv(v) + damping * (sd + dmt * rv(v)))
        v += 1
      }
      converged = epsilon.exists(eps => maxAbsDelta(next, rank) <= eps)
      rank = next
      it += 1
    }
    h.release()
    if (!gt.cached) ed.unpersist(blocking = false)
    spark.createDataFrame(
      nodeArr.indices.map(i => Row(nodeArr(i), rank(i))).asJava,
      rankSchema)
      .orderBy(desc("rank"), col("node"))
  }

  // ------------------------------------------------------------- HITS

  /** HITS (hubs & authorities), Kleinberg 1999 — the Jacobi
    * (simultaneous-update) variant: each round computes BOTH scores
    * from the previous round's values,
    *
    *   auth'(v) = N₁( Σ_{u→v} hub(u) ),   hub'(v) = N₁( Σ_{v→w} auth(w) )
    *
    * with N₁ = L1 normalization (divide by the global sum, so each
    * score vector stays a distribution). The Gauss–Seidel textbook
    * ordering (hub from the NEW auth) converges to the same principal
    * singular vectors; the Jacobi form is chosen because every round
    * is a pure function of the previous one — replayable row-wise in
    * a recursive-CTE oracle (the q114 device), and the natural shape
    * for a distributed engine anyway (no intra-round dependency).
    *
    * Convergence: `iters` is the hard round cap; with
    * `epsilon = Some(eps)` the loop additionally stops at the first
    * round where max over nodes of max(|Δauth|, |Δhub|) <= eps
    * (inclusive — the same A7 fixpoint discipline as [[pageRank]]'s
    * epsilon; the check is a one-row aggregate per round).
    *
    * Scale posture: the distributed rank-table body again, with the
    * two gathers FUSED: ONE bidirectional edge cache holds each edge
    * twice — (src→dst, auth side) and (dst→src, hub side) — so a
    * round is ONE join of the score table against the cache and ONE
    * (node, conditional-sum × 2) aggregate, instead of two separately
    * cached edge tables each shuffling the scores per round (same row
    * volume through the exchanges, HALF the jobs/stages per round —
    * HitsSpec asserts the job count). Contributions are 12-dp DECIMAL
    * sums (exact, associative — the conditional split sums exactly
    * the same term multisets as the separate gathers, so scores are
    * bit-identical), the L1 totals are one-row aggregates cross-joined
    * in (a plan, not a collect), scores are 9-dp rounded and the frame
    * is per-round `localCheckpoint`ed. No driver collect anywhere in
    * the distributed body. Like [[pageRank]], TWO loop bodies behind
    * one set of semantics, auto-selected by node count against
    * [[maxDriverRankNodes]] unless `distributedScores` pins one: the
    * driver-resident twin folds BOTH gathers in one zero-shuffle task
    * wave per round over cached primitive edge partitions (the
    * [[pageRankDriver]] device — dense exact-decimal accumulators,
    * associative merge), bit-identical by the same argument since the
    * gathers sum identical 12-dp addend multisets and the L1 divide +
    * 9-dp round is the same IEEE expression either way.
    *
    * Returns (node, auth, hub), authorities first. */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      assumeDistinct: Boolean = false,
      epsilon: Option[Double] = None,
      distributedScores: Option[Boolean] = None): DataFrame = {
    val gt = buildGraphTable(edges, srcCol, dstCol, None, assumeDistinct)
    try hitsImpl(gt, iters, epsilon, distributedScores)
    finally gt.unpersist()
  }

  private[operators] def hitsImpl(
      gt: GraphTable,
      iters: Int,
      epsilon: Option[Double],
      distributedScores: Option[Boolean] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    epsilon.foreach(e => require(e >= 0.0, s"epsilon must be >= 0, got $e"))
    require(gt.numNodes > 0, "graph has no nodes")
    val distributed = distributedScores.getOrElse(
      gt.numNodes > maxDriverRankNodes(gt.edges.sparkSession))
    if (distributed) hitsDistributed(gt, iters, epsilon)
    else hitsDriver(gt, iters, epsilon)
  }

  /** Distributed HITS body (see the scale posture on [[hits]]). */
  private def hitsDistributed(
      gt: GraphTable,
      iters: Int,
      epsilon: Option[Double]): DataFrame = withIterParallelism(gt) {
    val e = gt.edges.select("src", "dst")
    // ONE bidirectional gather cache: (gfrom → gto) carries hub mass
    // when is_auth (the src→dst direction) and auth mass otherwise
    // (dst→src) — 2E rows co-partitioned on the score-join key, so
    // each round is one join + one aggregate, not two of each.
    val bi = e.select(col("src").as("gfrom"), col("dst").as("gto"),
        lit(true).as("is_auth"))
      .unionAll(e.select(col("dst").as("gfrom"), col("src").as("gto"),
        lit(false).as("is_auth")))
      .repartition(col("gfrom"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodesDf = gt.nodes.select("node")
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = gt.numNodes.toDouble
    bi.count(); nodesDf.count()

    val dec0 = lit(java.math.BigDecimal.ZERO).cast(Dec12)
    var scores = checkpointPartitioned(nodesDf
      .select(col("node"), lit(1.0 / n).as("auth"), lit(1.0 / n).as("hub")))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // fused gather: one pass over the bidirectional cache; the
      // conditional 12-dp DECIMAL sums split the auth and hub term
      // multisets exactly as the separate gathers did (null terms are
      // skipped by sum), so both totals stay bit-identical
      val perNode = bi
        .join(scores.hint("shuffle_hash"), col("gfrom") === col("node"))
        .select(col("gto").as("node"),
          when(col("is_auth"), round(col("hub"), 12).cast(Dec12)).as("ca"),
          when(!col("is_auth"), round(col("auth"), 12).cast(Dec12)).as("ch"))
        .groupBy("node")
        .agg(sum(col("ca")).as("sa"), sum(col("ch")).as("sh"))
      // L1 totals as ONE one-row aggregate, cross-joined (no collect)
      val tots = perNode.agg(coalesce(sum(col("sa")), dec0).as("ta"),
        coalesce(sum(col("sh")), dec0).as("th"))
      val next = checkpointPartitioned(nodesDf
        .join(perNode.hint("shuffle_hash"), Seq("node"), "left")
        .crossJoin(broadcast(tots))
        .select(col("node"),
          round(coalesce(col("sa").cast("double"), lit(0.0)) /
            col("ta").cast("double"), 9).as("auth"),
          round(coalesce(col("sh").cast("double"), lit(0.0)) /
            col("th").cast("double"), 9).as("hub")))
      converged = epsilon.exists { eps =>
        // one-row bounded scalar action per round, epsilon path only
        val prev = scores.select(col("node"), col("auth").as("pa"),
          col("hub").as("ph"))
        next.join(prev, Seq("node"))
          .agg(max(greatest(abs(col("auth") - col("pa")),
            abs(col("hub") - col("ph")))).as("d"))
          .head().getDouble(0) <= eps
      }
      releaseCheckpoint(scores)
      scores = next
      it += 1
    }
    bi.unpersist(); nodesDf.unpersist()
    scores.orderBy(desc("auth"), col("node"))
  }

  /** Driver-resident HITS twin (see [[pageRankDriver]] for the device
    * and the lossless-round-trip bit-identity argument): scores live
    * in dense arrays between rounds; each round is ONE zero-shuffle
    * task wave over cached primitive edge partitions folding BOTH
    * gathers at once — auth(dst) += r12(hub(src)) and
    * hub(src) += r12(auth(dst)) per edge, exact decimals rounded ONCE
    * per node per round (the distributed form rounds per edge row;
    * same addend values, same multisets) — merged exactly and
    * L1-normalized on the driver. */
  private def hitsDriver(
      gt: GraphTable,
      iters: Int,
      epsilon: Option[Double]): DataFrame = {
    import java.math.{BigDecimal => JBD}
    import java.math.RoundingMode.HALF_UP
    val spark = gt.edges.sparkSession
    val nodeArr: Array[Any] =
      gt.nodes.select("node").collect().map(_.get(0))
    val nN = nodeArr.length
    val n = nN.toDouble
    val idx = new java.util.HashMap[Any, Integer](nN * 2)
    var i0 = 0
    while (i0 < nN) { idx.put(nodeArr(i0), i0); i0 += 1 }

    val bcIdx = spark.sparkContext.broadcast(idx)
    val edgeParts = gt.edges.select(col("src"), col("dst"))
      .rdd.mapPartitions { rows =>
        val m = bcIdx.value
        val si = new scala.collection.mutable.ArrayBuilder.ofInt
        val di = new scala.collection.mutable.ArrayBuilder.ofInt
        rows.foreach { r =>
          si += m.get(r.get(0)).intValue()
          di += m.get(r.get(1)).intValue()
        }
        Iterator.single((si.result(), di.result()))
      }.persist(StorageLevel.MEMORY_AND_DISK)
    edgeParts.count()

    def merge(a: (Array[JBD], Array[JBD]), b: (Array[JBD], Array[JBD]))
        : (Array[JBD], Array[JBD]) = {
      var j = 0
      while (j < nN) {
        if (b._1(j) != null)
          a._1(j) = if (a._1(j) == null) b._1(j) else a._1(j).add(b._1(j))
        if (b._2(j) != null)
          a._2(j) = if (a._2(j) == null) b._2(j) else a._2(j).add(b._2(j))
        j += 1
      }
      a
    }
    val treeGate =
      spark.conf.getOption("spark.graft.graph.treeReducePartitions")
        .map(_.toInt).getOrElse(1024)

    var auth = Array.fill(nN)(1.0 / n)
    var hub = Array.fill(nN)(1.0 / n)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // one rounded decimal per node per round — the gathers add only
      // these table values, so the addend multisets match the
      // distributed form's per-edge-row rounding exactly
      val ra = new Array[JBD](nN)
      val rh = new Array[JBD](nN)
      var p = 0
      while (p < nN) {
        ra(p) = JBD.valueOf(auth(p)).setScale(12, HALF_UP)
        rh(p) = JBD.valueOf(hub(p)).setScale(12, HALF_UP)
        p += 1
      }
      val bc = spark.sparkContext.broadcast((ra, rh))
      val partials = edgeParts.mapPartitions { it0 =>
        val (ra0, rh0) = bc.value
        val aAcc = new Array[JBD](nN)
        val hAcc = new Array[JBD](nN)
        it0.foreach { case (si, di) =>
          var i = 0
          while (i < si.length) {
            val s = si(i)
            val d = di(i)
            aAcc(d) = if (aAcc(d) == null) rh0(s) else aAcc(d).add(rh0(s))
            hAcc(s) = if (hAcc(s) == null) ra0(d) else hAcc(s).add(ra0(d))
            i += 1
          }
        }
        Iterator.single((aAcc, hAcc))
      }
      val (sa, sh) =
        if (edgeParts.getNumPartitions > treeGate)
          partials.treeReduce(merge _, depth = 2)
        else partials.collect()
          .foldLeft((new Array[JBD](nN), new Array[JBD](nN)))(merge)
      bc.unpersist(blocking = false)
      // L1 totals: exact sums of the non-null cells — the same
      // multisets the distributed one-row aggregates sum
      var ta = JBD.ZERO
      var th = JBD.ZERO
      var t = 0
      while (t < nN) {
        if (sa(t) != null) ta = ta.add(sa(t))
        if (sh(t) != null) th = th.add(sh(t))
        t += 1
      }
      val taD = ta.doubleValue()
      val thD = th.doubleValue()
      val nextAuth = new Array[Double](nN)
      val nextHub = new Array[Double](nN)
      var v = 0
      while (v < nN) {
        nextAuth(v) = round9(
          (if (sa(v) == null) 0.0 else sa(v).doubleValue()) / taD)
        nextHub(v) = round9(
          (if (sh(v) == null) 0.0 else sh(v).doubleValue()) / thD)
        v += 1
      }
      converged = epsilon.exists { eps =>
        var m = 0.0
        var j = 0
        while (j < nN) {
          val d = math.max(math.abs(nextAuth(j) - auth(j)),
            math.abs(nextHub(j) - hub(j)))
          if (d > m) m = d
          j += 1
        }
        m <= eps
      }
      auth = nextAuth
      hub = nextHub
      it += 1
    }
    edgeParts.unpersist(blocking = false)
    bcIdx.unpersist(blocking = false)
    val schema = StructType(Seq(
      StructField("node", gt.nodes.schema.fields(0).dataType,
        nullable = false),
      StructField("auth", DoubleType, nullable = false),
      StructField("hub", DoubleType, nullable = false)))
    spark.createDataFrame(
      nodeArr.indices.map(i => Row(nodeArr(i), auth(i), hub(i))).asJava,
      schema)
      .orderBy(desc("auth"), col("node"))
  }

  // ---------------------------------------------- label propagation

  /** Synchronous (Jacobi) label-propagation community detection,
    * Raghavan et al. 2007 adapted to a deterministic simultaneous
    * update: every node starts with its own id as label; each round,
    * a node with at least one in-edge takes the most frequent label
    * among its in-neighbors' PREVIOUS-round labels, ties broken to
    * the smallest label; nodes with no in-edges keep their label. For
    * community detection feed the graph undirected (both directions —
    * in-neighbors = neighbors), the [[Components]] convention. Runs a
    * fixed `iters` rounds: the Jacobi form plus deterministic
    * tie-break makes every round a pure function of the previous one
    * — row-replayable in a recursive-CTE oracle (the q117 device) —
    * at the cost of possible 2-cycles on bipartite structures, which
    * a fixed round count simply samples.
    *
    * Scale posture: the distributed rank-table body — the edge list
    * cached co-partitioned on `src` once; per round one shuffled-hash
    * join labels→edges, an exact (dst, label) count aggregate, a
    * per-node argmax via one `min(struct(-cnt, label))` aggregate
    * (no window, no collect — all counts are exact longs, so no
    * rounding device is even needed), and a co-partitioned left join
    * back onto the label table, `localCheckpoint`ed per round.
    *
    * Returns (node, label) ordered by node. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    val gt = buildGraphTable(edges, srcCol, dstCol, None, assumeDistinct)
    try labelPropagationImpl(gt, iters)
    finally gt.unpersist()
  }

  private[operators] def labelPropagationImpl(
      gt: GraphTable,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(gt.numNodes > 0, "graph has no nodes")
    if (useDriverLoop(gt)) labelPropagationDriver(gt, iters)
    else labelPropagationDistributed(gt, iters)
  }

  /** Driver-resident label-propagation twin ([[DriverLoopHarness]]
    * device): labels live in a dense int array between rounds; each
    * round is ONE zero-shuffle task wave producing the exact
    * (dst, label) offer counts, argmax'd on the driver. The node list
    * is collected VALUE-ORDERED, so dense-index comparisons ARE value
    * comparisons and the "smallest label on ties" break matches the
    * distributed `min(struct(-cnt, lbl))` bit-for-bit (all counts are
    * exact longs — no rounding device anywhere). */
  private def labelPropagationDriver(
      gt: GraphTable, iters: Int): DataFrame = {
    val spark = gt.edges.sparkSession
    val nodeArr: Array[Any] =
      gt.nodes.select("node").orderBy("node").collect().map(_.get(0))
    val h = new DriverLoopHarness(
      gt.edges.select("src", "dst"), nodeArr, withW = false)
    val nN = h.nN
    var lbl = Array.tabulate(nN)(identity)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val cnts = h.labelCounts(lbl)
      // deterministic argmax per dst: most frequent label, smallest
      // (by value = by index) on ties; nodes with no in-edges keep
      val bestCnt = new Array[Long](nN)
      val bestLbl = new Array[Int](nN)
      java.util.Arrays.fill(bestLbl, -1)
      cnts.foreachEntry { (key, c) =>
        val d = (key >>> 32).toInt
        val l = (key & 0xffffffffL).toInt
        if (bestLbl(d) == -1 || c > bestCnt(d) ||
            (c == bestCnt(d) && l < bestLbl(d))) {
          bestCnt(d) = c
          bestLbl(d) = l
        }
      }
      var changed = 0L
      val next = new Array[Int](nN)
      var v = 0
      while (v < nN) {
        next(v) = if (bestLbl(v) == -1) lbl(v) else bestLbl(v)
        if (next(v) != lbl(v)) changed += 1
        v += 1
      }
      lbl = next
      converged = changed == 0L
      it += 1
    }
    h.release()
    val nodeType = gt.nodes.schema.fields(0).dataType
    val schema = StructType(Seq(
      StructField("node", nodeType, nullable = false),
      StructField("lbl", nodeType, nullable = false)))
    spark.createDataFrame(
      nodeArr.indices.map(i => Row(nodeArr(i), nodeArr(lbl(i)))).asJava,
      schema).orderBy("node")
  }

  /** Distributed label-propagation body (the 100 TB path — see the
    * scale posture on [[labelPropagation]]). */
  private def labelPropagationDistributed(
      gt: GraphTable,
      iters: Int): DataFrame = withIterParallelism(gt) {
    val ed = gt.edges.select("src", "dst").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()

    var labels = checkpointPartitioned(
      gt.nodes.select(col("node"), col("node").as("lbl"))
        .repartition(col("node")))
    // early fixpoint stop (the kCoreImpl stationary device): each round
    // is a pure function of the previous labels, so a round that changes
    // NOTHING proves every remaining round is a no-op — the result is
    // bit-identical to running the full `iters`, and the oracle's
    // cap-round recursive-CTE replay still matches. The per-round
    // changed-count is one aggregate over the freshly checkpointed
    // label table (N rows, co-partitioned — no extra shuffle).
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // exact in-neighbor label counts (one E-row shuffle), then the
      // deterministic argmax: min over (−count, label) structs picks
      // the most frequent label, smallest on ties
      val cnts = ed
        .join(labels.select("node", "lbl").hint("shuffle_hash"),
          col("src") === col("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val pick = cnts
        .groupBy(col("dst").as("node"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l")))
          .as("m"))
        .select(col("node"), col("m").getField("l").as("new_lbl"))
      val next = checkpointPartitioned(labels
        .select(col("node"), col("lbl").as("prev"))
        .join(pick.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_lbl"), col("prev")).as("lbl"),
          col("prev")))
      val changed = next.where(col("lbl") =!= col("prev")).count()
      releaseCheckpoint(labels)
      labels = next
      converged = changed == 0L
      it += 1
    }
    ed.unpersist()
    labels.select(col("node"), col("lbl")).orderBy(col("node"))
  }

  // ------------------------------------------- triangles / k-core

  /** Per-node triangle counts via degree orientation (the standard
    * scale device — Schank & Wagner 2005 / Suri & Vassilvitskii 2011's
    * MR adaptation): orient every undirected edge from its
    * lexicographically smaller (degree, id) endpoint to the larger, so
    * each triangle a≺b≺c appears exactly once as the wedge (a→b, a→c)
    * closed by the oriented edge b→c. The oriented out-degree is
    * O(√E), which bounds the wedge set by O(E^1.5) regardless of skew
    * — a hub of degree d contributes d wedges as a spoke, never d²,
    * because its own out-list is short. All counts are exact longs:
    * no rounding device needed anywhere.
    *
    * Requires a symmetric double-edged feed (the [[Components]] /
    * label-propagation convention) with no self-loops expected;
    * self-loops are filtered defensively, and a directed feed fails
    * the loud no-sink precondition instead of silently undercounting.
    *
    * Plan shape: degree attach is two N-row joins onto the E-row edge
    * list (broadcast-eligible when N is small, shuffled-hash at
    * scale); the wedge build is one self-join of the oriented list
    * co-partitioned on the spoke `u`; closing is one join of the
    * wedge set against the oriented list on (b, c). No window over
    * the corpus, no driver collect.
    *
    * Returns (node, deg, tri) for EVERY node (tri = 0 when the node
    * closes no triangle), ordered by node. */
  private[operators] def triangleCountsImpl(gt: GraphTable): DataFrame =
    triangleCountsCore(gt).orderBy("node")

  /** Unsorted (node, deg, tri) core shared by [[triangleCountsImpl]]
    * and [[clusteringCoefficientImpl]] — the latter persists it before
    * its full-output sort (see there). */
  private def triangleCountsCore(gt: GraphTable): DataFrame = {
    require(gt.numNodes > 0, "graph has no nodes")
    require(gt.numDangling == 0,
      "triangleCounts requires a symmetric double-edged feed " +
        s"(found ${gt.numDangling} sink nodes)")
    triangleCore(
      gt.edges.where(col("src") =!= col("dst")).select("src", "dst"),
      gt.numEdges)
  }

  /** Degree-oriented per-node triangle counts over a symmetric,
    * self-loop-free edge frame — the shared core of the exact counter
    * and the DOULION sampled estimator. Returns an eagerly
    * materialized (node, deg, tri) frame (checkpoint blocks, caches
    * released).
    *
    * SMALL-graph path (oriented list ≤ [[wedgeBroadcastMaxRows]]):
    * task counts are scale-aware — the E-row scaffolding stages run at
    * ⌈edgeHint/250k⌉ tasks and the wedge stages at ⌈wedges/250k⌉ (the
    * EXACT wedge volume Σ C(odeg(u),2), one cheap aggregate over the
    * already-persisted oriented list), both clamped to the session
    * setting — and the triangle close probes a BROADCAST of the tiny
    * oriented list, so the wedge stream never exchanges. ABOVE the
    * gate, the plan is the plain ambient-partition shuffle_hash form
    * with no probe job: the round-12 floors showed the probe +
    * scaffolding scope + broadcast each COST ~0.3-1 s in-bench at
    * sf0.1 volumes (q119 floor 4.97→6.12 with them, controls flat),
    * so the device is reserved for graphs small enough that the
    * broadcast pays for all three. Counts are integer-exact, so
    * neither partitioning nor join strategy can move a bit
    * (parity-pinned in GraphSpec). */
  private def triangleCore(e: DataFrame, edgeHint: Long): DataFrame =
    if (useCsr(e.sparkSession, edgeHint / 2)) triangleCoreCsr(e, edgeHint)
    else triangleCoreWedge(e, edgeHint)

  /** Triangle-close algorithm selector:
    * `spark.graft.graph.triangleAlgo` = `auto` (default), `wedge`
    * (the wedge-stream self-join + close join), or `csr` (grouped
    * adjacency: per-edge array intersection, no wedge stream —
    * [[triangleCoreCsr]]). Both are exact and parity-pinned in
    * GraphSpec. `auto` picks csr while the oriented list fits the
    * adjacency-broadcast envelope ([[csrMaxOrientedRows]]) and the
    * always-scaling wedge shuffle plan above it — set by round-13
    * min-of-8 A/B at sf0.1 (1.2M oriented rows: q119 3.34→2.12,
    * q120 3.22→2.25, q129 3.70→2.28, q127 2.99→2.10 s, controls
    * flat-to-worse under rising load), not theory. */
  private[operators] def triangleAlgo(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.graph.triangleAlgo")
      .getOrElse("auto") match {
      case a @ ("auto" | "wedge" | "csr") => a
      case bad => throw new IllegalArgumentException(
        s"spark.graft.graph.triangleAlgo must be 'auto', 'wedge' or " +
          s"'csr', got '$bad'")
    }

  /** Oriented-list row cap for the auto csr pick: the broadcast
    * adjacency packs one long per oriented edge plus one array row
    * per source node, so 2M rows ≈ 30-60 MB as a hashed relation —
    * comfortably inside executor memory with headroom over the 1.2M
    * rows the A/B measured. Beyond it `auto` falls back to the wedge
    * shuffle plan, whose exchanges scale with cluster width instead
    * of a single broadcast (a 100 TB edge list must never be forced
    * through one driver collect). Override with
    * `spark.graft.graph.csrMaxOrientedRows`. */
  private[operators] def csrMaxOrientedRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.graph.csrMaxOrientedRows")
      .map { v =>
        try v.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            "spark.graft.graph.csrMaxOrientedRows must be a long row " +
              s"count, got '$v'")
        }
      }.getOrElse(2000000L)

  private[operators] def useCsr(
      spark: SparkSession, orientedRows: Long): Boolean =
    triangleAlgo(spark) match {
      case "csr" =>
        // forcing csr does NOT bypass the broadcast envelope: a stale
        // conf pinned on a graph 100× bigger than when it was set
        // would force-collect the whole adjacency onto the driver and
        // OOM. Fail soft to the wedge shuffle plan with a warning; the
        // cap itself stays overridable via csrMaxOrientedRows.
        val cap = csrMaxOrientedRows(spark)
        val fits = orientedRows <= cap
        if (!fits) org.slf4j.LoggerFactory.getLogger("graft.Graph").warn(
          s"triangleAlgo=csr forced but orientedRows=$orientedRows > " +
            s"csrMaxOrientedRows=$cap — falling back to the wedge " +
            "shuffle plan (raise spark.graft.graph.csrMaxOrientedRows " +
            "to force-broadcast anyway)")
        fits
      case "wedge" => false
      case _       => orientedRows <= csrMaxOrientedRows(spark)
    }

  /** Grouped-adjacency (CSR-style) triangle counting: orient edges by
    * (degree, id) as in the wedge path, group each node's oriented
    * out-neighbors into ONE array row, broadcast that adjacency table,
    * and close triangles per oriented edge as an array intersection
    * `N⁺(u) ∩ N⁺(v)` — triangle (u,v,w) (u lowest, w highest in
    * orientation order) is found exactly once, at its base edge (u,v).
    *
    * Why this can beat the wedge stream: the work is the same
    * Σ(d⁺(u)+d⁺(v)) = O(E^1.5) bound, but it runs as tight per-row
    * array ops instead of W join-machinery rows, and NOTHING of wedge
    * volume ever moves — the adjacency broadcast packs E longs into N
    * array rows (~an order denser than a hashed E-row relation, which
    * is what sank the r12 broadcast device at 1.2M rows), the closing
    * stage is fully map-side, and the only shuffles are the E-row
    * adjacency groupBy and the 3T-row credit aggregate (partial-agg
    * combined map-side). At 100 TB the adjacency table outgrows the
    * broadcast envelope and the wedge plan is the right one — this
    * path's value is the (large) mid range where N-array adjacency
    * fits memory but the wedge stream dominates wall time. */
  private def triangleCoreCsr(e: DataFrame, edgeHint: Long): DataFrame = {
    // AMBIENT task counts throughout, no scoping: the closing stage's
    // work is WEDGE-volume-proportional (Σ d⁺(u)+d⁺(v) per edge) but
    // runs over the E-row oriented list, so narrowing tasks to
    // E/250k (the iterative-body heuristic) would starve it — the r12
    // floors already showed narrowed scope costing on big graphs.
    // (Ambient planning is also what makes the LAZY return below safe:
    // unlike the wedge path, no conf scope has to be alive when the
    // caller's action finally plans the exchanges.)
    {
      val deg = graft.CachePool.swap("graph.tri.deg",
        e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      val orient = graft.CachePool.swap("graph.tri.orient", e
        .join(deg.select(col("node").as("src"), col("deg").as("ds")), "src")
        .join(deg.select(col("node").as("dst"), col("deg").as("dd")), "dst")
        .where(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")))
        .select(col("src").as("u"), col("dst").as("v"))
        .persist(StorageLevel.MEMORY_AND_DISK))
      // adjacency rows SORTED once per group (one cheap N-row pass):
      // the per-edge close is then a linear two-pointer merge
      // (graft_sorted_intersect) instead of array_intersect's per-ROW
      // hash-set build + probe. Long-typed nodes only — other types
      // keep the unsorted collect + array_intersect (the intersection
      // SET is identical either way; every consumer below is an
      // order-invariant count)
      val longNodes =
        e.schema.head.dataType == org.apache.spark.sql.types.LongType
      val adj = graft.CachePool.swap("graph.tri.adj",
        orient.groupBy(col("u"))
          .agg((if (longNodes) sort_array(collect_list(col("v")))
            else collect_list(col("v"))).as("nbrs"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      adj.count() // materialize once; both broadcast builds read the cache
      // INNER join on the v side: an edge whose head has no oriented
      // out-neighbors can close nothing, so dropping it is exact
      val closed = orient
        .join(broadcast(adj), Seq("u"))
        .join(broadcast(adj.select(col("u").as("v"),
          col("nbrs").as("nbrs_v"))), Seq("v"))
        .select(col("u"), col("v"),
          (if (longNodes) sortedIntersectCol(col("nbrs"), col("nbrs_v"))
           else array_intersect(col("nbrs"), col("nbrs_v"))).as("ws"))
        .where(size(col("ws")) > 0)
      // ONE pass: T triangle rows → 3T node credits → partial-agg'd
      // count (u and v are in every triangle of their base edge; each
      // w in exactly one)
      val perNode = closed
        .select(col("u"), col("v"), explode(col("ws")).as("w"))
        .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri"))
      // LAZY result (the adamicAdarImpl discipline): the old eager
      // `localCheckpoint` materialized every per-node row only for a
      // top-k caller to re-scan them — dropping it lets q119-style
      // callers fuse sort/limit into TakeOrdered over the close
      // pipeline, and the plan dumps show the real close instead of a
      // bare checkpoint scan. The deg/orient/adj caches the plan
      // references are generation-tracked in CachePool (the next
      // triangle call or releaseAll frees them; an evicted cache
      // recomputes from lineage — correctness unaffected).
      deg
        .join(perNode.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"))
    }
  }

  private def triangleCoreWedge(e: DataFrame, edgeHint: Long): DataFrame = {
    val spark = e.sparkSession
    val ceiling = spark.sessionState.conf.numShufflePartitions
    val small = edgeHint / 2 <= wedgeBroadcastMaxRows(spark)
    val pE = if (small) iterPartitions(ceiling, edgeHint) else ceiling
    withShufflePartitions(spark, pE) {
    // symmetric feed: degree = out-edge count (NOT the weight total —
    // triangles are a structural count, so parallel-edge weights are
    // irrelevant by construction: the edge list is already distinct)
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val orient = e
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), "dst")
      .where(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")))
      .select(col("src").as("u"), col("dst").as("v"), col("dd").as("dv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // exact wedge volume, small path only (materializes deg + orient
    // as a side effect); the big path pays no probe job
    val pW =
      if (!small) ceiling
      else {
        val wedgeRows = orient.groupBy("u").agg(count(lit(1)).as("d"))
          .agg(coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0L))
            .cast("long"))
          .head.getLong(0)
        iterPartitions(ceiling, math.max(edgeHint, wedgeRows))
      }
    val out = withShufflePartitions(spark, pW) {
      // The ONE expensive exchange in this plan is the O(E^1.5)-row
      // wedge stream feeding the triangle-close join on (b,c). On the
      // small path the E/2-row close side broadcasts instead, so wedge
      // generation, the close, and the partial count fuse into one
      // map-side codegen stage with no wedge exchange at all. The
      // wedge SELF-join stays shuffle_hash in both modes — it only
      // exchanges 2·(E/2) oriented rows, and hashing the E-row list
      // while streaming wedges past it beats sort-merge (which would
      // sort the wedge stream) by ~2× measured.
      val wedges = orient.select(col("u"), col("v").as("b"), col("dv").as("db"))
        .join(orient.select(col("u"), col("v").as("c"), col("dv").as("dc"))
          .hint("shuffle_hash"), "u")
        .where(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
        .select(col("u"), col("b"), col("c"))
      val closeSide = orient.select(col("u").as("b"), col("v").as("c"))
      val tri = wedges
        .join(if (small) broadcast(closeSide)
          else closeSide.hint("shuffle_hash"), Seq("b", "c"))
      val perNode = tri
        .select(explode(array(col("u"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri"))
      // materialize the N-row result, then release the E-row caches —
      // the returned frame reads its own checkpoint blocks (pinned while
      // reachable, reclaimed by the ContextCleaner), not the caches
      deg
        .join(perNode.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"))
        .localCheckpoint(eager = true)
    }
    orient.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    out
    }
  }

  /** DOULION (Tsourakakis, Kang & Faloutsos 2009): estimate the global
    * triangle count from a sparsified graph — keep each undirected
    * edge independently with probability keepPct/100 and scale the
    * sample's exact triangle count by (100/keepPct)³. The 100-TB form
    * of triangle counting: the wedge stage runs on p·E edges
    * (p³ of the wedge volume), and the estimate is unbiased with
    * variance that vanishes as p²·T grows.
    *
    * Determinism device: the "coin flip" is the seeded-md5 hash of the
    * edge (the q54/q89 sampling device) — 8 hex chars parsed to a
    * long, mod 100 < keepPct — so the sample, and therefore the whole
    * estimate, is bit-reproducible under any partitioning, retry, or
    * engine. The estimate tri·10⁶/keepPct³ is one exact-integer
    * multiply and one double division — identical everywhere.
    *
    * Returns one row: (n_sampled_edges, tri_sampled, est_triangles).
    */
  private[operators] def triangleCountEstimateImpl(
      gt: GraphTable, keepPct: Int, seed: Long): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100,
      s"keepPct must be in [1, 100], got $keepPct")
    require(gt.numNodes > 0, "graph has no nodes")
    require(gt.numDangling == 0,
      "triangleCountEstimate requires a symmetric double-edged feed " +
        s"(found ${gt.numDangling} sink nodes)")
    val pairs = gt.edges
      .where(col("src") < col("dst"))
      .where(conv(substring(
          md5(concat(lit(s"$seed-"), col("src").cast("string"),
            lit("-"), col("dst").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100 < keepPct)
      .select("src", "dst")
    val sym = pairs.union(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    // The size hint is the EXPECTED sampled edge count, not the actual
    // sample cardinality — the gate is therefore probabilistic for
    // DOULION (a sample landing above the estimate broadcasts a
    // slightly larger relation). A pure performance heuristic: results
    // stay exact either way (parity-pinned plans), and counting the
    // sample first would cost an extra job per estimate call.
    val perNode = triangleCore(sym,
      math.max(1L, gt.numEdges * keepPct / 100))
    val scale = 1000000.0 / (keepPct.toLong * keepPct * keepPct).toDouble
    perNode
      .agg(
        coalesce((sum(col("deg")) / lit(2L)).cast("long"), lit(0L))
          .as("n_sampled_edges"),
        coalesce((sum(col("tri")) / lit(3L)).cast("long"), lit(0L))
          .as("tri_sampled"))
      .withColumn("est_triangles",
        col("tri_sampled").cast("double") * lit(scale))
  }

  /** Local clustering coefficient cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))
    * (0 when deg < 2) on top of [[triangleCountsImpl]]. The quotient is
    * a single double division of exact longs — bit-identical in any
    * engine that evaluates the same expression, so no rounding device
    * is needed. Returns (node, deg, tri, cc) ordered by node. */
  private[operators] def clusteringCoefficientImpl(gt: GraphTable): DataFrame = {
    // FULL-output consumer: a global sort directly over the lazy close
    // pipeline would execute the close twice (the range partitioner's
    // sampling pass runs the child once before the sort pass) — so the
    // N-row core is persisted (lazy, CachePool-tracked): the sampling
    // pass materializes it once and the sort pass reads the cache.
    // Top-k consumers (q119-style) fuse into TakeOrdered and need no
    // such guard.
    val core = graft.CachePool.swap("graph.tri.ccbase",
      triangleCountsCore(gt).persist(StorageLevel.MEMORY_AND_DISK))
    core
      .withColumn("cc",
        when(col("deg") < 2, lit(0.0))
          .otherwise(col("tri") * lit(2.0) /
            (col("deg") * (col("deg") - lit(1)))))
      .orderBy("node")
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k
    * (Seidman 1983), by synchronous (Jacobi) peeling: each round drops
    * ALL nodes with current degree < k simultaneously — an edge
    * survives iff both endpoints' round-r degrees are ≥ k. Converges
    * to the same unique k-core as sequential peeling (degrees only
    * shrink, the core is closed under both schedules), and the Jacobi
    * form makes every round a pure function of the previous edge set —
    * row-replayable in a recursive-CTE oracle (the q117 device). The
    * loop stops at the first stationary round (edge count unchanged —
    * the node set shrinks monotonically, so equal counts ⟺ fixpoint;
    * a one-row bounded scalar per round, the A7 category) or at the
    * `maxRounds` cap; because the fixpoint is stationary, the result
    * equals the cap-round state of a full replay either way.
    *
    * Requires a symmetric double-edged feed. Scale posture: per round
    * one degree aggregate co-partitioned on `src` and two semi-joins
    * of the E-row edge list against the (shrinking) N-row keep list;
    * the edge frame is `localCheckpoint`ed per round with the
    * [[Components]] release bookkeeping. All counts exact longs.
    *
    * Returns surviving (node, deg) — degree WITHIN the core — ordered
    * by node (empty when the k-core is empty). */
  private[operators] def kCoreImpl(
      gt: GraphTable, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(gt.numNodes > 0, "graph has no nodes")
    require(gt.numDangling == 0,
      "kCore requires a symmetric double-edged feed " +
        s"(found ${gt.numDangling} sink nodes)")
    if (useDriverLoop(gt)) kCoreDriver(gt, k, maxRounds)
    else kCoreDistributed(gt, k, maxRounds)
  }

  /** Driver-resident k-core twin ([[DriverLoopHarness]] device): the
    * alive set lives in a dense boolean array between rounds; each
    * round is ONE zero-shuffle task wave computing exact per-node
    * degrees over both-alive edges (the symmetric feed makes the
    * src-side count the degree and its sum the surviving edge count,
    * so the stationary check needs no extra job). The peel set, keep
    * test, and stationary check are integer-exact — bit-identical to
    * the distributed rounds by construction. */
  private def kCoreDriver(
      gt: GraphTable, k: Int, maxRounds: Int): DataFrame = {
    val spark = gt.edges.sparkSession
    val nodeArr: Array[Any] =
      gt.nodes.select("node").collect().map(_.get(0))
    val h = new DriverLoopHarness(
      gt.edges.where(col("src") =!= col("dst")).select("src", "dst"),
      nodeArr, withW = false)
    val nN = h.nN
    var alive = Array.fill(nN)(true)
    var deg = h.aliveDegrees(alive)
    var m = 0L
    var v0 = 0
    while (v0 < nN) { m += deg(v0); v0 += 1 }
    var it = 0
    var converged = m == 0L
    while (it < maxRounds && !converged) {
      val keep = new Array[Boolean](nN)
      var v = 0
      while (v < nN) { keep(v) = alive(v) && deg(v) >= k; v += 1 }
      val deg2 = h.aliveDegrees(keep)
      var m2 = 0L
      v = 0
      while (v < nN) { m2 += deg2(v); v += 1 }
      converged = m2 == m || m2 == 0L
      alive = keep
      deg = deg2
      m = m2
      it += 1
    }
    h.release()
    val nodeType = gt.nodes.schema.fields(0).dataType
    val schema = StructType(Seq(
      StructField("node", nodeType, nullable = false),
      StructField("deg", org.apache.spark.sql.types.LongType,
        nullable = false)))
    val rows = nodeArr.indices.collect {
      case i if deg(i) > 0L => Row(nodeArr(i), deg(i))
    }
    spark.createDataFrame(rows.asJava, schema).orderBy("node")
  }

  /** Distributed k-core body (the 100 TB path — see the scale posture
    * on the impl doc above). */
  private def kCoreDistributed(
      gt: GraphTable, k: Int, maxRounds: Int): DataFrame =
    withIterParallelism(gt) {
    var edges = checkpointPartitioned(
      gt.edges.where(col("src") =!= col("dst"))
        .select("src", "dst")
        .repartition(col("src")))
    var m = edges.count()
    var it = 0
    var converged = m == 0L
    while (it < maxRounds && !converged) {
      val keep = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("d"))
        .where(col("d") >= k)
        .select("node")
      val next = checkpointPartitioned(edges
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst"))
      val m2 = next.count()
      converged = m2 == m || m2 == 0L
      releaseCheckpoint(edges)
      edges = next
      m = m2
      it += 1
    }
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .orderBy("node")
  }

  // --------------------------------------------- BFS / link features

  /** Breadth-first hop levels from a seed set: level(v) = the minimum
    * number of edges (following src→dst) from any seed to v, up to
    * `maxDepth`. The reachability/proximity primitive behind
    * "within-k-hops-of-known-good" curation filters. Levels are exact
    * ints with a unique fixpoint, so the result needs no rounding
    * device and replays in a recursive-CTE oracle (recursive UNION —
    * the DISTINCT form — keeps the oracle's state polynomial instead
    * of enumerating paths).
    *
    * Scale posture: textbook frontier expansion — the edge list is
    * cached co-partitioned on `src` once; per round the (shrinking)
    * frontier joins it (only frontier rows move), discovered nodes
    * are removed by an anti-join against the levels table, and both
    * frames are `localCheckpoint`ed with the [[Components]] release
    * bookkeeping. Stops at the first empty frontier or at `maxDepth`.
    *
    * Returns (node, lvl) for reached nodes (seeds at 0), ordered by
    * node. Seeds not present in the graph are ignored. */
  private[operators] def bfsLevelsImpl(
      gt: GraphTable, seeds: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    require(gt.numNodes > 0, "graph has no nodes")
    if (useDriverLoop(gt)) bfsLevelsDriver(gt, seeds, maxDepth)
    else bfsLevelsDistributed(gt, seeds, maxDepth)
  }

  /** Driver-resident BFS twin ([[DriverLoopHarness]] device): the
    * frontier and level table live in dense arrays between rounds;
    * each round is ONE zero-shuffle task wave marking one-hop
    * reachability. Levels are exact ints with a unique fixpoint —
    * bit-identical to the distributed rounds by construction. Seeds
    * absent from the graph are ignored (the distributed semi-join). */
  private def bfsLevelsDriver(
      gt: GraphTable, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val spark = gt.edges.sparkSession
    val nodeArr: Array[Any] =
      gt.nodes.select("node").collect().map(_.get(0))
    val h = new DriverLoopHarness(
      gt.edges.select("src", "dst"), nodeArr, withW = false)
    val nN = h.nN
    val seedIdx = seeds.select(col(seeds.columns.head).as("node"))
      .distinct().collect().map(r => h.indexOf(r.get(0)))
      .filter(_ >= 0)
    val lvl = Array.fill(nN)(-1)
    var frontier = new Array[Boolean](nN)
    seedIdx.foreach { i => lvl(i) = 0; frontier(i) = true }
    var depth = 0
    var frontierSize = seedIdx.length.toLong
    while (depth < maxDepth && frontierSize > 0) {
      depth += 1
      val reached = h.reachable(frontier)
      val nf = new Array[Boolean](nN)
      frontierSize = 0L
      var v = 0
      while (v < nN) {
        if (reached(v) && lvl(v) == -1) {
          lvl(v) = depth
          nf(v) = true
          frontierSize += 1
        }
        v += 1
      }
      frontier = nf
    }
    h.release()
    val nodeType = gt.nodes.schema.fields(0).dataType
    val schema = StructType(Seq(
      StructField("node", nodeType, nullable = false),
      StructField("lvl", org.apache.spark.sql.types.IntegerType,
        nullable = false)))
    val rows = nodeArr.indices.collect {
      case i if lvl(i) >= 0 => Row(nodeArr(i), lvl(i))
    }
    spark.createDataFrame(rows.asJava, schema).orderBy("node")
  }

  /** Distributed BFS body (the 100 TB path — see the scale posture on
    * the impl doc above). */
  private def bfsLevelsDistributed(
      gt: GraphTable, seeds: DataFrame, maxDepth: Int): DataFrame =
    withIterParallelism(gt) {
    val seedsDf = seeds.select(col(seeds.columns.head).as("node")).distinct()
    val ed = gt.edges.select("src", "dst").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()
    var levels = checkpointPartitioned(
      gt.nodes.join(seedsDf, Seq("node"), "left_semi")
        .select(col("node"), lit(0).as("lvl"))
        .repartition(col("node")))
    var frontier = checkpointPartitioned(levels.select("node"))
    var depth = 0
    var frontierSize = frontier.count()
    while (depth < maxDepth && frontierSize > 0) {
      depth += 1
      val next = checkpointPartitioned(ed
        .join(frontier.withColumnRenamed("node", "src")
          .hint("shuffle_hash"), "src")
        .select(col("dst").as("node")).distinct()
        .join(levels, Seq("node"), "left_anti"))
      frontierSize = next.count()
      val newLevels = checkpointPartitioned(levels
        .unionByName(next.select(col("node"), lit(depth).as("lvl"))))
      releaseCheckpoint(levels)
      releaseCheckpoint(frontier)
      levels = newLevels
      frontier = next
    }
    ed.unpersist()
    releaseCheckpoint(frontier) // the levels union re-checkpointed it
    levels.orderBy("node")
  }

  /** Weighted single-source(-set) shortest paths — [[bfsLevelsImpl]]'s
    * weighted sibling: Bellman–Ford frontier relaxation bounded at
    * `maxRounds` edges per path, over the artifact's `w` column. The
    * cost/proximity primitive behind "closest known-good document" and
    * weighted within-k-hops curation filters.
    *
    * Determinism: with integer-valued weights (the purchase-count
    * graphs), every path cost is an exact sum of integers in double
    * (≤ 2^53) and `min` over exact values is engine-independent — no
    * rounding device needed. The fixpoint is stationary (distances are
    * monotone non-increasing and bounded), so the early-stopped engine
    * table equals the oracle's cap-round replay (the q121 argument);
    * the oracle replays rounds with a zero-weight self-loop added to
    * the edge set, which turns `min(carry, relax)` into one `min` over
    * in-edges — a single recursive reference.
    *
    * Scale posture: the edge list is cached co-partitioned on `src`
    * once; per round only the IMPROVED (node, dist) rows join it
    * (frontier shrinks as distances settle), the candidate min is a
    * partial/final aggregate, and the cumulative table is refreshed by
    * a union + min-aggregate on the node key. Both iteration frames
    * are `localCheckpoint`ed per round with the [[Components]] release
    * bookkeeping, so the analyzed plan stays O(1) across rounds.
    *
    * Returns (node, dist) for nodes reachable within `maxRounds` hops
    * (seeds at 0.0), ordered by node. Seeds absent from the graph are
    * ignored. */
  private[operators] def shortestPathsImpl(
      gt: GraphTable, seeds: DataFrame, maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0, got $maxRounds")
    require(gt.numNodes > 0, "graph has no nodes")
    if (useDriverLoop(gt)) shortestPathsDriver(gt, seeds, maxRounds)
    else shortestPathsDistributed(gt, seeds, maxRounds)
  }

  /** Driver-resident Bellman–Ford twin ([[DriverLoopHarness]] device):
    * the distance table and improved-frontier live in dense double
    * arrays between rounds; each round is ONE zero-shuffle task wave
    * computing per-dst candidate minima (NaN = no candidate). Every
    * candidate is ONE double add of exact values and `min` over exact
    * doubles is order-free, so the rounds are bit-identical to the
    * distributed body's relax/improve/refresh joins. Seeds absent
    * from the graph are ignored (the distributed semi-join). */
  private def shortestPathsDriver(
      gt: GraphTable, seeds: DataFrame, maxRounds: Int): DataFrame = {
    val spark = gt.edges.sparkSession
    val nodeArr: Array[Any] =
      gt.nodes.select("node").collect().map(_.get(0))
    val h = new DriverLoopHarness(
      gt.edges.select("src", "dst", "w"), nodeArr, withW = true)
    val nN = h.nN
    val seedIdx = seeds.select(col(seeds.columns.head).as("node"))
      .distinct().collect().map(r => h.indexOf(r.get(0)))
      .filter(_ >= 0)
    val dist = Array.fill(nN)(Double.NaN)
    var fdist = Array.fill(nN)(Double.NaN)
    seedIdx.foreach { i => dist(i) = 0.0; fdist(i) = 0.0 }
    var round = 0
    var frontierSize = seedIdx.length.toLong
    while (round < maxRounds && frontierSize > 0) {
      round += 1
      val cand = h.relax(fdist)
      val nf = Array.fill(nN)(Double.NaN)
      frontierSize = 0L
      var v = 0
      while (v < nN) {
        val c = cand(v)
        if (!c.isNaN && (dist(v).isNaN || c < dist(v))) {
          dist(v) = c
          nf(v) = c
          frontierSize += 1
        }
        v += 1
      }
      fdist = nf
    }
    h.release()
    val nodeType = gt.nodes.schema.fields(0).dataType
    val schema = StructType(Seq(
      StructField("node", nodeType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val rows = nodeArr.indices.collect {
      case i if !dist(i).isNaN => Row(nodeArr(i), dist(i))
    }
    spark.createDataFrame(rows.asJava, schema).orderBy("node")
  }

  /** Distributed Bellman–Ford body (the 100 TB path — see the scale
    * posture on the impl doc above). */
  private def shortestPathsDistributed(
      gt: GraphTable, seeds: DataFrame, maxRounds: Int): DataFrame =
    withIterParallelism(gt) {
    val seedsDf = seeds.select(col(seeds.columns.head).as("node")).distinct()
    val ed = gt.edges.select("src", "dst", "w").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()
    var dist = checkpointPartitioned(
      gt.nodes.join(seedsDf, Seq("node"), "left_semi")
        .select(col("node"), lit(0.0).as("dist"))
        .repartition(col("node")))
    var frontier = checkpointPartitioned(dist.select("node", "dist"))
    var round = 0
    var frontierSize = frontier.count()
    while (round < maxRounds && frontierSize > 0) {
      round += 1
      val relaxed = ed
        .join(frontier.withColumnRenamed("node", "src")
          .hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .groupBy("node").agg(min(col("dist")).as("dist"))
      val improved = checkpointPartitioned(relaxed
        .join(dist.select(col("node"), col("dist").as("old")),
          Seq("node"), "left")
        .where(col("old").isNull || col("dist") < col("old"))
        .select("node", "dist"))
      frontierSize = improved.count()
      val newDist = checkpointPartitioned(dist.unionByName(improved)
        .groupBy("node").agg(min(col("dist")).as("dist")))
      releaseCheckpoint(dist)
      releaseCheckpoint(frontier)
      dist = newDist
      frontier = improved
    }
    ed.unpersist()
    releaseCheckpoint(frontier)
    dist.orderBy("node")
  }

  /** Neighborhood Jaccard of every edge's endpoints — the tie-strength
    * / link-feature primitive ("related products" on a co-purchase
    * graph): for an undirected edge {u, v},
    *
    *   jac = |N(u)∩N(v)| / (deg(u) + deg(v) − |N(u)∩N(v)|)
    *
    * where the common-neighbor count is exactly the number of
    * triangles through the edge — so the computation reuses the
    * degree-oriented triangle machinery and inherits its O(E^1.5)
    * wedge bound (never Σdeg², never all node pairs). All counts are
    * exact longs; the quotient is one double division — bit-identical
    * in any engine.
    *
    * Requires a symmetric double-edged feed. Returns one row per
    * undirected edge: (src, dst, deg_src, deg_dst, common, jac) with
    * src < dst, ordered by (jac DESC, src, dst). */
  private[operators] def edgeJaccardImpl(gt: GraphTable): DataFrame = {
    require(gt.numNodes > 0, "graph has no nodes")
    require(gt.numDangling == 0,
      "edgeJaccard requires a symmetric double-edged feed " +
        s"(found ${gt.numDangling} sink nodes)")
    val spark = gt.edges.sparkSession
    val ceiling = spark.sessionState.conf.numShufflePartitions
    val e = gt.edges.where(col("src") =!= col("dst")).select("src", "dst")
    // small-graph path vs plain ambient shuffle_hash plan — the same
    // gate, probe, and scoping rationale as [[triangleCore]]
    val small = gt.numEdges / 2 <= wedgeBroadcastMaxRows(spark)
    val pE = if (small) iterPartitions(ceiling, gt.numEdges) else ceiling
    withShufflePartitions(spark, pE) {
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val orient2 = e
      .join(deg.select(col("node").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")), "dst")
      .where(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")))
      .select(col("src").as("u"), col("dst").as("v"), col("dd").as("dv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val csr = useCsr(spark, gt.numEdges / 2)
    val pW =
      if (!small || csr) ceiling
      else {
        val wedgeRows = orient2.groupBy("u").agg(count(lit(1)).as("d"))
          .agg(coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0L))
            .cast("long"))
          .head.getLong(0)
        iterPartitions(ceiling, math.max(gt.numEdges, wedgeRows))
      }
    // csr: grouped-adjacency close ([[triangleCoreCsr]] rationale) —
    // same (u, b=middle, c=top) triangle triples, so the per-edge
    // explode+agg below is shared verbatim between the two algorithms
    var adjToRelease: Option[DataFrame] = None
    val out = withShufflePartitions(spark, pW) {
      val closeSide = orient2.select(col("u").as("b"), col("v").as("c"))
      val tri = if (csr) {
        // sorted adjacency + linear-merge intersect for long-typed
        // nodes (the [[triangleCoreCsr]] device); set-identical
        val longNodes = gt.edges.schema.head.dataType ==
          org.apache.spark.sql.types.LongType
        val adj = graft.CachePool.swap("graph.ej.adj",
          orient2.groupBy(col("u"))
            .agg((if (longNodes) sort_array(collect_list(col("v")))
              else collect_list(col("v"))).as("nbrs"))
            .persist(StorageLevel.MEMORY_AND_DISK))
        adj.count()
        adjToRelease = Some(adj)
        orient2
          .join(broadcast(adj), Seq("u"))
          .join(broadcast(adj.select(col("u").as("v"),
            col("nbrs").as("nbrs_v"))), Seq("v"))
          .select(col("u"), col("v").as("b"),
            explode(if (longNodes)
              sortedIntersectCol(col("nbrs"), col("nbrs_v"))
            else array_intersect(col("nbrs"), col("nbrs_v"))).as("c"))
      } else orient2
        .select(col("u"), col("v").as("b"), col("dv").as("db"))
        .join(orient2.select(col("u"), col("v").as("c"), col("dv").as("dc"))
          .hint("shuffle_hash"), "u")
        .where(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
        .select(col("u"), col("b"), col("c"))
        .join(if (small) broadcast(closeSide)
          else closeSide.hint("shuffle_hash"), Seq("b", "c"))
      // each triangle (u,b,c) lies on its three undirected edges
      val perEdge = tri
        .select(explode(array(
          struct(least(col("u"), col("b")).as("a"),
            greatest(col("u"), col("b")).as("z")),
          struct(least(col("u"), col("c")).as("a"),
            greatest(col("u"), col("c")).as("z")),
          struct(least(col("b"), col("c")).as("a"),
            greatest(col("b"), col("c")).as("z")))).as("k"))
        .select(col("k.a").as("src"), col("k.z").as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("common"))
      def degSide(df: DataFrame): DataFrame =
        if (small) broadcast(df) else df
      val res = e.where(col("src") < col("dst"))
        .join(degSide(deg.select(col("node").as("src"),
          col("deg").as("deg_src"))), "src")
        .join(degSide(deg.select(col("node").as("dst"),
          col("deg").as("deg_dst"))), "dst")
        .join(perEdge.hint("shuffle_hash"), Seq("src", "dst"), "left")
        .select(col("src"), col("dst"), col("deg_src"), col("deg_dst"),
          coalesce(col("common"), lit(0L)).as("common"))
        .withColumn("jac",
          col("common").cast("double") /
            (col("deg_src") + col("deg_dst") - col("common")))
      // csr: LAZY result (the triangleCoreCsr discipline) — csr plans
      // at ambient partitions, so no conf scope needs to be alive when
      // the caller's top-k finally plans; the caches the plan
      // references are generation-tracked below. Wedge: keep the eager
      // checkpoint — its exchanges are pW-scoped and must plan inside
      // this scope, and the E-row caches are released right after.
      if (csr) res else res.localCheckpoint(eager = true)
    }
    if (csr) {
      graft.CachePool.swap("graph.ej.deg", deg)
      graft.CachePool.swap("graph.ej.orient", orient2)
    } else {
      adjToRelease.foreach(_.unpersist(blocking = false))
      orient2.unpersist(blocking = false)
      deg.unpersist(blocking = false)
    }
    out.orderBy(desc("jac"), col("src"), col("dst"))
    }
  }

  /** Adamic-Adar link prediction over a symmetric double-edged feed:
    * for every non-adjacent 2-hop pair (u,w), score = Σ over common
    * neighbors b of 1/ln(deg(b)) — the classic common-neighbor signal
    * that discounts hub-mediated co-occurrence. Exactness device: each
    * term is rounded to 12 dp and summed as DECIMAL(38,12), so the
    * score is partition-order-independent and bit-replayable by a SQL
    * oracle. Scale posture: wedge generation is Σ C(deg(b), 2) — the
    * inherent cost of the score — and `maxDegree` caps the per-center
    * fan-out (a center with deg > maxDegree contributes ≤ 1/ln(deg),
    * the weakest evidence, so dropping hubs is the standard
    * cost/quality knob, not an approximation of convenience). Three
    * shuffles total: degree agg, wedge self-join on the center, and
    * the pair agg + candidate anti-join on (u,w). */
  /** One-pass kernel behind the `graft_pair_longs` expression: all
    * unordered pairs (lo << 32 | hi) of the array's elements, equal
    * elements skipped — see
    * [[graft.functions.GraftPairLongs]]. */
  def pairLongsKernel(
      a: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = a.numElements()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    out.sizeHint(n * (n - 1) / 2)
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        val y = a.getLong(j)
        if (x != y) {
          val lo = math.min(x, y)
          val hi = math.max(x, y)
          out += (lo << 32) | hi
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  private[operators] def pairLongsCol(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.column(
      graft.functions.GraftPairLongs(
        org.apache.spark.sql.graftshim.expression(c)))

  /** Linear-merge intersection of two SORTED distinct long arrays —
    * see [[graft.functions.GraftSortedIntersect]]. */
  def sortedIntersectKernel(
      a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out += x; i += 1; j += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  private[operators] def sortedIntersectCol(
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.column(
      graft.functions.GraftSortedIntersect(
        org.apache.spark.sql.graftshim.expression(a),
        org.apache.spark.sql.graftshim.expression(b)))

  /** Broadcast envelope (ROW count) for the capped neighbor list in
    * [[adamicAdarImpl]]: the close side of the wedge join is the
    * DEGREE-CAPPED list (≤ maxDegree rows per center — hubs are
    * dropped), so it is usually far smaller than E and broadcasting
    * it lets the Σ C(deg,2)-row wedge stream fuse map-side into the
    * partial (u,w) aggregate with no pre-join exchange. 2M rows ≈ the
    * [[csrMaxOrientedRows]] hashed-relation envelope. Measured at
    * sf0.1 (nb = 390k rows, 17.2M wedges): scored-aggregate 5.0-7.4 s
    * shuffle_hash → 2.6-3.0 s broadcast. Above the envelope the
    * shuffle_hash plan runs — its exchanges scale with cluster width,
    * the 100 TB shape. Override with
    * `spark.graft.graph.aaBroadcastMaxNbRows`. */
  private[operators] def aaBroadcastMaxNbRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.graph.aaBroadcastMaxNbRows")
      .map(_.toLong).getOrElse(2000000L)

  private[operators] def adamicAdarImpl(
      gt: GraphTable, maxDegree: Int): DataFrame = {
    require(gt.numNodes > 0, "graph has no nodes")
    require(gt.numDangling == 0,
      "adamicAdar requires a symmetric double-edged feed " +
        s"(found ${gt.numDangling} sink nodes)")
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val spark = gt.edges.sparkSession
    val e = gt.edges.where(col("src") =!= col("dst")).select("src", "dst")
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE probe aggregate over the N-row degree table (bounded by N,
    // never the corpus): the capped-neighbor-list row count gates the
    // broadcast; min/max node gate the packed pair key below.
    // Integral node ids only — other types take the unpacked plan.
    val integralNode = e.schema.head.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // id range probed over ALL of `deg`, never the eligible-center
    // subset: the packed plan packs NEIGHBOR ids (wedge u/w) and every
    // anti-join edge endpoint, and the symmetric-feed precondition
    // makes `deg` cover every endpoint — a ≥2^31 id of degree 1 (or
    // > maxDegree) is invisible to an eligible-only probe yet still
    // appears as a neighbor, and its packed key would alias/overflow.
    val eligDeg =
      when(col("deg") >= 2 && col("deg") <= maxDegree, col("deg"))
    val probe = (if (integralNode)
        deg.agg(
          coalesce(sum(eligDeg), lit(0L)).cast("long").as("nbRows"),
          min(col("node").cast("long")).as("lo"),
          max(col("node").cast("long")).as("hi"))
      else deg.agg(
          coalesce(sum(eligDeg), lit(0L)).cast("long").as("nbRows"),
          lit(-1L).as("lo"), lit(-1L).as("hi"))).head
    val nbRows = probe.getLong(0)
    // packed single-long pair key (u << 32 | w): exact for ids in
    // [0, 2^31) — halves the aggregate's key bytes and hashing work
    // (measured: 2.95 → 2.40 s on the sf0.1 scored aggregate).
    // Bijective on the id range, so the per-pair sums/counts and the
    // anti-join are unchanged value-for-value.
    val packed = integralNode && !probe.isNullAt(1) &&
      probe.getLong(1) >= 0L && probe.getLong(2) < 2147483648L
    // wedge centers: only nodes with 2..maxDegree neighbors can vouch
    // for a pair; the per-center term is fixed, so round it ONCE here
    // — and carry it as exact LONG micro-units (12-dp term × 10¹²,
    // the DECIMAL multiply is exact and the value ≤ 1.45e12) so the
    // Σ-C(deg,2)-row aggregation sums machine longs, not
    // 38-digit decimals; per-pair sums stay ≤ maxDegree·1.45e12,
    // far inside the ANSI long envelope
    val nb = graft.CachePool.swap("graph.adamicadar.nb", e
      .join(deg.select(col("node").as("src"), col("deg")), "src")
      .where(col("deg") >= 2 && col("deg") <= maxDegree)
      .select(col("src").as("b"), col("dst").as("n"),
        (round(lit(1.0) / log(col("deg").cast("double")), 12)
          .cast(DecimalType(14, 12))
          * lit(java.math.BigDecimal.valueOf(1000000000000L)))
          .cast("long").as("units"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    nb.count() // materialize while deg is still cached
    deg.unpersist(blocking = false)
    // The returned plan is LAZY end-to-end (no checkpoint): the old
    // eager materialization wrote every candidate pair (15.7M rows at
    // sf0.1) to checkpoint blocks only for the caller's top-k to
    // re-scan them — dropping it lets a top-k caller fuse into
    // TakeOrdered over the anti-join output (measured: 6.5 → 3.3 s
    // for aggregate + anti + top-20). The nb cache the plan references
    // is generation-tracked in CachePool (the charNgramDetect
    // pattern): the next adamicAdar call or releaseAll frees it, and
    // an evicted cache recomputes from lineage — correctness
    // unaffected. The adjacency anti-join stays shuffle-based —
    // `scored` is already hash-partitioned on the pair key by its own
    // aggregate, so only the E-row edge side exchanges.
    val nbRight = nb.select(col("b"), col("n").as("w"))
    val wedges = nb.select(col("b"), col("n").as("u"), col("units"))
      .join(if (nbRows <= aaBroadcastMaxNbRows(spark)) broadcast(nbRight)
        else nbRight.hint("shuffle_hash"), "b")
      .where(col("u") < col("w"))
    val out = if (packed) {
      // A grouped-adjacency `graft_pair_longs` variant was measured
      // SLOWER here (5.8-6.5 s vs 2.3-2.8 s same-session): the
      // collect_list + Generate machinery over 17M-element pair
      // arrays loses to the fully codegen'd broadcast hash probe.
      // The win is the packed single-long aggregate key.
      val nodeType = e.schema.head.dataType
      val scored = wedges
        .select((col("u").cast("long") * lit(4294967296L) +
          col("w").cast("long")).as("uw"), col("units"))
        .groupBy("uw")
        .agg(sum(col("units")).as("aa_units"), count(lit(1)).as("common"))
      scored
        .join(e.select((col("src").cast("long") * lit(4294967296L) +
            col("dst").cast("long")).as("uw")).hint("shuffle_hash"),
          Seq("uw"), "left_anti")
        .select(
          shiftright(col("uw"), 32).cast(nodeType).as("src"),
          col("uw").bitwiseAND(lit(4294967295L)).cast(nodeType).as("dst"),
          col("common"),
          (col("aa_units").cast("double") / lit(1.0e12)).as("aa"))
    } else {
      // non-integral / out-of-range ids: the two-long-key form
      val scored = wedges
        .groupBy("u", "w")
        .agg(sum(col("units")).as("aa_units"), count(lit(1)).as("common"))
      scored
        .join(e.select(col("src").as("u"), col("dst").as("w"))
            .hint("shuffle_hash"),
          Seq("u", "w"), "left_anti")
        .select(col("u").as("src"), col("w").as("dst"), col("common"),
          (col("aa_units").cast("double") / lit(1.0e12)).as("aa"))
    }
    out.orderBy(desc("aa"), col("src"), col("dst"))
  }

  /** Newman modularity of a community assignment over a symmetric
    * double-edged feed: Q = Σ_c [e_c/m − (d_c/m)²] with m the DIRECTED
    * edge count (= 2× undirected), e_c the directed edges inside c,
    * d_c the degree sum of c — the "was this clustering better than
    * chance" score a pipeline checks before trusting
    * [[labelPropagationImpl]]'s output. `labels` is that operator's
    * (node, lbl) shape. Per-community terms are fixed double
    * expressions of exact longs, 12-dp-rounded and DECIMAL-summed (the
    * mutual-information device), so the scalar is partition-order
    * exact. Two label joins + three aggregates; one row out:
    * (modularity, n_communities, m_directed). */
  private[operators] def modularityImpl(
      gt: GraphTable, labels: DataFrame): DataFrame = {
    require(gt.numNodes > 0, "graph has no nodes")
    require(gt.numDangling == 0,
      "modularity requires a symmetric double-edged feed " +
        s"(found ${gt.numDangling} sink nodes)")
    require(Seq("node", "lbl").forall(labels.columns.contains),
      s"labels must carry (node, lbl), got ${labels.columns.toSeq}")
    val e = gt.edges.select("src", "dst")
    val l = labels.select("node", "lbl")
    val md = gt.numEdges.toDouble
    val ein = e
      .join(l.select(col("node").as("src"), col("lbl").as("la")), "src")
      .join(l.select(col("node").as("dst"), col("lbl").as("lb")), "dst")
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("ein"))
    val deg = e
      .join(l.select(col("node").as("src"), col("lbl")), "src")
      .groupBy("lbl").agg(count(lit(1)).as("dg"))
    deg.join(ein, Seq("lbl"), "left")
      .select(round(
        coalesce(col("ein"), lit(0L)).cast("double") / lit(md) -
          (col("dg").cast("double") / lit(md)) *
          (col("dg").cast("double") / lit(md)), 12)
        .cast(Dec12).as("t"))
      .agg(sum(col("t")).cast("double").as("modularity"),
        count(lit(1)).as("n_communities"))
      .withColumn("m_directed", lit(gt.numEdges))
  }

  /** Project a bipartite (left, right) incidence onto its left nodes:
    * an undirected weighted edge per left pair sharing ≥1 right node,
    * weight = the number of shared rights — the co-purchase /
    * co-occurrence graph builder that feeds [[buildGraphTable]].
    * `maxRightDegree` drops right-side hubs BEFORE the pair expansion:
    * a right node incident to d lefts expands to C(d,2) pairs, so one
    * 100-TB-scale hub (a bestseller part, a boilerplate token) would
    * otherwise dominate the whole job while carrying the least
    * information per pair — the standard cost/quality knob (same
    * argument as [[adamicAdarImpl]]'s cap), applied as an exact
    * degree filter so the result is deterministic and oracle-checkable.
    * Output is oriented (src < dst); union the swap for a symmetric
    * double-edged feed. */
  def bipartiteProject(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      maxRightDegree: Int): DataFrame = {
    require(maxRightDegree >= 2,
      s"maxRightDegree must be >= 2, got $maxRightDegree")
    // No small-graph path here (unlike [[triangleCore]]): `pairs` is an
    // arbitrary frame with no precomputed cardinality to gate on, and
    // a probe pass + broadcast variant measured SLOWER in-bench at
    // sf0.1 (q160 min-of-five floor 3.38→4.27 with them) — the
    // projection's cost is its (src,dst) aggregate exchange either way.
    val lp = pairs
      .select(col(leftCol).as("l"), col(rightCol).as("r")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keep = lp.groupBy("r").agg(count(lit(1)).as("dc"))
      .where(col("dc") <= maxRightDegree)
      .select("r")
    val pruned = graft.CachePool.swap("graph.bipartite.pruned",
      lp.join(keep, "r")
        .persist(StorageLevel.MEMORY_AND_DISK))
    pruned.count() // materialize while lp is still cached
    lp.unpersist(blocking = false)
    // LAZY result (the adamicAdarImpl discipline): the old eager
    // `localCheckpoint` materialized every projected edge only for a
    // top-k caller to re-scan them — dropping it lets the caller's
    // sort/limit fuse into TakeOrdered over the aggregate output. The
    // pruned cache the plan references is generation-tracked in
    // CachePool; an evicted cache recomputes from lineage.
    val lType = pruned.schema.apply("l").dataType
    val integralL = lType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // id-range probe over the CACHED pruned incidence (one cheap job)
    // gates the packed grouped-pair plan — the adamicAdarImpl device:
    // per-right-node groups are ≤ maxRightDegree (bounded at any
    // scale), `graft_pair_longs` emits exactly C(d, 2) packed pairs
    // map-side (the self-join form probed d² and filtered half), and
    // the pair aggregate hashes ONE long key.
    val packed = integralL && {
      val p = pruned.agg(min(col("l").cast("long")).as("lo"),
        max(col("l").cast("long")).as("hi")).head
      !p.isNullAt(0) && p.getLong(0) >= 0L &&
        p.getLong(1) < 2147483648L
    }
    if (packed)
      pruned.groupBy(col("r"))
        .agg(collect_list(col("l").cast("long")).as("ls"))
        .select(explode(pairLongsCol(col("ls"))).as("uw"))
        .groupBy("uw").agg(count(lit(1)).as("w"))
        .select(
          shiftright(col("uw"), 32).cast(lType).as("src"),
          col("uw").bitwiseAND(lit(4294967295L)).cast(lType).as("dst"),
          col("w"))
    else
      pruned.select(col("r"), col("l").as("src"))
        .join(pruned.select(col("r"), col("l").as("dst"))
          .hint("shuffle_hash"), "r")
        .where(col("src") < col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Unpersist the cached RDD behind an eager `localCheckpoint`ed
    * frame (Dataset.unpersist only reaches CacheManager entries, not
    * checkpoint blocks). Only safe once nothing will read the frame
    * again — a local checkpoint has no lineage to recompute from.
    * A non-LogicalRDD plan here means a refactor inserted an operator
    * between the checkpoint and this call — warn loudly so the
    * resulting per-round block leak is visible instead of silent. */
  /** Eager localCheckpoint that keeps the executed plan's hash
    * partitioning visible (graftshim device — see there): a plain
    * checkpoint reports UnknownPartitioning under AQE, so every
    * iterative operator that checkpoints a key-partitioned table per
    * round re-paid that table's exchange per round. Falls back to the
    * plain checkpoint when the executed plan has no hash partitioning
    * (e.g. after a union). */
  private[operators] def checkpointPartitioned(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.localCheckpointPartitioned(df)

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case other =>
        System.err.println(
          "[graft] releaseCheckpoint: expected a bare LogicalRDD but " +
            s"got ${other.getClass.getSimpleName} — checkpoint blocks " +
            "will accumulate until the ContextCleaner reclaims them")
    }
}
