package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over plain edge DataFrames (the
  * connected-components sibling lives in [[Components]]). */
object Graph {

  /** Damped PageRank over a directed edge list.
    *
    * Dangling nodes (nodes with in-edges but no out-edges) leak rank
    * mass if ignored, so the operator never ignores them: with
    * `danglingCorrection = true` their mass is redistributed uniformly
    * each round (the standard correction — rank sums stay ~1 and sinks
    * participate as first-class nodes); with it false (the cheap path
    * for graphs that cannot have sinks, e.g. an undirected graph fed
    * as both edge directions), the operator REQUIRES the no-sink
    * precondition up front (`assumeNoSinks` skips the check for
    * callers whose construction proves it) and fails loudly instead of
    * silently producing wrong ranks on the first directed feed.
    *
    * Scale posture — TWO loop bodies behind one set of semantics:
    *
    *  - `distributedRanks = false` (default, the small-N fast path):
    *    each round broadcasts the N-row rank table into the edge
    *    partitions (the edges never move) and partial/final-aggregates
    *    the contributions — ONE job with one E-row shuffle per round.
    *    The rank table lives on the driver between rounds:
    *    broadcasting it already collects all N ranks driver-side every
    *    round, so driver residency adds no new constraint — it just
    *    deletes the per-round rank-update join and eager
    *    localCheckpoint jobs the DataFrame-resident loop pays
    *    (measured ~2× the round cost at sf0.1). Cap: N must fit the
    *    driver/executor broadcast envelope.
    *
    *  - `distributedRanks = true` (the 100-TB path): the rank table
    *    NEVER visits the driver. Edges (+ out-degrees) are
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
      distributedRanks: Boolean = false,
      epsilon: Option[Double] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    epsilon.foreach(e => require(e >= 0.0, s"epsilon must be >= 0, got $e"))
    val spark = edges.sparkSession
    // persist the edge list FIRST: out-degrees, the degree join and the
    // node list all consume it, and without the cache the caller's
    // (possibly expensive) edge pipeline re-runs three times.
    // `assumeDistinct` skips the dedup shuffle when the caller already
    // guarantees distinct pairs.
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // out-degrees are one row per node — broadcast them back onto the
    // edge list so the E-row side never shuffles for the degree join
    val od = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edRaw = e.join(broadcast(od), "src")
    val srcNodes = e.select(col("src").as("node")).distinct()
    val nodesRaw =
      if (danglingCorrection)
        srcNodes.union(e.select(col("dst").as("node"))).distinct()
      else srcNodes
    if (!danglingCorrection && !assumeNoSinks) {
      // cheap path's precondition, checked LOUDLY: a sink here would
      // silently leak rank mass every round. `assumeNoSinks` skips
      // the one-off distinct(dst) anti-join for callers whose
      // construction proves it (an undirected double-edged feed has
      // src set = dst set) — the assumeDistinct contract for sinks.
      val leaked = e.select(col("dst").as("node")).distinct()
        .join(srcNodes, Seq("node"), "left_anti").count()
      require(leaked == 0L,
        s"$leaked node(s) have in-edges but no out-edges; their " +
          "rank mass would silently leak. Pass danglingCorrection" +
          " = true (uniform redistribution) or feed sinks their " +
          "back-edges.")
    }
    if (distributedRanks)
      pageRankDistributed(edRaw, srcNodes, nodesRaw, e, iters, damping,
        danglingCorrection, epsilon)
    else
      pageRankDriver(edRaw, srcNodes, nodesRaw, e, iters, damping,
        danglingCorrection, epsilon)
  }

  /** Driver-resident loop (see scale posture above): ranks live in a
    * Map between rounds; one broadcast-join job per round. */
  private def pageRankDriver(
      edRaw: DataFrame,
      srcNodes: DataFrame,
      nodesRaw: DataFrame,
      e: DataFrame,
      iters: Int,
      damping: Double,
      danglingCorrection: Boolean,
      epsilon: Option[Double]): DataFrame = {
    val spark = edRaw.sparkSession
    val ed = edRaw.persist(StorageLevel.MEMORY_AND_DISK)
    val nodesDf = nodesRaw.persist(StorageLevel.MEMORY_AND_DISK)
    // the node list and per-round ranks are driver-resident (see the
    // scale-posture note above — the broadcast already pays this)
    val nodeArr: Array[Any] = nodesDf.collect().map(_.get(0))
    val n = nodeArr.length.toDouble
    val danglingSet: Set[Any] =
      if (danglingCorrection)
        nodesDf.join(srcNodes, Seq("node"), "left_anti")
          .collect().map(_.get(0)).toSet
      else Set.empty
    ed.count() // materialize from the e cache, then drop it
    e.unpersist()
    nodesDf.unpersist()

    val rankSchema = StructType(Seq(
      StructField("node", nodesDf.schema.fields(0).dataType, nullable = false),
      StructField("rank", DoubleType, nullable = false)))
    def ranksDf(rank: Map[Any, Double]): DataFrame =
      spark.createDataFrame(
        nodeArr.map(v => Row(v, rank(v))).toSeq.asJava, rankSchema)
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

    var rank: Map[Any, Double] = nodeArr.map(_ -> 1.0 / n).toMap
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // dangling mass, redistributed uniformly: the 12-dp DECIMAL sum
      // of sink ranks (exact, order-independent) over one double
      // division by N — free on the driver-resident rank table
      val dmn: Double =
        if (danglingSet.isEmpty) 0.0
        else danglingSet.iterator
          .map(v => BigDecimal(rank(v))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / n
      // the ONE distributed job per round: E-row broadcast join +
      // partial/final DECIMAL aggregate, collected as ≤N (cn, s) rows
      val sums: Map[Any, java.math.BigDecimal] =
        ed.join(broadcast(ranksDf(rank)), col("src") === col("node"))
          .select(col("dst").as("cn"),
            round(col("rank") / col("outdeg").cast("double"), 12)
              .cast(DecimalType(38, 12)).as("c"))
          .groupBy("cn").agg(sum(col("c")).as("s"))
          .collect().map(r => r.get(0) -> r.getDecimal(1)).toMap
      val next = nodeArr.map { v =>
        val s = sums.get(v).fold(0.0)(_.doubleValue())
        val inner = if (danglingCorrection) s + dmn else s
        v -> round9((1.0 - damping) / n + damping * inner)
      }.toMap
      converged = epsilon.exists(eps =>
        nodeArr.iterator.map(v => math.abs(next(v) - rank(v))).max <= eps)
      rank = next
      it += 1
    }
    ed.unpersist()
    ranksDf(rank).orderBy(desc("rank"), col("node"))
  }

  /** Distributed loop (see scale posture above): the rank table stays
    * a hash-partitioned, per-round-checkpointed DataFrame; the driver
    * never holds a rank. */
  private def pageRankDistributed(
      edRaw: DataFrame,
      srcNodes: DataFrame,
      nodesRaw: DataFrame,
      e: DataFrame,
      iters: Int,
      damping: Double,
      danglingCorrection: Boolean,
      epsilon: Option[Double]): DataFrame = {
    // edges co-partitioned on src ONCE; every round's rank join reuses
    // the cached partitioning, so only the N-row rank side ever moves
    val ed = edRaw.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // node list co-partitioned on node: the per-round left join that
    // re-attaches zero-contribution nodes needs no exchange on it
    val nodesDf = nodesRaw.repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodesDf.count().toDouble
    val danglingDf =
      if (danglingCorrection) {
        val d = nodesDf.join(srcNodes, Seq("node"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count()
        d
      } else null
    ed.count() // materialize from the e cache, then drop it
    e.unpersist()

    val baseTerm = (1.0 - damping) / n
    var ranks = nodesDf.withColumn("rank", lit(1.0 / n))
      .localCheckpoint(eager = true)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // contributions: shuffled-hash join (rank side builds; edge side
      // streams from cache, already partitioned on src) + 12-dp DECIMAL
      // partial/final aggregate — the round's one E-row shuffle
      val contrib = ed
        .join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst").as("node"),
          round(col("rank") / col("outdeg").cast("double"), 12)
            .cast(DecimalType(38, 12)).as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val joined = nodesDf
        .join(contrib.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("s").cast("double"), lit(0.0)).as("sd"))
      // dangling mass: a ONE-ROW aggregate cross-joined into the
      // update — the scalar stays inside the plan, no driver collect
      val withDm =
        if (danglingCorrection) {
          val dm = ranks.join(danglingDf, Seq("node"), "left_semi")
            .agg(coalesce(
              sum(round(col("rank"), 12).cast(DecimalType(38, 12))),
              lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 12)))
              .as("dms"))
            .select((col("dms").cast("double") / lit(n)).as("dmn"))
          joined.crossJoin(broadcast(dm))
        } else joined.withColumn("dmn", lit(0.0))
      // sd + 0.0 == sd for the non-dangling path (contributions are
      // ≥ 0, so no -0.0 edge), keeping the two bodies bit-identical
      val next = withDm
        .select(col("node"),
          round(lit(baseTerm) + lit(damping) * (col("sd") + col("dmn")), 9)
            .as("rank"))
        .localCheckpoint(eager = true)
      converged = epsilon.exists { eps =>
        // bounded scalar action (one row), the K-Means-convergence
        // category — only paid when an epsilon is requested
        val prev = ranks.select(col("node"), col("rank").as("prev_rank"))
        next.join(prev, Seq("node"))
          .agg(max(abs(col("rank") - col("prev_rank"))).as("d"))
          .head().getDouble(0) <= eps
      }
      // the previous round's checkpoint blocks are dead once the next
      // round is materialized (and the epsilon diff has run)
      releaseCheckpoint(ranks)
      ranks = next
      it += 1
    }
    ed.unpersist()
    nodesDf.unpersist()
    if (danglingDf != null) danglingDf.unpersist()
    // the returned frame reads the final round's checkpoint blocks —
    // pinned while reachable, reclaimed by the ContextCleaner after
    ranks.select(col("node"), col("rank"))
      .orderBy(desc("rank"), col("node"))
  }

  /** Personalized (topic-sensitive) PageRank: the reset mass lands on
    * the `seeds` distribution instead of uniformly — rank measures
    * proximity to the seed set (the standard seed-biased relevance
    * device: related-document discovery from a trusted subset,
    * authority propagation from labeled-good domains in a curation
    * pipeline). Semantics per Haveliwala 2002 / the standard PPR
    * formulation:
    *
    *   rank'(v) = (1−d)·r(v) + d·(Σ_{u→v} rank(u)/outdeg(u) + dm·r(v))
    *
    * with r(v) = 1/|S| for v ∈ S else 0, and dm = the total dangling
    * (sink) mass — redistributed over the SEED distribution, so rank
    * mass is conserved and teleports never leak to unrelated nodes.
    * Initial ranks are r itself.
    *
    * Scale posture: built directly on the DISTRIBUTED rank-table body
    * — ranks live as a hash-partitioned, per-round-checkpointed
    * DataFrame carrying the per-node reset weight alongside (computed
    * once from a seed semi-join; seeds are a DataFrame, not a driver
    * collection, so the seed set itself can be large); per round one
    * shuffled-hash join against the cached co-partitioned edges, a
    * DECIMAL partial/final agg, and a one-row dangling aggregate
    * cross-joined into the update. No driver collect anywhere
    * (GraphSpec's listener assertion covers this path too).
    *
    * Determinism: the same 12-dp DECIMAL contribution sums and 9-dp
    * HALF_UP damped update as [[pageRank]], with the fixed association
    * `(1−d)·r + d·(s + dm·r)` — bit-replayable in any IEEE engine
    * (the q113 oracle).
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      assumeDistinct: Boolean = false,
      epsilon: Option[Double] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    epsilon.foreach(e => require(e >= 0.0, s"epsilon must be >= 0, got $e"))
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcNodes = e.select(col("src").as("node")).distinct()
    val seedsDf = seeds.select(col(seeds.columns.head).as("node")).distinct()
    // node list with the per-node reset weight attached ONCE: 1/|S| on
    // seed nodes (seeds outside the graph are ignored), 0 elsewhere
    val nodesRaw = srcNodes.union(e.select(col("dst").as("node"))).distinct()
    // seed precondition checked BEFORE any further cache is registered
    // — a repeated misconfigured call must not accumulate persists
    val k =
      try {
        val k0 = nodesRaw.join(seedsDf, Seq("node"), "left_semi").count()
        require(k0 > 0, "no seed node appears in the graph")
        k0
      } catch { case t: Throwable => e.unpersist(blocking = false); throw t }
    val od = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ed = e.join(broadcast(od), "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rv0 = 1.0 / k
    val nodesDf = nodesRaw
      .join(seedsDf.withColumn("_g_seed", lit(true)), Seq("node"), "left")
      .select(col("node"),
        when(col("_g_seed").isNotNull, lit(rv0)).otherwise(lit(0.0)).as("rv"))
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodesDf.count()
    val danglingDf = nodesDf.select("node")
      .join(srcNodes, Seq("node"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    danglingDf.count()
    ed.count()
    e.unpersist()

    var ranks = nodesDf.select(col("node"), col("rv").as("rank"))
      .localCheckpoint(eager = true)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val contrib = ed
        .join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst").as("node"),
          round(col("rank") / col("outdeg").cast("double"), 12)
            .cast(DecimalType(38, 12)).as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val joined = nodesDf
        .join(contrib.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"), col("rv"),
          coalesce(col("s").cast("double"), lit(0.0)).as("sd"))
      // total sink mass (NOT divided by N — it rides the reset
      // distribution), as a one-row aggregate cross-joined in
      val dm = ranks.join(danglingDf, Seq("node"), "left_semi")
        .agg(coalesce(
          sum(round(col("rank"), 12).cast(DecimalType(38, 12))),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 12)))
          .as("dms"))
        .select(col("dms").cast("double").as("dmt"))
      val next = joined.crossJoin(broadcast(dm))
        .select(col("node"),
          round(lit(1.0 - damping) * col("rv") +
            lit(damping) * (col("sd") + col("dmt") * col("rv")), 9)
            .as("rank"))
        .localCheckpoint(eager = true)
      converged = epsilon.exists { eps =>
        val prev = ranks.select(col("node"), col("rank").as("prev_rank"))
        next.join(prev, Seq("node"))
          .agg(max(abs(col("rank") - col("prev_rank"))).as("d"))
          .head().getDouble(0) <= eps
      }
      releaseCheckpoint(ranks)
      ranks = next
      it += 1
    }
    ed.unpersist()
    nodesDf.unpersist()
    danglingDf.unpersist()
    ranks.select(col("node"), col("rank"))
      .orderBy(desc("rank"), col("node"))
  }

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
    * Scale posture: the distributed rank-table body again — the edge
    * list is cached TWICE, co-partitioned on src (hub gather) and on
    * dst (auth gather), so per round only the two N-row score tables
    * move; contributions are 12-dp DECIMAL sums (exact, associative),
    * the L1 totals are one-row aggregates cross-joined in (a plan,
    * not a collect), scores are 9-dp rounded and the frame is
    * per-round `localCheckpoint`ed. No driver collect anywhere.
    *
    * Returns (node, auth, hub), authorities first. */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edSrc = e.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edDst = e.repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodesDf = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodesDf.count().toDouble
    edSrc.count(); edDst.count()
    e.unpersist()

    val dec0 = lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 12))
    var scores = nodesDf
      .select(col("node"), lit(1.0 / n).as("auth"), lit(1.0 / n).as("hub"))
      .localCheckpoint(eager = true)
    (1 to iters).foreach { _ =>
      // auth gather: hubs flow src -> dst (12-dp DECIMAL partial/final)
      val authRaw = edSrc
        .join(scores.select(col("node"), col("hub")).hint("shuffle_hash"),
          col("src") === col("node"))
        .select(col("dst").as("node"),
          round(col("hub"), 12).cast(DecimalType(38, 12)).as("c"))
        .groupBy("node").agg(sum(col("c")).as("sa"))
      // hub gather: auths flow dst -> src
      val hubRaw = edDst
        .join(scores.select(col("node"), col("auth")).hint("shuffle_hash"),
          col("dst") === col("node"))
        .select(col("src").as("node"),
          round(col("auth"), 12).cast(DecimalType(38, 12)).as("c"))
        .groupBy("node").agg(sum(col("c")).as("sh"))
      // L1 totals as one-row aggregates, cross-joined (no collect)
      val tots = authRaw.agg(coalesce(sum(col("sa")), dec0).as("ta"))
        .crossJoin(hubRaw.agg(coalesce(sum(col("sh")), dec0).as("th")))
      val next = nodesDf
        .join(authRaw.hint("shuffle_hash"), Seq("node"), "left")
        .join(hubRaw.hint("shuffle_hash"), Seq("node"), "left")
        .crossJoin(broadcast(tots))
        .select(col("node"),
          round(coalesce(col("sa").cast("double"), lit(0.0)) /
            col("ta").cast("double"), 9).as("auth"),
          round(coalesce(col("sh").cast("double"), lit(0.0)) /
            col("th").cast("double"), 9).as("hub"))
        .localCheckpoint(eager = true)
      releaseCheckpoint(scores)
      scores = next
    }
    edSrc.unpersist(); edDst.unpersist(); nodesDf.unpersist()
    scores.orderBy(desc("auth"), col("node"))
  }

  /** Unpersist the cached RDD behind an eager `localCheckpoint`ed
    * frame (Dataset.unpersist only reaches CacheManager entries, not
    * checkpoint blocks). Only safe once nothing will read the frame
    * again — a local checkpoint has no lineage to recompute from. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
