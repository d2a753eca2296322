package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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
    * precondition up front and fails loudly instead of silently
    * producing wrong ranks on the first directed feed.
    *
    * Scale posture: the edge list joins its out-degrees and is
    * persisted ONCE; each of the `iters` rounds broadcasts the N-row
    * rank table into the edge partitions (the edges never move),
    * partial/final-aggregates the contributions — the one shuffle per
    * round, E rows — and left-joins the node list (nodes with no
    * in-edge keep the teleport term). Each round's result is eagerly
    * `localCheckpoint`ed — the [[Components]] device — so plan
    * analysis stays O(1) instead of O(4^iters). At rank tables too
    * large to broadcast, swap the hint for a bucketed co-partitioning
    * of edges and ranks on src.
    *
    * Determinism: per-edge contributions are rounded to 12 dp and
    * summed as DECIMAL(38,12) (exact and associative, so the result is
    * independent of partitioning and merge order); the dangling mass
    * uses the same 12-dp DECIMAL device before one double division by
    * N; the damped update `(1-d)/N + d·(s + dm/N)` is one
    * fixed-association double expression rounded to 9 dp. By induction
    * every iteration's rank column is bit-identical in any engine that
    * evaluates the same tree. With `danglingCorrection = false` the
    * `+ dm/N` term is absent entirely, so existing no-sink callers get
    * the exact pre-flag expression tree.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85,
      assumeDistinct: Boolean = false,
      danglingCorrection: Boolean = false,
      assumeNoSinks: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
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
    val ed = e.join(broadcast(od), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcNodes = e.select(col("src").as("node")).distinct()
    val nodes =
      (if (danglingCorrection)
         srcNodes.union(e.select(col("dst").as("node"))).distinct()
       else srcNodes)
        .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    // dangling = nodes with no out-edge (node-sized; empty when the
    // graph has no sinks, e.g. the undirected double-edged feed)
    val dangling =
      if (danglingCorrection)
        Some(nodes.join(srcNodes, Seq("node"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK))
      else None
    val nDangling = dangling.map(_.count()).getOrElse {
      // cheap path's precondition, checked LOUDLY: a sink here would
      // silently leak rank mass every round. `assumeNoSinks` skips the
      // one-off distinct(dst) anti-join for callers whose construction
      // proves it (an undirected double-edged feed has src set = dst
      // set) — the assumeDistinct contract, applied to sinks.
      if (!assumeNoSinks) {
        val leaked = e.select(col("dst").as("node")).distinct()
          .join(srcNodes, Seq("node"), "left_anti").count()
        require(leaked == 0L,
          s"$leaked node(s) have in-edges but no out-edges; their rank " +
            "mass would silently leak. Pass danglingCorrection = true " +
            "(uniform redistribution) or feed sinks their back-edges.")
      }
      0L
    }
    ed.count() // materialize from the e cache, then drop it
    e.unpersist()

    // the rank/sum tables are N rows vs the edge table's E — broadcast
    // them EXPLICITLY: a localCheckpoint'd frame has no size stats, so
    // without the hint Spark falls back to sort-merge and reshuffles
    // the persisted edge table every iteration (measured ~2× the whole
    // loop's cost at sf0.1)
    var ranks = nodes.select(col("node"), (lit(1.0) / lit(n)).as("rank"))
    (1 to iters).foreach { _ =>
      // dangling mass, redistributed uniformly: the 12-dp DECIMAL sum
      // of sink ranks (exact, order-independent) over one double
      // division by N — a driver-side scalar per round (1 value)
      val dmn: Double =
        if (nDangling == 0L) 0.0
        else {
          val dec = ranks.join(broadcast(dangling.get), Seq("node"))
            .agg(sum(round(col("rank"), 12).cast(DecimalType(38, 12)))
              .as("dm"))
            .head.getDecimal(0)
          if (dec == null) 0.0 else dec.doubleValue() / n
        }
      val contribs = ed.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst").as("cn"),
          round(col("rank") / col("outdeg").cast("double"), 12)
            .cast(DecimalType(38, 12)).as("c"))
      val sums = contribs.groupBy("cn").agg(sum(col("c")).as("s"))
      val sTerm = coalesce(col("s"), lit(0)).cast("double")
      val inner = if (danglingCorrection) sTerm + lit(dmn) else sTerm
      ranks = nodes.join(broadcast(sums), col("node") === col("cn"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / lit(n) + lit(damping) * inner, 9)
            .as("rank"))
        .localCheckpoint(eager = true)
    }
    ed.unpersist()
    nodes.unpersist()
    dangling.foreach(_.unpersist())
    ranks.orderBy(desc("rank"), col("node"))
  }
}
