package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over plain edge DataFrames (the
  * connected-components sibling lives in [[Components]]). */
object Graph {

  /** Damped PageRank over a directed edge list in which every node has
    * at least one out-edge — an undirected graph fed as both edge
    * directions satisfies this by construction; a dangling node would
    * silently leak rank mass, so feed sinks their back-edges.
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
    * independent of partitioning and merge order); the damped update
    * `(1-d)/N + d·s` is one fixed-association double expression
    * rounded to 9 dp. By induction every iteration's rank column is
    * bit-identical in any engine that evaluates the same tree.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85,
      assumeDistinct: Boolean = false): DataFrame = {
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
    val nodes = e.select(col("src").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    ed.count() // materialize from the e cache, then drop it
    e.unpersist()

    // the rank/sum tables are N rows vs the edge table's E — broadcast
    // them EXPLICITLY: a localCheckpoint'd frame has no size stats, so
    // without the hint Spark falls back to sort-merge and reshuffles
    // the persisted edge table every iteration (measured ~2× the whole
    // loop's cost at sf0.1)
    var ranks = nodes.select(col("node"), (lit(1.0) / lit(n)).as("rank"))
    (1 to iters).foreach { _ =>
      val contribs = ed.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst").as("cn"),
          round(col("rank") / col("outdeg").cast("double"), 12)
            .cast(DecimalType(38, 12)).as("c"))
      val sums = contribs.groupBy("cn").agg(sum(col("c")).as("s"))
      ranks = nodes.join(broadcast(sums), col("node") === col("cn"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / lit(n) +
            lit(damping) * coalesce(col("s"), lit(0)).cast("double"), 9)
            .as("rank"))
        .localCheckpoint(eager = true)
    }
    ed.unpersist()
    nodes.unpersist()
    ranks.orderBy(desc("rank"), col("node"))
  }
}
