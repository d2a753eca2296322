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
    * Scale posture: the edge list joins its out-degrees and is
    * persisted ONCE; each of the `iters` rounds broadcasts the N-row
    * rank table into the edge partitions (the edges never move) and
    * partial/final-aggregates the contributions — ONE job with one
    * E-row shuffle per round. The rank table itself lives on the
    * driver between rounds: broadcasting it already collects all N
    * ranks driver-side every round, so this adds no new constraint —
    * it just deletes the per-round rank-update join and eager
    * localCheckpoint jobs the DataFrame-resident loop paid (measured
    * ~2× the round cost at sf0.1). The N ≤ driver/executor-memory
    * envelope is the operator's documented cap; past it, swap the
    * broadcast for a bucketed co-partitioning of edges and ranks on
    * src and keep the rank table distributed (then the per-round
    * checkpoint device of [[Components]] applies again).
    *
    * Determinism: per-edge contributions are rounded to 12 dp and
    * summed as DECIMAL(38,12) (exact and associative, so the result is
    * independent of partitioning and merge order); the dangling mass
    * uses the same 12-dp DECIMAL device before one double division by
    * N; the damped update `(1-d)/N + d·(s + dm/N)` is the same
    * fixed-association double arithmetic whether evaluated per-row by
    * codegen or per-node on the driver (round = BigDecimal HALF_UP in
    * both, the GraphSpec-proven device). By induction every
    * iteration's rank column is bit-identical in any engine that
    * evaluates the same tree. With `danglingCorrection = false` the
    * `+ dm/N` term is absent entirely, preserving the pre-flag
    * semantics.
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
    val ed = e.join(broadcast(od), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcNodes = e.select(col("src").as("node")).distinct()
    val nodesDf =
      (if (danglingCorrection)
         srcNodes.union(e.select(col("dst").as("node"))).distinct()
       else srcNodes)
        .persist(StorageLevel.MEMORY_AND_DISK)
    // the node list and per-round ranks are driver-resident (see the
    // scale-posture note above — the broadcast already pays this)
    val nodeArr: Array[Any] = nodesDf.collect().map(_.get(0))
    val n = nodeArr.length.toDouble
    val danglingSet: Set[Any] =
      if (danglingCorrection)
        nodesDf.join(srcNodes, Seq("node"), "left_anti")
          .collect().map(_.get(0)).toSet
      else {
        // cheap path's precondition, checked LOUDLY: a sink here would
        // silently leak rank mass every round. `assumeNoSinks` skips
        // the one-off distinct(dst) anti-join for callers whose
        // construction proves it (an undirected double-edged feed has
        // src set = dst set) — the assumeDistinct contract for sinks.
        if (!assumeNoSinks) {
          val leaked = e.select(col("dst").as("node")).distinct()
            .join(srcNodes, Seq("node"), "left_anti").count()
          require(leaked == 0L,
            s"$leaked node(s) have in-edges but no out-edges; their " +
              "rank mass would silently leak. Pass danglingCorrection" +
              " = true (uniform redistribution) or feed sinks their " +
              "back-edges.")
        }
        Set.empty
      }
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
    (1 to iters).foreach { _ =>
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
      rank = nodeArr.map { v =>
        val s = sums.get(v).fold(0.0)(_.doubleValue())
        val inner = if (danglingCorrection) s + dmn else s
        v -> round9((1.0 - damping) / n + damping * inner)
      }.toMap
    }
    ed.unpersist()
    ranksDf(rank).orderBy(desc("rank"), col("node"))
  }
}
