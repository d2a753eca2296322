package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an edge list — the canonical post-pass of
  * every near-duplicate pipeline: the pair emitters ([[Dedup]]'s
  * n-gram / MinHash / SimHash / embedding paths) produce EDGES, but a
  * curation run needs CLUSTERS (duplicate groups can chain: A≈B, B≈C
  * with A≉C must still collapse to one keeper). The component label is
  * the minimum member id, so the keeper rule "lowest id survives"
  * falls out of the labeling itself.
  *
  * The reference has no graph surface (its dedup analog is the exact
  * per-cluster regrouping, `Main.java:345-355`); this operator is part
  * of the beyond-reference training-data-pipeline tier.
  *
  * Algorithm: iterative min-label propagation with pointer jumping
  * (path halving), the DataFrame rendering of the classic
  * MapReduce/Pregel CC loop:
  *   1. every node offers its current label to each neighbor; a node
  *      keeps the min of its own label and all offers (one shuffle:
  *      groupBy id + min);
  *   2. labels then chase their parents — lbl ← label(lbl), one
  *      self-join — which halves label-chain lengths and turns the
  *      O(diameter) propagation into O(log diameter) rounds (same
  *      contraction Kiveris et al.'s large-star performs);
  *   3. stop when a round changes no label.
  *
  * 100 TB posture: each round is a constant number of shuffles over
  * the (id, lbl) table — 16 bytes per node — plus one pass of the edge
  * list; no step is ever quadratic in a component's size. Each round's
  * labels are `localCheckpoint`ed (eager): a round references the
  * previous labels THREE times (offer union, pointer-jump self-join,
  * convergence diff), so without truncation the logical plan grows
  * ~4^rounds and Catalyst analysis — not the data — becomes the
  * bottleneck by round 8 (measured: the suite hangs). Checkpointing
  * pins each round to its materialized blocks and keeps the analyzed
  * plan O(1) per round — the same replan trap the K-Means loop
  * eliminated (KMeans.scala), with the standard caveat that local
  * checkpoints forgo lineage-replay fault tolerance (a production
  * cluster run points `sparkContext.setCheckpointDir` at reliable
  * storage and swaps in `checkpoint`). Near-dup graphs are
  * near-forests of tiny cliques, so rounds-to-fixpoint is small
  * (single digits) regardless of corpus size.
  */
object Components {

  /** Label every node of the undirected graph `edges` (columns
    * `srcCol`, `dstCol`, any integral type; self-loops and duplicate /
    * reversed edges are fine) with its component's minimum node id.
    *
    * Returns (`id`: long, `component`: long), one row per distinct
    * node that appears in any edge. Isolated nodes never appear in an
    * edge list; callers wanting them keep `component = id` via a left
    * join on the node table.
    *
    * @param maxRounds hard stop (with a loud error) — a fixpoint this
    *   slow means the input is not a near-dup graph; O(log diameter)
    *   rounds are expected, so the default 25 covers diameters beyond
    *   any physical corpus.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxRounds: Int = 25): DataFrame = {
    require(maxRounds > 0, s"maxRounds must be positive, got $maxRounds")
    val src = col(srcCol).cast("long").as("_g_src")
    val dst = col(dstCol).cast("long").as("_g_dst")
    // Undirected: both orientations. Duplicate edges survive the union
    // unde-duplicated on purpose — min() is idempotent, and a distinct
    // here would cost a full extra shuffle of the edge list.
    val und = edges.select(src, dst)
      .unionAll(edges.select(dst.as("_g_src"), src.as("_g_dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // materialize the cache and size the gate in one job
      val spark = edges.sparkSession
      val nRows = und.count()
      // driver-resident twin (the Graph loop-twin device): under the
      // edge gate the SAME min-label + pointer-jump rounds run over
      // dense int arrays on the driver — one collect of the cached
      // primitive pairs, zero per-round shuffles, IDENTICAL round
      // function and maxRounds throw. Above the gate the distributed
      // loop below runs unchanged (the 100 TB path).
      val maxDriver = spark.conf
        .getOption("spark.graft.components.maxDriverEdges")
        .map(_.toLong).getOrElse(8000000L)
      if (nRows <= maxDriver)
        return driverComponents(und, maxRounds)

      // eager localCheckpoint: materializes AND truncates lineage (see
      // the scale note above — persist alone leaves the logical plan
      // growing ~4× per round). The partitioning-preserving graftshim
      // variant keeps hashpartitioning(id) from the distinct visible,
      // so the per-round label-offer join and union-agg never
      // re-exchange the label table.
      var labels = Graph.checkpointPartitioned(
        und.select(col("_g_src").as("id"))
          .distinct()
          .withColumn("lbl", col("id")))

      var round = 0
      var converged = false
      Graph.withShufflePartitions(spark,
          Graph.iterPartitions(spark, nRows)) {
      while (!converged && round < maxRounds) {
        // (1) offer labels across edges, keep the per-node min
        val offers = und
          .join(labels.hint("shuffle_hash"), und("_g_src") === labels("id"))
          .select(col("_g_dst").as("id"), col("lbl"))
        val merged = labels.select("id", "lbl").unionAll(offers)
          .groupBy("id").agg(min("lbl").as("lbl"))
        // (2) pointer jump: lbl ← label(lbl). Every label is a node id
        // (min over ids), so the inner self-join matches every row.
        val parents = merged.select(col("id").as("p_id"), col("lbl").as("p_lbl"))
        val jumped = Graph.checkpointPartitioned(merged
          .join(parents, merged("lbl") === parents("p_id"))
          .select(col("id"), col("p_lbl").as("lbl")))
        // (3) converged iff no label moved. Labels only ever decrease,
        // so "changed" is exactly "new < old".
        val changed = jumped.as("n")
          .join(labels.as("o"), col("n.id") === col("o.id"))
          .where(col("n.lbl") < col("o.lbl"))
          .limit(1).count()
        // the previous round's checkpoint blocks are dead once the
        // convergence diff has run — drop them now, or peak storage is
        // rounds × label-table size instead of 2× (jumped is already
        // materialized, so it never recomputes through this parent)
        releaseCheckpoint(labels)
        labels = jumped
        converged = changed == 0L
        round += 1
      }
      }
      if (!converged) {
        releaseCheckpoint(labels) // don't pin the last round's blocks on the throw
        throw new IllegalArgumentException(
          s"connectedComponents did not converge in $maxRounds rounds — " +
            "the input is pathologically deep for a near-dup graph")
      }
      // The returned frame reads the final round's checkpoint blocks —
      // they stay pinned while the frame is reachable and are reclaimed
      // by the ContextCleaner once the caller drops it (same lifecycle
      // as any cached result handed to a caller).
      labels.select(col("id"), col("lbl").as("component"))
    } finally und.unpersist(blocking = false)
  }

  /** Driver-resident twin of the min-label + pointer-jump loop: the
    * cached (src, dst) pairs are collected ONCE as primitive long
    * arrays, node ids sorted so dense-index comparisons ARE value
    * comparisons, and the IDENTICAL round function (offer-min, jump
    * lbl ← lbl(lbl), stop when no label strictly decreases — including
    * the loud maxRounds throw) runs over int arrays. All operations
    * are exact mins over ids, so the labels equal the distributed
    * loop's bit-for-bit (ComponentsSpec pins gate parity). */
  private def driverComponents(
      und: DataFrame, maxRounds: Int): DataFrame = {
    val spark = und.sparkSession
    val parts = und.rdd.mapPartitions { rows =>
      val a = new scala.collection.mutable.ArrayBuilder.ofLong
      val b = new scala.collection.mutable.ArrayBuilder.ofLong
      rows.foreach { r => a += r.getLong(0); b += r.getLong(1) }
      Iterator.single((a.result(), b.result()))
    }.collect()
    // distinct sorted node ids (und carries both directions, so the
    // src side alone covers src ∪ dst — the labels-init convention)
    val ids: Array[Long] = {
      val all = new scala.collection.mutable.ArrayBuilder.ofLong
      parts.foreach { case (a, _) => all ++= a }
      val sorted = all.result()
      java.util.Arrays.sort(sorted)
      var n = 0
      var i = 0
      while (i < sorted.length) {
        if (n == 0 || sorted(n - 1) != sorted(i)) {
          sorted(n) = sorted(i); n += 1
        }
        i += 1
      }
      java.util.Arrays.copyOf(sorted, n)
    }
    val n = ids.length
    val es = new scala.collection.mutable.ArrayBuilder.ofInt
    val ed = new scala.collection.mutable.ArrayBuilder.ofInt
    parts.foreach { case (a, b) =>
      var i = 0
      while (i < a.length) {
        es += java.util.Arrays.binarySearch(ids, a(i))
        ed += java.util.Arrays.binarySearch(ids, b(i))
        i += 1
      }
    }
    val s = es.result()
    val d = ed.result()
    var lbl = Array.tabulate(n)(identity)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // (1) offer labels across edges, keep the per-node min
      val merged = lbl.clone()
      var k = 0
      while (k < s.length) {
        val l = lbl(s(k))
        if (l < merged(d(k))) merged(d(k)) = l
        k += 1
      }
      // (2) pointer jump: lbl ← label(label-node)
      val jumped = new Array[Int](n)
      var i = 0
      var changed = false
      while (i < n) {
        jumped(i) = merged(merged(i))
        if (jumped(i) < lbl(i)) changed = true
        i += 1
      }
      lbl = jumped
      converged = !changed
      round += 1
    }
    if (!converged)
      throw new IllegalArgumentException(
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "the input is pathologically deep for a near-dup graph")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("component",
        org.apache.spark.sql.types.LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      ids.indices.map(i =>
        org.apache.spark.sql.Row(ids(i), ids(lbl(i)))).asJava,
      schema)
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

  /** Duplicate clusters straight from a pair list (`idA`, `idB` — the
    * shape every [[Dedup]] pair emitter returns): each doc that occurs
    * in any pair, labeled with its cluster's keeper (minimum doc id).
    */
  def dedupClusters(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b"): DataFrame =
    connectedComponents(pairs, idA, idB)
      .select(col("id").as("doc_id"), col("component").as("keep_id"))
}
