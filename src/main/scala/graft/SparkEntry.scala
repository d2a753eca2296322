package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.kmeans.{Dbi, KMeans, KMeansParams}
import graft.operators.{Bucketing, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables
import graft.streaming.EventWindows

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY §2 (or a
  * beyond-reference pipeline operator) exercised end-to-end on the
  * driver testdata; `oracleSql` holds the DuckDB-equivalent SQL for the
  * hash-compare. Determinism rules used throughout:
  *   - double sums go through DECIMAL (exact, associative → identical
  *     across engines and partition orders), then cast back to double;
  *   - means are (exact double) / (exact long) — one IEEE division;
  *   - every query ends in an ORDER BY on a unique key;
  *   - argmin ties break to the lowest index via identical CASE chains.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, n: String): DataFrame = {
    lastDatasetDir = dir
    Tables(s, dir, n)
  }

  /** exact associative sum: double → decimal → sum → double */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // ---- per-artifact build-cost ledger: every once-per-(JVM, sf dir)
  // ---- artifact build (they land in Bench's untimed warmup pass by
  // ---- design) records its wall seconds here, and Bench publishes the
  // ---- table in its JSON line — so build cost is machine-readable
  // ---- next to the per-query floors and can never silently vanish
  // ---- from the round's accounting.

  private val artifactCosts =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  private def recordArtifactCost[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    artifactCosts.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Snapshot of artifact-build wall seconds recorded so far in this
    * JVM (one entry per artifact family per sf dir built). */
  def artifactBuildCosts: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    artifactCosts.asScala.toMap
  }

  // ---- persisted PQ/IVF-PQ index shared by q95 (ADC) and q96 (IVF-PQ):
  // ---- built and parquet'd ONCE per (JVM, sf dir) — at 100 TB nobody
  // ---- re-fits codebooks per query; the probes below read the code
  // ---- tables only (q96 partition-pruned to the probed cells). The
  // ---- build lands in Bench's untimed warmup pass, so the timed lines
  // ---- measure the probe, which is what a deployment pays per query.

  private val pqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pqIndexPath(s: SparkSession, dir: String): String =
    pqIndexCache.computeIfAbsent(dir, _ =>
      recordArtifactCost(s"pq_ivf_index:${dirTag(dir)}") {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_pqidx_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val emb = T(s, dir, "embeddings")
      val cb = operators.Quantization.fitPQ(emb, "vec_id", "embedding",
        dim = 64, m = 4, k = 16, iters = 4)
      val init = emb.orderBy("vec_id").limit(8)
        .select(col("embedding").cast("array<float>"))
        .collect().map(_.getSeq[Float](0).toArray)
      val ivf = Similarity.buildIvfIndex(emb, nlist = 8,
        quantizerIters = 6, initCentroids = Some(init))
      operators.Quantization.writePqIndex(emb, "vec_id", "embedding", cb,
        base, coarse = Some(ivf))
      ivf.unpersist()
      base
    })

  /** Short sf-dir discriminator for the artifact-cost ledger keys.
    * Basename + full-path hash: two dataset dirs sharing a basename
    * (e.g. /a/sf0.1 and /b/sf0.1) each build their artifact (caches
    * key on the full path), so the ledger must not collapse them. */
  private def dirTag(dir: String): String = {
    val base = dir.split('/').filter(_.nonEmpty).lastOption.getOrElse(dir)
    s"$base-${Integer.toHexString(dir.hashCode)}"
  }

  // ---- deterministic media fixtures shared by q109 (PNG decode) and
  // ---- q110 (WAV decode): encoded ONCE per (JVM, sf dir) and
  // ---- parquet'd — the fixture ENCODE is corpus preparation, not the
  // ---- operator under test (a pipeline's blobs arrive already
  // ---- encoded). The build lands in Bench's untimed warmup pass (the
  // ---- pqIndexPath precedent), so the timed lines measure the DECODE.

  private val mediaFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def mediaFixturePath(s: SparkSession, dir: String): String =
    mediaFixtureCache.computeIfAbsent(dir, _ =>
      recordArtifactCost(s"media_fixtures:${dirTag(dir)}") {
      import s.implicits._
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_media_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val ids = T(s, dir, "documents").select(col("doc_id").cast("long"))
      ids.as[Long]
        .mapPartitions(_.map(id =>
          (id, operators.Multimodal.pngPayload(id, 8))))
        .toDF("media_id", "payload")
        .write.mode("overwrite").parquet(s"$base/png")
      ids.as[Long]
        .mapPartitions(_.map(id =>
          (id, operators.Multimodal.wavPayload(id, 64))))
        .toDF("media_id", "payload")
        .write.mode("overwrite").parquet(s"$base/wav")
      // the LOSSY second container format (q188): flat-gray JPEGs —
      // real corpora are mixed-format, so the decode surface must be
      // exercised beyond PNG/WAV
      ids.as[Long]
        .mapPartitions(_.map(id =>
          (id, operators.Multimodal.jpegPayload(id, 8))))
        .toDF("media_id", "payload")
        .write.mode("overwrite").parquet(s"$base/jpg")
      base
    })

  // ---- persisted graph artifacts shared by the graph tier (q98, q102,
  // ---- q107, q111, q113-q117): the distinct-edge + out-weight +
  // ---- node-list scaffolding is built and parquet'd ONCE per
  // ---- (JVM, sf dir) via Graph.writeGraphTable — the persisted
  // ---- PQ/IVF-index precedent applied to graphs. At 100 TB a
  // ---- deployment builds the graph table once and iterates many; the
  // ---- build lands in Bench's untimed warmup pass, so the timed lines
  // ---- measure the iterate-from-artifact cost, which is what every
  // ---- query after the first pays. GraphSpec proves
  // ---- load-then-iterate == inline-build bit-for-bit.

  /** q34's persisted fingerprint table for `dir`. Deliberately outlives
    * the JVM — the DuckDB oracle pass reads it after Verify exits — and
    * deliberately pid-FREE: the path must be reconstructible from the
    * dataset dir alone so [[oracleSql]] (dumped by the same run) still
    * resolves post-exit. The dir-hash discriminator keeps concurrent
    * runs over DIFFERENT dataset dirs (the tri-scale sweep) from
    * overwriting each other's table; two concurrent runs over the SAME
    * dir still share a path — one-Verify-per-(host, dir) is the
    * documented constraint (queries inside one run are sequential). */
  private[graft] def simhashFpPath(dir: String): String =
    sys.props("java.io.tmpdir") + "/graft_simhash_fp_" +
      Integer.toHexString(dir.hashCode)

  /** q189's persisted BPE merges table for `dir` — the q34 device
    * applied to the tokenizer model: the oracle replays the greedy
    * merge loop per distinct word in a recursive CTE over THESE rows
    * after the JVM exits, so the path is pid-free, dir-hashed, and not
    * TempCleanup-registered. */
  private[graft] def bpeMergesPath(dir: String): String =
    sys.props("java.io.tmpdir") + "/graft_bpe_merges_" +
      Integer.toHexString(dir.hashCode)

  /** The dataset dir of the most recent [[queries]] invocation — lets
    * the [[oracleSql]] dump (which has no dir parameter in the driver
    * contract) interpolate run-scoped artifact paths like
    * [[simhashFpPath]]. Verify runs every query for ONE dir, then
    * dumps, so last-write is the right value. */
  @volatile private var lastDatasetDir: String = "unset"

  private val graphTableCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def graphTablePath(s: SparkSession, dir: String): String =
    graphTableCache.computeIfAbsent(dir, _ =>
      recordArtifactCost(s"graph_tables:${dirTag(dir)}") {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_graph_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      // ONE cached (orderkey, src, dst) join feed — the r12 ledger
      // showed this build at 162 s/sf0.1 because the l⋈o pipeline
      // re-executed per artifact (3× for directed+undirected via the
      // union branches, 3× more for the weighted pair): every scaffold
      // below derives from this one materialization, so the join and
      // the parquet scans run exactly once per (JVM, dir).
      val pairsAll = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("src"),
          (col("l_suppkey") + 10000000L).as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairsAll.count() // materialize ONCE, before the parallel branches
      // weighted purchase graph: edge weight = number of line items
      // between the pair (purchase frequency), grouped so the pairs
      // are distinct by construction: q116. ONE pair shuffle — the
      // unweighted `directed` edge set is exactly this table's keys,
      // so the old separate distinct() is derived, not recomputed.
      val weighted = pairsAll
        .groupBy("src", "dst")
        .agg(count(lit(1)).cast("double").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      weighted.count() // materialize before the parallel branches
      // directed customer -> supplier purchase graph (supplier ids
      // offset by 1e7): q102/q107/q113/q114/q115 — the weighted
      // table's key set, distinct by construction, zero extra shuffle
      val directed = weighted.select(col("src"), col("dst"))
      // undirected double-edged feed (sink-free by construction):
      // q98/q117. The two directions are disjoint (supplier offset),
      // so the union stays distinct — and both branches read the
      // weighted cache, not the join lineage.
      val undirected = directed
        .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      // 10%-sampled order feed: q111 (the ok column exists in the
      // cached feed precisely for this filter); 90% complement feed:
      // q130's append-lifecycle base (write from 90%, append the
      // sampled10 batch) — both of q130's edge feeds come from this
      // shared artifact, so its timed line measures the lifecycle ops,
      // not a third re-execution of the l⋈o extraction.
      val sampled = pairsAll.where(col("ok") % 10 === 0)
        .select(col("src"), col("dst"))
        .distinct()
      val sampled90 = pairsAll.where(col("ok") % 10 =!= 0)
        .select(col("src"), col("dst"))
        .distinct()
      // symmetric COST-weighted twin for q134 shortest paths: cost =
      // 1 + floor(100/purchase_count), so frequent ties are cheap and
      // path costs discriminate (raw counts would collapse min-paths
      // to hop counts: almost every pair has a weight-1 edge). The
      // cost is exact — integer-valued doubles from one IEEE division
      // + floor, identical in any engine. Doubled directions stay
      // disjoint by the supplier offset; the bipartite directed feed
      // would dead-end every path at hop 1.
      val weightedSym = weighted
        .withColumn("w", lit(1.0) + floor(lit(100.0) / col("w")))
      // part↔part co-purchase graph (parts sharing an order), symmetric
      // double-edged — the non-bipartite body for the structural tier:
      // q119 (triangles) / q120 (clustering coeff) / q121 (k-core).
      // The per-order pair expansion is bounded by order size (≤ C(13,2)
      // pairs a row), never quadratic in the corpus.
      val lp = T(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pp cached so the symmetric union reads it once, not the
      // self-join pipeline twice; lp cached so the self-join's two
      // sides share one scan+distinct.
      val pp = lp.select(col("ok"), col("pk").as("p1"))
        .join(lp.select(col("ok"), col("pk").as("p2")), "ok")
        .where(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val copurchase = pp
        .union(pp.select(col("dst").as("src"), col("src").as("dst")))
      // The seven artifacts derive from three materialized caches
      // (pairsAll / weighted / lp+pp) and are mutually independent, so
      // their writes run CONCURRENTLY: each write is a short chain of
      // small jobs (stats aggregates + parquet) that underutilizes the
      // 32 local cores alone — overlapping them cut the fresh-JVM
      // build ~2× at sf0.1 and, on a cluster, overlaps each table's
      // scheduling/IO gaps with another's compute. Concurrent actions
      // on a shared cache are safe (block-level locks: first computes,
      // others reuse).
      val tables: Seq[(String, DataFrame, Option[String])] = Seq(
        ("directed_w", weighted, Some("w")),
        ("directed", directed, None),
        ("undirected", undirected, None),
        ("sampled10", sampled, None),
        ("sampled90", sampled90, None),
        ("undirected_w", weightedSym.union(weightedSym
          .select(col("dst").as("src"), col("src").as("dst"), col("w"))),
          Some("w")),
        ("copurchase", copurchase, None))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(tables.size)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val writes = tables.map { case (name, df, w) => Future {
        operators.Graph.writeGraphTable(df, "src", "dst",
          s"$base/$name", weightCol = w, assumeDistinct = true)
      }}
      try writes.foreach(Await.result(_, Duration.Inf))
      finally {
        pool.shutdown()
        pairsAll.unpersist(blocking = false)
        weighted.unpersist(blocking = false)
        lp.unpersist(blocking = false)
        pp.unpersist(blocking = false)
      }
      base
    })

  private def graphTable(
      s: SparkSession, dir: String, which: String): operators.GraphTable =
    operators.Graph.readGraphTable(s, s"${graphTablePath(s, dir)}/$which")

  // ---- persisted label-propagation result consumed by q164
  // ---- (modularity OF the fitted labels): community labels are a
  // ---- fitted artifact a deployment computes once and scores many
  // ---- times, so q164 must not refit the 5-round propagation inside
  // ---- its own line. q117 — the propagation itself — computes its 5
  // ---- rounds in-line (the fit IS that line's workload; r12 reverted
  // ---- the r11 artifact-read form so the cost can't escape the
  // ---- min-of-passes bench). Labels are exact longs: the parquet
  // ---- round trip is bit-lossless, so load-then-modularity ≡ inline
  // ---- bit-for-bit (GraphSpec pins it).

  private val labelTableCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def labelTablePath(s: SparkSession, dir: String): String =
    labelTableCache.computeIfAbsent(dir, _ =>
      recordArtifactCost(s"label_table:${dirTag(dir)}") {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_labels_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      graphTable(s, dir, "undirected").labelPropagation(iters = 5)
        .write.mode("overwrite").parquet(base)
      base
    })

  // ---- near-dup pair graph shared by q17 (pairs) and q66 (components):
  // ---- ONE Scala builder and ONE oracle CTE so the two queries cannot
  // ---- silently drift apart when the shingle/threshold tuning changes

  private val pairShingleN = 8
  private val pairThreshold = 0.35

  /** exact n-gram Jaccard pairs (id_a, id_b, jac) over docs 0..499 */
  private def jaccardPairGraph(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(
      T(s, dir, "documents").where(col("doc_id") < 500),
      n = pairShingleN, threshold = pairThreshold)

  /** The same pair graph as DuckDB CTEs (string shingles — counts equal
    * the engine's hashed ones absent 64-bit collisions). MATERIALIZED:
    * inside WITH RECURSIVE (q66) DuckDB inlines multiply-referenced
    * CTEs, and `pairs` (the O(n²) shingle join) is referenced twice by
    * the edge CTE — without the hint the quadratic work runs twice. */
  private val jaccardPairsCte: String = {
    val n = pairShingleN
    s"""s AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(
       |range(1, length(text) - ${n - 2}), i -> substr(text, CAST(i AS INT), $n))) AS sh
       |FROM documents WHERE doc_id < 500),
       |pairs AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |len(list_distinct(list_concat(a.sh, b.sh))) AS jac
       |FROM s a, s b WHERE a.doc_id < b.doc_id
       |AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |len(list_distinct(list_concat(a.sh, b.sh))) > $pairThreshold)""".stripMargin
  }

  /** q106 oracle: the Rademacher signs are seeded driver-side
    * constants, so inline them and replay the engine's fixed-order f64
    * fold with the q16-proven `list_sum(list_transform(list_zip(...)))`
    * pattern (±1 products are exact sign flips — no rounding anywhere
    * before the ordered double sum). */
  private def rpOracleSql(seed: Long, outDim: Int, dim: Int): String = {
    val dots = operators.Similarity.rademacherSigns(seed, outDim, dim)
      .zipWithIndex.map { case (s, p) =>
        val lst = s.map(v => if (v > 0f) "1.0" else "-1.0")
          .mkString("[", ", ", "]")
        "list_sum(list_transform(list_zip(embedding, " + lst +
          s"), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS p$p"
      }.mkString(",\n")
    s"SELECT vec_id, $dots FROM embeddings ORDER BY vec_id"
  }

  /** q61's latest-per-key oracle — also q144's: the streaming
    * materialization's final snapshot is exactly the batch answer. */
  private val latestEventOracle: String =
    """SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |event_id, event_type, value FROM (
      |SELECT *, row_number() OVER
      |(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q87's delta×corpus exact-Jaccard pair oracle — also q145's: the
    * appended index must probe identically to the one-shot build. */
  private val minhashProbeOracle: String =
    """WITH s AS (SELECT doc_id, list_distinct(list_transform(
      |range(1, length(text) - 6), i -> substr(text, CAST(i AS INT), 8))) AS sh
      |FROM documents)
      |SELECT b.doc_id AS id_new, a.doc_id AS id_old,
      |CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |len(list_distinct(list_concat(a.sh, b.sh))) AS jac
      |FROM s a, s b
      |WHERE a.doc_id % 100 != 45 AND b.doc_id % 100 = 45
      |AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |len(list_distinct(list_concat(a.sh, b.sh))) > 0.35
      |ORDER BY id_new, id_old""".stripMargin

  /** q138 oracle: the hashing-trick buckets/signs replayed with the
    * identical seeded-md5 arithmetic, generated from one recipe so
    * engine and oracle cannot drift. Feature expressions mirror the
    * query's (event_type, prop_k = props.$.k). */
  private def featureHashOracleSql(dim: Int, seed: Long): String = {
    val feats = Seq(
      "event_type" -> "event_type",
      "prop_k" -> "json_extract_string(props, '$.k')")
    val cols = (0 until dim).map { i =>
      feats.map { case (n, e) =>
        val m = s"md5('$seed-$n=' || $e)"
        s"(CASE WHEN CAST(('0x' || substr($m, 1, 8)) AS BIGINT) " +
          s"% $dim = $i THEN (CASE WHEN CAST(('0x' || substr($m, 9, 1)) " +
          "AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END) ELSE 0 END)"
      }.mkString("CAST(", " + ", s" AS BIGINT) AS h$i")
    }.mkString(",\n")
    s"SELECT event_id, $cols FROM events ORDER BY event_id"
  }

  // Fixed 1-D centroids on c_acctbal for the SQL-checkable assignment
  // queries (J1/A5 analogs). Non-round values so no data point ties.
  private val C0 = 211.73; private val C1 = 4387.21; private val C2 = 8842.02

  /** J1 argmin with lowest-index tie-break as a CASE chain — identical
    * double arithmetic in Spark and DuckDB. */
  private def acctCluster(c: Column): Column = {
    val d0 = abs(c - C0); val d1 = abs(c - C1); val d2 = abs(c - C2)
    when(d0 <= d1 && d0 <= d2, lit(0)).when(d1 <= d2, lit(1)).otherwise(lit(2))
  }
  private val acctClusterSql: String =
    s"CASE WHEN abs(c_acctbal - $C0) <= abs(c_acctbal - $C1) AND " +
      s"abs(c_acctbal - $C0) <= abs(c_acctbal - $C2) THEN 0 " +
      s"WHEN abs(c_acctbal - $C1) <= abs(c_acctbal - $C2) THEN 1 ELSE 2 END"

  // ---- fixed hyperplane centroids shared by q31/q32/q41 and their
  // ---- generated DuckDB oracles (so Spark code and SQL cannot drift)

  private val hpCents: Array[Array[Float]] =
    Similarity.hyperplanes(seed = 7L, nPlanes = 4, dim = 64)

  /** DuckDB float-array literal. Elements are rendered as the float's
    * EXACT double value (shortest-roundtrip for DOUBLE) and routed
    * decimal → DOUBLE → FLOAT: DuckDB's direct DECIMAL→FLOAT cast
    * double-rounds and can land on the wrong float (observed: literal
    * `-0.6505556` parsed one ulp off), while DECIMAL→DOUBLE→FLOAT is
    * exact because the double is bit-exactly a float. */
  private def sqlVec(v: Array[Float]): String =
    v.map(x => java.lang.Double.toString(x.toDouble))
      .mkString("[", ", ", "]::DOUBLE[]::FLOAT[]")

  /** DuckDB squared-Euclidean distance `emb ↔ centroid` — the same
    * left-to-right double fold as [[graft.functions.VecSqDist]] /
    * `argminCentroid` (list_sum folds in index order; proven bit-equal
    * by the green q16, which pairs list_sum with VecDot). */
  private def sqlSqDist(emb: String, c: Array[Float]): String =
    s"list_sum(list_transform(list_zip($emb, ${sqlVec(c)}), " +
      "p -> (CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))" +
      "*(CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))))"

  /** CTE projecting per-row d0..d3 and the argmin cluster (lowest-index
    * ties — the same CASE shape as `VectorFunctions.assignCol`). */
  private def hpAssignSql(cols: String): String = {
    val k = hpCents.length
    val dDefs = hpCents.zipWithIndex
      .map { case (c, i) => s"${sqlSqDist("embedding", c)} AS d$i" }
      .mkString(", ")
    val whens = (0 until k - 1).map { i =>
      val conj = (i + 1 until k).map(j => s"d$i <= d$j").mkString(" AND ")
      s"WHEN $conj THEN $i"
    }.mkString(" ")
    s"d_ AS (SELECT $cols, $dDefs FROM embeddings), " +
      s"a_ AS (SELECT *, CASE $whens ELSE ${k - 1} END AS cluster FROM d_)"
  }

  /** DuckDB emulation of `VectorFunctions.meanRounded5` on a DOUBLE mean
    * `m`: float mean, ×1e5 in f32, +0.5f, floor, /1e5f — Java
    * `Math.round(mean*100000f)/100000.0f` bit-for-bit (DuckDB FLOAT
    * arithmetic is true f32; verified over 6k samples incl. half-way
    * boundaries). */
  private def sqlMeanRounded5(m: String): String =
    s"CAST(floor(CAST(CAST(CAST($m AS FLOAT)*CAST(100000 AS FLOAT) AS FLOAT)" +
      "+CAST(0.5 AS FLOAT) AS DOUBLE)) AS FLOAT)/CAST(100000 AS FLOAT)"

  private def sqlSqDistCols(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      "p -> (CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))" +
      "*(CAST(p[1] AS DOUBLE)-CAST(p[2] AS DOUBLE))))"

  /** Recursive-CTE DuckDB replica of `KMeans.fit` over the embeddings
    * table with init = first `k` rows by vec_id (the exact fit the q30 /
    * q40 Spark paths run). Produces a CTE named `iter` with columns
    * (it, cluster, c FLOAT[dim], max_moved); the fit result is the rows
    * at `it = max(it)`.
    *
    * Bit-parity argument, inductively per iteration: distances are the
    * same double folds over identical f32 centroids (list_sum ≡ VecDot
    * fold, proven by q16); the per-cluster-per-dim double sums differ
    * between engines only in summation order (≤ ~1e-12 relative), which
    * the f32 5-dp `meanRounded5` rounding absorbs — so each iteration's
    * new centroids are bit-identical floats, and the recursion carries
    * no drift. Convergence (`<= threshold` on Euclidean movement) and
    * the maxLoop M−1 semantics (`it <= maxIter`) mirror Main.java:
    * 205-220, 303-305. Empty cluster keeps its previous centroid
    * (coalesce — the engine's documented divergence).
    *
    * `vecExpr` is the SQL expression fit over (default: the raw
    * `embedding` column; q95 passes `list_slice(...)` sub-vectors) and
    * `cteName` names the produced CTE so several fits can share one
    * `WITH RECURSIVE` (q95 runs one per PQ subspace). */
  private def sqlKMeansIterCte(
      k: Int, dim: Int, maxIter: Int, threshold: Double,
      vecExpr: String = "embedding", cteName: String = "iter"): String = {
    s"""$cteName AS (
       |  SELECT 0 AS it,
       |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
       |    v AS c, 1e18 AS max_moved
       |  FROM (SELECT vec_id, $vecExpr AS v FROM embeddings
       |        ORDER BY vec_id LIMIT $k)
       |  UNION ALL
       |  SELECT nxt.it, nxt.cluster, nxt.c, max(nxt.moved) OVER () AS max_moved
       |  FROM (
       |    SELECT old.it + 1 AS it, old.cluster,
       |           coalesce(nm.c, old.c) AS c,
       |           CASE WHEN nm.c IS NULL THEN 0.0
       |                ELSE sqrt(${sqlSqDistCols("old.c", "nm.c")}) END AS moved
       |    FROM $cteName old
       |    LEFT JOIN (
       |      SELECT cluster,
       |             list(${sqlMeanRounded5("sv/cnt")} ORDER BY i) AS c
       |      FROM (
       |        SELECT a.cluster, r.i,
       |               sum(CAST(a.v[r.i+1] AS DOUBLE)) AS sv,
       |               count(*) AS cnt
       |        FROM (
       |          SELECT p.v, d.cluster
       |          FROM (SELECT $vecExpr AS v FROM embeddings) p
       |          CROSS JOIN LATERAL (
       |            SELECT w.cluster FROM $cteName w
       |            ORDER BY ${sqlSqDistCols("p.v", "w.c")}, w.cluster
       |            LIMIT 1
       |          ) d
       |        ) a CROSS JOIN range(0, $dim) r(i)
       |        GROUP BY a.cluster, r.i
       |      ) GROUP BY cluster
       |    ) nm ON nm.cluster = old.cluster
       |  ) nxt
       |  WHERE nxt.it <= $maxIter
       |    AND (SELECT max(max_moved) FROM $cteName) > $threshold
       |)""".stripMargin
  }

  /** DuckDB dot product of two FLOAT[] expressions — VecDot's fold. */
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      "p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))"

  /** ONE CountMin oracle shape for q157 (in-memory sketch), q178 (the
    * persisted build/append/probe lifecycle), and q182 (the streamed
    * build): identical md5-hex row hashes mod 2048 over the FULL
    * corpus — counter-wise sums commute, so any split-and-append
    * (batch or micro-batch) must equal it exactly. */
  private def countMinOracleFor(table: String, keyCol: String): String =
    s"""WITH k AS MATERIALIZED (SELECT $keyCol AS k FROM $table),
      |cnt AS MATERIALIZED (SELECT k, count(*) AS true_cnt FROM k
      |  GROUP BY 1),
      |top AS MATERIALIZED (SELECT k, true_cnt FROM cnt
      |  ORDER BY true_cnt DESC, k LIMIT 20),
      |sk AS MATERIALIZED (SELECT r.i,
      |  ('0x' || substr(md5(r.i || '-' || k.k), 1, 8))::BIGINT % 2048
      |    AS idx, count(*) AS cnt
      |  FROM k CROSS JOIN range(0, 4) r(i) GROUP BY 1, 2),
      |est AS (SELECT t.k, t.true_cnt,
      |  min(coalesce(sk.cnt, 0)) AS est
      |  FROM top t CROSS JOIN range(0, 4) r(i)
      |  LEFT JOIN sk ON sk.i = r.i AND sk.idx =
      |    ('0x' || substr(md5(r.i || '-' || t.k), 1, 8))::BIGINT % 2048
      |  GROUP BY 1, 2)
      |SELECT k AS $keyCol, true_cnt, est FROM est
      |ORDER BY true_cnt DESC, $keyCol""".stripMargin

  private val countMinOracleSql: String =
    countMinOracleFor("lineitem", "l_partkey")

  // ---- multilingual tokenizer fixture shared by q177's Spark side and
  // ---- its DuckDB oracle (ONE row source, so the two cannot drift):
  // ---- five non-Latin scripts + English, all NFC, no astral chars,
  // ---- no apostrophes (SQL literal safety). The testdata documents
  // ---- table is pure ASCII, so THIS is where `\p{L}` earns its keep.

  private val unicodeFixtureRows: Seq[(Long, String, String)] = Seq(
    (0L, "ru", "привет мир привет всем добрый день мир и снова привет"),
    (1L, "el", "καλημέρα κόσμε ωραία μέρα σήμερα κόσμε καλημέρα"),
    (2L, "ar", "مرحبا بالعالم اليوم مرحبا بكم في عالم البيانات"),
    (3L, "zh", "你好世界 今天 天气 很好 你好 数据 管道 你好"),
    (4L, "fr", "le café est à côté du café naïve déjà vu déjà 2024"),
    (5L, "en", "the quick brown fox jumps over the lazy dog 42 times"),
    // r10: the five scripts the router previously sent to 'other' —
    // Hangul, kana (ja mixes kana + Han), Devanagari, Thai, Hebrew
    (6L, "ko", "안녕하세요 세계 좋은 아침 입니다 데이터 처리"),
    (7L, "ja", "こんにちは 世界 今日は いい 天気 です データ"),
    (8L, "hi", "नमस्ते दुनिया आज मौसम अच्छा है डेटा"),
    (9L, "th", "สวัสดีชาวโลก วันนี้อากาศดี ข้อมูล"),
    (10L, "he", "שלום עולם היום מזג האוויר נעים נתונים"))

  private def unicodeFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    unicodeFixtureRows.toDF("doc_id", "lang", "text")
  }

  private val unicodeFixtureSqlValues: String = unicodeFixtureRows
    .map { case (id, lang, text) => s"($id, '$lang', '$text')" }
    .mkString(",\n        |    ")

  // ---- encoding-damage fixture (q187): the three mojibake
  // ---- signatures planted one per row, shared with the oracle via
  // ---- the VALUES device. Damaged chars are built with .toChar so
  // ---- the source stays ASCII-safe (no raw control chars in code).

  private val mojibakeFixtureRows: Seq[(Long, String)] = Seq(
    (0L, "a clean ascii sentence about data pipelines"),
    (1L, s"decoder gave up ${0xFFFD.toChar} twice ${0xFFFD.toChar} here"),
    (2L, s"cp1252 as latin1 leaves a c1 control ${0x009D.toChar} behind"),
    // é stored as UTF-8, decoded as Latin-1: 0xC3 0xA9 -> "Ã©"
    (3L, s"double encoded caf${0x00C3.toChar}${0x00A9.toChar} latte and " +
      s"${0x00C2.toChar}${0x00AB.toChar}quoted"),
    // U+2019 as UTF-8 read as Latin-1: 0xE2 0x80 0x99 -> "â€™"
    (4L, s"smart quote gone wrong ${0x00E2.toChar}${0x20AC.toChar}" +
      s"${0x2122.toChar} in two spots ${0x00E2.toChar}${0x20AC.toChar}" +
      s"${0x0153.toChar}"),
    (5L, s"proper unicode caf${0x00E9.toChar} stays clean"),
    // U+0085 NEL is a LEGITIMATE newline (EBCDIC/ISO conversions, some
    // XML pipelines) — excluded from the C1 class, so this row is clean
    (6L, s"nel${0x0085.toChar}is a line break not mojibake"))

  private val mojibakeFixtureSqlValues: String = mojibakeFixtureRows
    .map { case (id, text) => s"($id, '$text')" }
    .mkString(",\n        |    ")

  // ---- labeled real-language corpus for the char-n-gram NB detector
  // ---- (q179): train/test splits shared by the Spark side and the
  // ---- DuckDB oracle. Real sentences, 5 languages, no apostrophes
  // ---- (SQL literal safety), all NFC. The zh rows are actual Chinese
  // ---- — where the marker twin (pinyin word markers) scores zero.

  private val nbTrainRows: Seq[(String, String)] = Seq(
    "en" -> "the weather is nice today and the sun is shining",
    "en" -> "data processing at scale requires careful planning of resources",
    "en" -> "this is a long sentence about the history of science and discovery",
    "en" -> "children play in the park while parents watch from the benches",
    "en" -> "the quick brown fox jumps over the lazy dog near the river",
    "en" -> "machine learning models improve with more training data over time",
    "de" -> "das wetter ist heute schön und die sonne scheint den ganzen tag",
    "de" -> "die verarbeitung großer datenmengen erfordert sorgfältige planung",
    "de" -> "dies ist ein langer satz über die geschichte der wissenschaft",
    "de" -> "kinder spielen im park während die eltern von den bänken zuschauen",
    "de" -> "der schnelle braune fuchs springt über den faulen hund am fluss",
    "de" -> "maschinelles lernen wird mit mehr trainingsdaten immer besser",
    "fr" -> "le temps est beau et le soleil brille toute la journée",
    "fr" -> "le traitement des données à grande échelle demande une planification",
    "fr" -> "ceci est une longue phrase sur la histoire de la science",
    "fr" -> "les enfants jouent dans le parc pendant que les parents regardent",
    "fr" -> "le rapide renard brun saute par dessus le chien paresseux",
    "fr" -> "les modèles apprennent mieux avec plus de données de formation",
    "es" -> "el clima es agradable hoy y el sol brilla durante todo el día",
    "es" -> "el procesamiento de datos a gran escala requiere una planificación",
    "es" -> "esta es una frase larga sobre la historia de la ciencia",
    "es" -> "los niños juegan en el parque mientras los padres observan",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso junto al río",
    "es" -> "los modelos de aprendizaje mejoran con más datos de entrenamiento",
    "zh" -> "今天天气很好太阳一直在照耀着大地",
    "zh" -> "大规模数据处理需要仔细规划计算资源",
    "zh" -> "这是一个关于科学历史的很长的句子",
    "zh" -> "孩子们在公园里玩耍父母在长椅上看着",
    "zh" -> "敏捷的棕色狐狸跳过了河边懒惰的狗",
    "zh" -> "机器学习模型随着更多训练数据而不断改进",
    // r10: Korean, Japanese, Hindi — the scripts the wider router now
    // profiles (q180's 4-of-6/2-of-6 split needs 6 rows per language)
    "ko" -> "오늘 날씨가 좋고 해가 하루 종일 빛나고 있습니다",
    "ko" -> "대규모 데이터 처리는 자원의 신중한 계획이 필요합니다",
    "ko" -> "이것은 과학의 역사에 관한 긴 문장입니다",
    "ko" -> "아이들은 공원에서 놀고 부모들은 벤치에서 지켜봅니다",
    "ko" -> "빠른 갈색 여우가 강가의 게으른 개를 뛰어넘습니다",
    "ko" -> "기계 학습 모델은 더 많은 훈련 데이터로 개선됩니다",
    "ja" -> "今日はいい天気で太陽が一日中輝いています",
    "ja" -> "大規模なデータ処理にはリソースの慎重な計画が必要です",
    "ja" -> "これは科学の歴史についての長い文章です",
    "ja" -> "子供たちは公園で遊び親はベンチから見守っています",
    "ja" -> "すばやい茶色のキツネが川辺の怠け者の犬を飛び越えます",
    "ja" -> "機械学習モデルは訓練データが増えると改善されます",
    "hi" -> "आज मौसम अच्छा है और सूरज पूरे दिन चमक रहा है",
    "hi" -> "बड़े पैमाने पर डेटा संसाधन की सावधानीपूर्वक योजना चाहिए",
    "hi" -> "यह विज्ञान के इतिहास के बारे में एक लंबा वाक्य है",
    "hi" -> "बच्चे पार्क में खेलते हैं और माता पिता बेंच से देखते हैं",
    "hi" -> "तेज भूरी लोमड़ी नदी के पास आलसी कुत्ते के ऊपर कूदती है",
    "hi" -> "मशीन लर्निंग मॉडल अधिक प्रशिक्षण डेटा से बेहतर होते हैं")

  private val nbTestRows: Seq[(Long, String, String)] = Seq(
    (0L, "en", "the library opens early in the morning for students"),
    (1L, "en", "good food and good friends make the evening pleasant"),
    (2L, "en", "the train arrives at the station every hour during the day"),
    (3L, "en", "science and art often inspire each other in surprising ways"),
    (4L, "de", "die bibliothek öffnet früh am morgen für die studenten"),
    (5L, "de", "gutes essen und gute freunde machen den abend angenehm"),
    (6L, "de", "der zug kommt jede stunde am bahnhof an"),
    (7L, "de", "wissenschaft und kunst inspirieren sich oft gegenseitig"),
    (8L, "fr", "la bibliothèque ouvre tôt le matin pour les étudiants"),
    (9L, "fr", "la bonne cuisine et les bons amis rendent la soirée agréable"),
    (10L, "fr", "le train arrive à la gare toutes les heures pendant la journée"),
    (11L, "fr", "la science et la art se inspirent souvent mutuellement"),
    (12L, "es", "la biblioteca abre temprano por la mañana para los estudiantes"),
    (13L, "es", "la buena comida y los buenos amigos hacen la noche agradable"),
    (14L, "es", "el tren llega a la estación cada hora durante el día"),
    (15L, "es", "la ciencia y el arte se inspiran mutuamente con frecuencia"),
    (16L, "zh", "图书馆早上很早为学生开放"),
    (17L, "zh", "美食和好朋友让夜晚变得愉快"),
    (18L, "zh", "火车每小时到达车站一次"),
    (19L, "zh", "科学与艺术常常相互启发"),
    (20L, "ko", "도서관은 학생들을 위해 아침 일찍 문을 엽니다"),
    (21L, "ko", "좋은 음식과 좋은 친구는 저녁을 즐겁게 만듭니다"),
    (22L, "ja", "図書館は学生のために朝早く開きます"),
    (23L, "ja", "おいしい食事と良い友達は夜を楽しくします"),
    (24L, "hi", "पुस्तकालय छात्रों के लिए सुबह जल्दी खुलता है"),
    (25L, "hi", "अच्छा खाना और अच्छे दोस्त शाम को सुखद बनाते हैं"))

  private val nbTrainSqlValues: String = nbTrainRows
    .map { case (lang, text) => s"('$lang', '$text')" }
    .mkString(",\n        |    ")

  private val nbTestSqlValues: String = nbTestRows
    .map { case (id, lang, text) => s"($id, '$lang', '$text')" }
    .mkString(",\n        |    ")

  /** Flagship query on sf=0.001: full K-Means fit on the embeddings
    * table (the reference's entire pipeline, SURVEY §3.1) → centroids. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = T(spark, dir, "embeddings")
    val init = emb.orderBy("vec_id").limit(8)
      .select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val model = KMeans.fit(
      emb.select(col("embedding").as("features")),
      KMeansParams(k = 8, threshold = 1e-3, maxLoop = 20,
        initCentroids = Some(init)))
    model.centroidsAsDF(spark)
  }

  // ------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2+A3: grouped partial+final aggregation (the combiner/reducer core)
    "q01_agg_sum" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // S-scan + P-filter + projection with pushdown
    "q02_filter_project" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .where(col("l_quantity") > 45 && col("l_discount") < 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_shipdate").cast("long").as("ship_epoch"))
        // (l_orderkey, l_linenumber) is not unique in this data (q143
        // measures it): sort by every emitted column so ties are
        // bit-identical rows and the positional compare is order-proof
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "ship_epoch")
    }),

    // Broadcast join through the dim chain (J1's relational form)
    "q03_join_dims" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = broadcast(T(s, dir, "nation"))
      val r = broadcast(T(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 2).as("sum_bal"))
        .orderBy("r_name", "n_name")
    }),

    // O: global top-k (TakeOrderedAndProject — no full sort at scale)
    "q04_topk_orders" -> ((s, dir) => {
      T(s, dir, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Window: per-group top-n with deterministic tiebreak
    "q05_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // J1: broadcast-argmin assignment to fixed centroids + A4 counts
    "q06_argmin_assign" -> ((s, dir) => {
      T(s, dir, "customer")
        .select(acctCluster(col("c_acctbal")).as("cluster"), col("c_acctbal"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          (dsum(col("c_acctbal"), 2) / count(lit(1))).as("mean_bal"))
        .orderBy("cluster")
    }),

    // One full Lloyd iteration (map+combine+reduce) in relational form,
    // 3-D feature space on lineitem, k=2 fixed centroids
    "q07_kmeans_step" -> ((s, dir) => {
      val q = col("l_quantity"); val d = col("l_discount"); val t = col("l_tax")
      val d0 = (q - 10.0) * (q - 10.0) + (d - 0.03) * (d - 0.03) + (t - 0.02) * (t - 0.02)
      val d1 = (q - 40.0) * (q - 40.0) + (d - 0.07) * (d - 0.07) + (t - 0.05) * (t - 0.05)
      T(s, dir, "lineitem")
        .select(when(d0 <= d1, lit(0)).otherwise(lit(1)).as("cluster"), q, d, t)
        .groupBy("cluster")
        .agg(
          count(lit(1)).as("n"),
          (dsum(q, 2) / count(lit(1))).as("mean_qty"),
          (dsum(d, 6) / count(lit(1))).as("mean_disc"),
          (dsum(t, 6) / count(lit(1))).as("mean_tax"))
        .orderBy("cluster")
    }),

    // A5: per-cluster scatter (mean distance to assigned centroid);
    // distance summed via decimal for cross-engine determinism
    "q08_scatter" -> ((s, dir) => {
      val dmin = least(abs(col("c_acctbal") - C0), abs(col("c_acctbal") - C1),
        abs(col("c_acctbal") - C2))
      T(s, dir, "customer")
        .select(acctCluster(col("c_acctbal")).as("cluster"), dmin.as("dist"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          (dsum(col("dist"), 4) / count(lit(1))).as("mean_dist"))
        .orderBy("cluster")
    }),

    // Exact dedup: hash-groupBy keepers
    "q09_dedup_exact" -> ((s, dir) => {
      Dedup.exactKeepers(T(s, dir, "documents")).orderBy("keep_id")
    }),

    // Text: token counting
    "q10_token_stats" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_calc"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }),

    // Text: quality-score components
    "q11_text_quality" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.punctCount(col("text")).as("n_punct"),
          TextAnalysis.digitCount(col("text")).as("n_digit"),
          TextAnalysis.alphaCount(col("text")).as("n_alpha"))
        .orderBy("doc_id")
    }),

    // Text: language-marker scoring per declared lang
    "q12_lang_marker" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.wordOccurrences(col("text"), "the")).as("the_hits"))
        .orderBy("lang")
    }),

    // Set op: INTERSECT
    "q13_intersect" -> ((s, dir) => {
      T(s, dir, "customer").where(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("custkey"))
        .intersect(T(s, dir, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    // Set op: EXCEPT (ordering kept non-vacuous: customers that placed
    // orders minus the high-balance ones)
    "q14_except" -> ((s, dir) => {
      T(s, dir, "orders").select(col("o_custkey").as("custkey"))
        .except(T(s, dir, "customer").where(col("c_acctbal") > 5000.0)
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    // Date functions + aggregation
    "q15_date_agg" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("y", "m")
    }),

    // Similarity: exact brute-force top-10 by dot product vs vec_id 0
    "q16_knn_brute" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      Similarity.bruteForceTopK(emb, q, 10)
    }),

    // Dedup: exact n-gram Jaccard near-dup pairs (oracle for MinHash)
    "q17_jaccard_pairs" -> ((s, dir) =>
      jaccardPairGraph(s, dir).orderBy("id_a", "id_b")),

    // Multimodal: payload + typed metadata plumbing
    "q18_multimodal_meta" -> ((s, dir) => {
      Multimodal.asMedia(T(s, dir, "documents"))
        .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"))
        .orderBy("media_id")
    }),

    // Multimodal: deterministic frame sampling (explode shape)
    "q19_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(Multimodal.asMedia(T(s, dir, "documents")), 64)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("byte_offset").cast("long").as("byte_offset"))
        .orderBy("media_id", "frame_idx")
    }),

    // Structured Streaming: tumbling-window agg over events
    "q20_stream_hourly" -> ((s, dir) => {
      EventWindows.hourlyByType(s, dir).orderBy("hour_epoch", "event_type")
    }),

    // Streaming state: flatMapGroupsWithState sessionization (30-min gap)
    "q21_sessionize" -> ((s, dir) => {
      EventWindows.sessionize(s, dir, gapMinutes = 30)
        .orderBy("user_id", "start_us")
    }),

    // As-of join: each event gets the latest prior order total of the
    // same customer (custom distributed merge operator, AsOf.joinAsOf)
    "q22_asof_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = T(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_totalprice")).as("price"))
      operators.AsOf
        .joinAsOf(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("price"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("price"))
        .orderBy("event_id")
    }),

    // Grouping sets: ROLLUP over the nation/region dims
    "q23_rollup" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = broadcast(T(s, dir, "nation"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 2).as("sum_bal"))
        .orderBy(asc_nulls_first("n_name"))
    }),

    // Semi + anti join (EXISTS / NOT EXISTS)
    "q24_semi_anti" -> ((s, dir) => {
      val bigOrders = T(s, dir, "orders").where(col("o_totalprice") > 200000.0)
      val c = T(s, dir, "customer")
      val semi = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"),
          "leftsemi")
        .select(col("c_custkey"), lit("has_big").as("tag"))
      val anti = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"),
          "leftanti")
        .select(col("c_custkey"), lit("no_big").as("tag"))
      semi.union(anti).orderBy("c_custkey")
    }),

    // Language-ID argmax classifier vs the declared lang column
    "q25_lang_detect" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy(TextAnalysis.detectLang(col("text")).as("detected"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("detected")
    }),

    // ------- iterative / generated-oracle checks ----------------------

    // Full iterative K-Means fit (reference pipeline end-to-end).
    // Array output flattened to (cluster, dim_idx, cent_val) rows so the
    // harness can sort/hash scalars.
    "q30_kmeans_fit" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val init = emb.orderBy("vec_id").limit(8)
        .select(col("embedding").cast("array<float>"))
        .collect().map(_.getSeq[Float](0).toArray)
      KMeans.fit(emb.select(col("embedding").as("features")),
          KMeansParams(k = 8, threshold = 1e-3, maxLoop = 20,
            initCentroids = Some(init)))
        .centroidsAsDF(s)
        .select(col("cluster"),
          posexplode(col("centroid")).as(Seq("dim_idx", "cent_val")))
        .orderBy("cluster", "dim_idx")
    }),

    // Labeling (model.transform) + per-cluster counts, fixed centroids
    "q31_kmeans_label" -> ((s, dir) => {
      graft.kmeans.KMeansModel(hpCents, 0, converged = true)
        .transform(T(s, dir, "embeddings"), featuresCol = "embedding")
        .groupBy("cluster").agg(count(lit(1)).as("n"))
        .orderBy("cluster")
    }),

    // DBI evaluation query (SURVEY §3.2)
    "q32_dbi" -> ((s, dir) => {
      import s.implicits._
      val labeled = graft.kmeans.KMeansModel(hpCents, 0, converged = true)
        .transform(T(s, dir, "embeddings"), featuresCol = "embedding")
      Seq(Dbi.compute(labeled, hpCents, featuresCol = "embedding")).toDF("dbi")
    }),

    // MinHash LSH dedup (scale path; q17 is its exact oracle)
    "q33_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashDedupPairs(T(s, dir, "documents"), n = 8, threshold = 0.35)
        .orderBy("id_a", "id_b")
    }),

    // SimHash near-dup pairs via pigeonhole banding (recall 1 at the
    // chosen radius — DedupSpec proves it against brute force). Radius
    // 6 ≈ 10% differing bits, the realistic near-dup band; banding
    // cost scales with Σ bucket² so radius is the scale knob.
    // Oracle split: the fingerprint KERNEL needs 64-bit WRAPPING
    // multiply/add per character (FNV/splitmix mixing), which DuckDB's
    // overflow-checked BIGINT cannot express — so the engine-computed
    // per-doc fingerprints are persisted to parquet (q39's fingerprint-
    // sink precedent) and the PAIR EXTRACTION (the banding decision) is
    // verified exactly: the oracle reads the same fingerprint table and
    // replays `bit_count(xor(a.fp, b.fp)) <= 6` all-pairs. The pairs
    // side consumes the WRITTEN table (write→read round trip), so Spark
    // and DuckDB decide over byte-identical inputs; the kernel itself
    // stays spec-pinned (DedupSpec banding ≡ brute-force-Hamming).
    // Fixed path, deliberately NOT TempCleanup-registered: the oracle
    // runs in a separate process after this JVM exits.
    "q34_simhash" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      docs.select(col("doc_id").as("id"),
          Dedup.simhash(col("text")).as("fp"))
        .coalesce(1)
        .write.mode("overwrite").parquet(simhashFpPath(dir))
      Dedup.simhashPairsFromFp(s.read.parquet(simhashFpPath(dir)),
          maxHamming = 6)
        .orderBy("id_a", "id_b")
    }),

    // ANN: LSH-bucketed top-k
    "q35_ann_lsh" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      Similarity.lshTopK(emb, q, 10, seed = 42L, nPlanes = 6)
    }),

    // ANN: IVF (K-Means coarse quantizer, deterministic injected init)
    "q40_ann_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      val init = emb.orderBy("vec_id").limit(8)
        .select(col("embedding").cast("array<float>"))
        .collect().map(_.getSeq[Float](0).toArray)
      Similarity.ivfTopK(emb, q, 10, nlist = 8, nprobe = 3,
        initCentroids = Some(init))
    }),

    // Embedding cosine near-dup pairs, exact on a bounded id range
    // (threshold 0.45 is non-vacuous on the testdata: the synthetic
    // embeddings have no planted duplicates and max pair cosine ≈ 0.51;
    // the sub-quadratic scale path is q42's banded LSH).
    "q36_embed_neardup" -> ((s, dir) => {
      Dedup.embeddingNearDupPairs(
          T(s, dir, "embeddings").where(col("vec_id") < 2000), 0.45)
        .orderBy("id_a", "id_b")
    }),

    // Embedding near-dup at scale: banded random-hyperplane LSH
    // candidates + exact cosine verify, on the bounded set unioned with
    // a deterministic f32-perturbed copy (planted near-dups, cos ≈ 1).
    "q42_embed_neardup_lsh" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings").where(col("vec_id") < 2000)
        .select(col("vec_id"), col("embedding"))
      val pert = emb.select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.0001f)).cast("float")).as("embedding"))
      Dedup.lshNearDupPairs(emb.union(pert), threshold = 0.9,
          nBands = 4, planesPerBand = 8, seed = 21L)
        .orderBy("id_a", "id_b")
    }),

    // Multimodal: stub decode via per-partition batches (mapPartitions);
    // feature vector flattened to (media_id, feat_idx, feat_val) rows
    "q37_multimodal_decode" -> ((s, dir) => {
      Multimodal.extractFeatures(
          Multimodal.asMedia(T(s, dir, "documents")), dim = 8)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("feat_idx", "feat_val")))
        .orderBy("media_id", "feat_idx")
    }),

    // Streaming: per-user hourly with watermark (update output mode, so
    // the watermark actually governs state retention)
    "q38_stream_user" -> ((s, dir) => {
      EventWindows.hourlyPerUser(s, dir).orderBy("hour_epoch", "user_id")
    }),

    // U1: typed VectorMeanAggregator (the Combiner/Reducer analog) as a
    // first-class aggregation over per-cluster embedding means; mean
    // vector flattened to (cluster, dim_idx, mean_val) rows. The 5-dp
    // float rounding makes the value stable under any partial-merge
    // order, so the generated SQL oracle matches bit-for-bit.
    "q41_vector_mean" -> ((s, dir) => {
      import s.implicits._
      val labeled = graft.kmeans.KMeansModel(hpCents, 0, converged = true)
        .transform(T(s, dir, "embeddings"), featuresCol = "embedding")
      val agg = new graft.kmeans.VectorMeanAggregator(64).toColumn
      labeled
        .select(col("cluster"),
          col("embedding").cast("array<float>").as("features"))
        .as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg)
        .toDF("cluster", "mean_vec")
        .select(col("cluster"),
          posexplode(col("mean_vec")).as(Seq("dim_idx", "mean_val")))
        .orderBy("cluster", "dim_idx")
    }),

    // Streaming model scoring (SURVEY §7.5): label a streaming vector
    // feed against broadcast centroids, running per-cluster counts.
    // Same fixture as q31, so the oracle is the same generated CASE
    // chain — batch and streaming labeling must agree exactly.
    "q44_stream_assign" -> ((s, dir) => {
      EventWindows.streamAssignCounts(s, dir, hpCents).orderBy("cluster")
    }),

    // Exact interpolated percentiles per group (linear interpolation —
    // the same definition as SQL quantile_cont). Exact percentile is
    // memory-bound by per-group distinct values; at 100 TB the same
    // query shape runs approx_percentile — exercised as a first-class
    // query by q52 (sketch vs exact, error-bounded oracle) and by
    // ApproxSpec's error-bound + partial/final-plan assertions.
    "q47_percentile" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.95)").as("p95_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"))
        .orderBy("l_returnflag")
    }),

    // Statistical aggregates (variance/stddev/correlation). Their
    // streaming double accumulation is summation-order-dependent at
    // ~1e-12 relative, so both engines round to 6 dp — the determinism
    // device for non-decimal-summable aggregates.
    "q48_stats" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
        .orderBy("l_returnflag")
    }),

    // Stream-static enrichment join (no stream state for the join —
    // the static dim broadcasts per micro-batch)
    "q45_stream_enrich" -> ((s, dir) => {
      EventWindows.streamEnrichByNation(s, dir).orderBy("c_nationkey")
    }),

    // Streaming exact dedup at ingest: dropDuplicates on the 8-byte
    // text fingerprint (the streaming analog of q09's dedup shuffle)
    "q46_stream_dedup" -> ((s, dir) => {
      EventWindows.streamDedupCount(s, dir).orderBy("shard")
    }),

    // Skew-resistant salted equi-join (operators.Joins): the hot-key
    // pattern AQE can't always fix — result must equal the plain join,
    // which is exactly what the oracle checks
    "q43_salted_join" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val ord = T(s, dir, "orders").where(col("o_totalprice") > 100000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
      operators.Joins.saltedJoin(li, ord, "l_orderkey", saltFactor = 8)
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy("y")
    }),

    // Text: document fingerprinting + BPE-ish token estimate. The query
    // emits the md5 fingerprint twin because DuckDB has no xxhash64 to
    // compare against; the production 8-byte xxhash64 form
    // (TextAnalysis.fingerprint) is spec-verified for determinism and
    // exercised by q09's dedup shuffle key.
    "q39_fingerprint" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"),
          TextAnalysis.tokenCountBpeIsh(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // Watermarked stream-stream inner join (click→purchase attribution
    // within 30 min) — the last streaming deployment shape: bounded
    // join state on both sides via watermark + time-range condition.
    // Collapsed to per-user pair counts; oracle = the batch time-range
    // self-join.
    "q49_stream_join" -> ((s, dir) => {
      EventWindows.streamClickPurchase(s, dir, windowMinutes = 30)
        .orderBy("user_id")
    }),

    // Grouping sets: CUBE over nation × market segment (all four
    // grouping combinations in one pass — Catalyst plans Expand +
    // one aggregation, not four scans)
    "q50_cube" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = broadcast(T(s, dir, "nation"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 2).as("sum_bal"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    }),

    // Approx sketch tier as a HARD harness row: HLL++ distinct-count
    // sketch (the 100 TB cardinality operator) next to the exact count,
    // emitting the exact value plus a flag asserting the sketch landed
    // within 10% (rsd 0.02 → 5σ: wide enough that a data-dependent
    // register bias at an unvalidated SF cannot fail the binary gate;
    // ApproxSpec asserts the much tighter observed error). Sketch
    // internals are engine-specific and can never hash-match an
    // oracle — the error BOUND can, so that is what the row checks.
    // Deterministic: HLL++ is hash-based, no RNG.
    "q51_approx_distinct" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"))
        .select(col("o_orderpriority"), col("n_exact"),
          when(abs(col("n_approx") - col("n_exact")) <=
            col("n_exact") * 0.10, lit(1)).otherwise(lit(0))
            .as("within_10pct"))
        .orderBy("o_orderpriority")
    }),

    // approx_percentile twin of q47, same error-bound device: the
    // sketch must land within max(5%, 1.0) of the exact interpolated
    // median (approx returns an actual data value, exact interpolates —
    // the 1.0 floor covers the interpolation gap on integer-valued
    // quantities).
    "q52_approx_percentile" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_exact"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("p50_approx"))
        .select(col("l_returnflag"), col("p50_exact"),
          when(abs(col("p50_approx") - col("p50_exact")) <=
            greatest(col("p50_exact") * 0.05, lit(1.0)), lit(1))
            .otherwise(lit(0)).as("within_bound"))
        .orderBy("l_returnflag")
    }),

    // Bucketed co-located join: both sides written bucketBy(custkey)
    // once, then sort-merge joined with ZERO exchange on either side
    // (BucketingSpec asserts the plan) — the write-once/join-many
    // pattern for a 100 TB fact table. The timed query includes the
    // two bucketed writes, i.e. the cost a real pipeline amortizes
    // across every later join. Result ≡ the plain join (bucketing is
    // pure physical layout), which is exactly what the oracle checks.
    "q53_bucketed_join" -> ((s, dir) => {
      // pid-suffixed path + table names: two harness JVMs on one host
      // must not overwrite each other's tables mid-read
      val pid = ProcessHandle.current().pid()
      val base = TempCleanup.register(
        sys.props("java.io.tmpdir") + s"/graft_bucketed_$pid")
      val c = Bucketing.writeBucketed(
        T(s, dir, "customer"), s"graft_bkt_customer_$pid",
        s"$base/customer", "c_custkey", 8)
      val o = Bucketing.writeBucketed(
        T(s, dir, "orders"), s"graft_bkt_orders_$pid",
        s"$base/orders", "o_custkey", 8)
      c.hint("merge").join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    // Reproducible stratified sampling + train/test split — hash-mod on
    // the stable document key, NOT rand(): re-runs, task retries, and
    // any repartitioning all select the exact same rows (rand()-based
    // Bernoulli sampling is partition-order-dependent and
    // irreproducible at 100 TB). Per-language rates stratify; a second
    // independent multiplier hashes the 80/20 split. The Knuth
    // multiplicative constants stay in BIGINT range for bounded ids;
    // unbounded ids would route through the compiled splitmix kernel
    // (Dedup.scala) with the same contract.
    "q54_sample_split" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val strat = pmod(col("doc_id") * lit(2654435761L), lit(100L))
      val rate = when(col("lang") === "en", lit(20L)).otherwise(lit(50L))
      d.where(strat < rate)
        .withColumn("split",
          when(pmod(col("doc_id") * lit(1099087573L), lit(10L)) < 8,
            lit("train")).otherwise(lit("test")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split")
    }),

    // Pivot (long → wide): one Expand + single aggregation pass, not
    // one scan per pivoted value; values enumerated explicitly so the
    // plan needs no driver-side distinct pre-pass.
    "q55_pivot" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0)).as("n_f"),
          coalesce(col("O"), lit(0)).as("n_o"),
          coalesce(col("P"), lit(0)).as("n_p"))
        .orderBy("o_orderpriority")
    }),

    // Running window: lag + cumulative sum per customer over order
    // history — the per-entity sequential-feature shape. One shuffle on
    // the partition key; the cumulative sum goes through DECIMAL so the
    // running values are exact (and the (date, orderkey) sort key is
    // unique, so RANGE vs ROWS framing cannot diverge).
    "q56_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .where(pmod(col("o_custkey"), lit(100L)) === 0)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("run_sum",
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("prev_price"), col("run_sum"))
        .orderBy("o_orderkey")
    }),

    // TF-IDF distinctive terms per language corpus — the curation op
    // that surfaces what a sub-corpus is "about". Tokenize once,
    // aggregate term frequency per language and document frequency
    // across the corpus (distinct doc×term), score tf·ln(N/df), top-10
    // per language by row_number over the ROUNDED score (6 dp — the
    // cross-engine determinism device for ln(), cf. q48) with the term
    // as tie-break. N comes from a parquet rowcount scan (metadata-
    // cheap at any scale). Tokens stay case-sensitive: Spark 4's
    // lower() pays a ~40 s one-time ICU init in this container.
    "q57_tfidf_top_terms" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val nDocs = d.count().toDouble
      val tok = d.select(col("lang"), col("doc_id"),
          explode(split(col("text"), TextAnalysis.tokenSplitRe)).as("term"))
        .where(col("term") =!= "")
      // ONE pipeline, no self-join: roll up to (doc, term) counts
      // ((doc_id, term) unique after it), then to (lang, term) with
      // both the term frequency and the per-language document count;
      // df(term) is a window sum of those doc counts over the term —
      // languages partition documents, so the sum IS the distinct doc
      // count. The corpus is tokenized exactly once (PlanSpec asserts
      // the single scan).
      val perDoc = tok.groupBy(col("doc_id"), col("lang"), col("term"))
        .agg(count(lit(1)).as("n"))
      val perLang = perDoc.groupBy(col("lang"), col("term"))
        .agg(sum(col("n")).as("tf"), count(lit(1)).as("docs_lt"))
      val scored = perLang
        .withColumn("df",
          sum(col("docs_lt")).over(Window.partitionBy(col("term"))))
        .withColumn("score", round(col("tf") * log(lit(nDocs) / col("df")), 6))
      val w = Window.partitionBy(col("lang"))
        .orderBy(desc("score"), asc("term"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10)
        .select(col("lang"), col("rn"), col("term"), col("score"))
        .orderBy("lang", "rn")
    }),

    // Small-files compaction: an over-parallel write (16 files) is
    // compacted to ~4 evenly-sized files, then read back and
    // aggregated — proving the rewrite is content-preserving (the
    // oracle is the same aggregate over the original table).
    // CompactionSpec asserts the file-count arithmetic; this row
    // pins content identity end-to-end through the real sink+source.
    "q58_compact_roundtrip" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_compact_q58_${ProcessHandle.current().pid()}")
      val docs = T(s, dir, "documents")
      docs.repartition(16).write.mode("overwrite").parquet(s"$base/small")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/small"))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
      sources.Compaction.compactParquet(
        s, s"$base/small", s"$base/compacted", math.max(1L, bytes / 4))
      s.read.parquet(s"$base/compacted")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_len"))
        .orderBy("lang")
    }),

    // Hot-key-only salting (operators.Joins.saltedJoinHotKeys): the
    // 100 TB form of q43 — an exact count over the left keys finds the
    // stragglers, and ONLY their right-side rows replicate ×saltFactor;
    // the long tail joins unsalted. Extra shuffle volume is
    // (S−1)×|right on hot keys| instead of (S−1)×|right|. Threshold 4
    // splits this corpus's 1–7-lines-per-order distribution so both the
    // salted and unsalted paths carry real rows. Oracle = the plain
    // join (hot-key salting is pure physical rebalancing). Honest
    // bench note: at sf0.1 the key-count pre-pass costs about what the
    // avoided ×8 replication saves (both ≈ 1.5–2 s); the win is at
    // scale, where (S−1)×|right| is shuffle volume and the pre-pass is
    // a map-side-combined count of 8-byte keys.
    "q59_hotkey_join" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val ord = T(s, dir, "orders").where(col("o_totalprice") > 100000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
      operators.Joins.saltedJoinHotKeys(li, ord, "l_orderkey",
        saltFactor = 8, hotThreshold = 4)
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy("y")
    }),

    // Global total-order sort: ORDER BY over the whole table plans as a
    // range-partitioned exchange (sampled split points) + per-partition
    // sort — every task sorts its slice and the slices concatenate into
    // the total order, vs. the single-task sort a naive engine runs.
    // PlanSpec asserts the rangepartitioning exchange; the oracle pins
    // content, and the (price DESC, key) sort key is unique so the
    // order itself is deterministic.
    "q60_global_sort" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    }),

    // Latest-row-per-key compaction (the CDC/upsert snapshot shape):
    // ONE partial/final max(struct) aggregation — no window sort, no
    // row_number, map-side combine does most of the work. The struct
    // compares (ts, event_id) lexicographically; event_id is unique so
    // the pick is deterministic under any merge order. At 100 TB this
    // is the nightly "current state" materialization over an append log.
    "q61_latest_event" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("last"))
        .select(col("user_id"),
          unix_micros(col("last.ts")).as("ts_us"),
          col("last.event_id").as("event_id"),
          col("last.event_type").as("event_type"),
          col("last.value").as("value"))
        .orderBy("user_id")
    }),

    // Semi-structured extraction: pull a typed field out of the JSON
    // props column and aggregate it — the log-ingest shape. A single
    // key uses get_json_object (codegen'd path); a production pipeline
    // extracting many keys would from_json(schema) once and expand, so
    // the document parses once per row either way. sum stays BIGINT
    // end-to-end (exact, associative).
    "q62_json_extract" -> ((s, dir) => {
      T(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"))
        .orderBy("event_type")
    }),

    // Hive-style partitioned layout end-to-end through a real
    // sink+source: events written partitionBy(event_type), read back
    // with a partition-key filter — the scan lists ONE directory of
    // five (PartitionFilters, PlanSpec-asserted) instead of reading
    // everything and filtering. At 100 TB this is the first-line
    // pruning lever for every time/category-partitioned fact table.
    // Oracle = the same filtered aggregate over the original table
    // (layout is physical only).
    "q65_partitioned_write" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_part_q65_${ProcessHandle.current().pid()}")
      T(s, dir, "events").write.mode("overwrite")
        .partitionBy("event_type").parquet(base)
      s.read.parquet(base)
        .where(col("event_type") === "purchase")
        .groupBy(pmod(col("user_id"), lit(10L)).as("user_bucket"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("sum_value"))
        .orderBy("user_bucket")
    }),

    // Grouped list aggregation (LISTAGG/string_agg) done the way that
    // survives scale: row_number caps each group to its 5 smallest ids
    // BEFORE collect_list, so aggregation state is bounded at 5 longs
    // per group (a naive collect_list gathers the whole group — on a
    // 100 TB table that is an OOM, not an operator). Both windows share
    // the lang partition, so the query is one shuffle + a tiny agg.
    "q64_string_agg" -> ((s, dir) => {
      val byLang = Window.partitionBy(col("lang"))
      val w = byLang.orderBy(col("doc_id"))
      T(s, dir, "documents")
        .select(col("lang"), col("doc_id"))
        .withColumn("n_docs", count(lit(1)).over(byLang))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .groupBy(col("lang"), col("n_docs"))
        .agg(array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("first_ids"))
        .select(col("lang"), col("n_docs"), col("first_ids"))
        .orderBy("lang")
    }),

    // Curation-pipeline capstone: the composed shape a training-data
    // run actually executes — length/quality gate → language keep-list
    // → exact dedup (hash-keyed shuffle keeping the lowest id per
    // distinct text; the sf0.1 corpus has real duplicate texts) →
    // reproducible hash-mod sample (q54's device) → per-language token
    // accounting. Each stage is an operator proven alone elsewhere;
    // this row pins their composition. Filters sit before the dedup
    // shuffle, so the exchange carries only gated rows — at 100 TB the
    // gate typically drops most of the corpus before any shuffle.
    "q63_curation_pipeline" -> ((s, dir) => {
      val gated = T(s, dir, "documents")
        .where(col("lang").isin("en", "de", "fr"))
        .where(col("n_chars").between(60, 400))
      val keep = Dedup.exactKeepers(gated)
        .select(col("keep_id").as("doc_id"))
      gated.join(keep, Seq("doc_id"))
        .where(pmod(col("doc_id") * lit(2654435761L), lit(100L)) < 70)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))
        .orderBy("lang")
    }),

    // Connected components over the near-dup pair graph — duplicate
    // PAIRS are not duplicate CLUSTERS (A≈B, B≈C chains must collapse
    // to one group even when A≉C). Min-label propagation + pointer
    // jumping (Components.connectedComponents): O(log diameter) rounds
    // of constant-shuffle work over 16-byte (id,label) rows, labels
    // persisted per round so lineage stays O(1). The oracle computes
    // the same fixpoint as a recursive transitive-closure CTE over the
    // identical pair SQL (q17's), so chain-collapse itself is what is
    // hash-checked.
    "q66_dedup_components" -> ((s, dir) => {
      operators.Components
        .connectedComponents(jaccardPairGraph(s, dir), "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),

    // Range join without a nested loop: each event counts the events in
    // its strictly-preceding 5 minutes (burst detection / rate features).
    // A raw `b.ts ∈ [a.ts−5min, a.ts)` predicate plans as BNLJ — a
    // single-task O(n²) at scale; Joins.rangeJoin quantizes time into
    // 5-minute bins, explodes each interval onto the ≤2 bins it
    // overlaps, equi-joins on the bin (one ordinary shuffle, codegen'd,
    // AQE-splittable) and filters exact containment. Micros-precision
    // epochs keep both engines' comparisons integer-exact. The left
    // join back to events keeps the zero-match rows the inner
    // candidate join drops.
    "q67_range_join" -> ((s, dir) => {
      val fiveMinUs = 300000000L
      val ev = T(s, dir, "events")
      val intervals = ev.select(col("event_id").as("iv_id"),
        (unix_micros(col("ts")) - fiveMinUs).as("lo"),
        unix_micros(col("ts")).as("hi"))
      val points = ev.select(unix_micros(col("ts")).as("pt"))
      val counts = operators.Joins
        .rangeJoin(points, "pt", intervals, "lo", "hi", binWidth = fiveMinUs)
        .groupBy(col("iv_id")).agg(count(lit(1)).as("n"))
      ev.select(col("event_id"))
        .join(counts, col("event_id") === col("iv_id"), "left")
        .select(col("event_id"),
          coalesce(col("n"), lit(0L)).as("n_prior_5min"))
        .orderBy("event_id")
    }),

    // Batched exact KNN: 10 query vectors against the corpus in ONE
    // pass — broadcast the tiny query set, score with the codegen'd
    // VecSqDist kernel, then keep each query's 3 nearest via the
    // bounded TopK aggregator (k-capped state → map-side partial
    // top-k; the exchange carries ≤ partitions·k rows per query
    // instead of the whole scored cross product the window-rank form
    // ships and sorts). Deterministic (dist, id) ordering both engines.
    "q68_knn_batch" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val c = emb.where(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      c.crossJoin(broadcast(q))
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.VectorFunctions
            .sqdistCol(col("ce"), col("qe")).as("dist"))
        .groupBy(col("query_id"))
        .agg(operators.TopK.smallestK(3)(col("dist"), col("neighbor_id"))
          .as("nb"))
        .select(col("query_id"), posexplode(col("nb")))
        .select(col("query_id"), (col("pos") + 1).cast("long").as("nb_rank"),
          col("col.id").as("neighbor_id"), col("col.ord").as("dist"))
        .orderBy("query_id", "nb_rank")
    }),

    // Bounded-state streaming dedup (dropDuplicatesWithinWatermark):
    // state holds one watermark horizon of keys, not the stream's
    // lifetime — the deployment counterpart of q46's global
    // dropDuplicates. Under the gate's single-batch ingestion no state
    // is evicted mid-batch, so the kept set equals a global first-per-
    // key dedup and the batch oracle holds exactly; the horizon
    // semantics (within-horizon drop, post-eviction re-emit) are
    // proven under forced multi-batch ingestion in
    // EventWindowsMultiBatchSpec.
    "q69_stream_dedup_bounded" -> ((s, dir) => {
      EventWindows.dedupWithinWatermark(s, dir,
          keyCols = Seq("user_id"), delay = "2 hours")
        .groupBy(pmod(col("user_id"), lit(16L)).as("shard"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("shard")
    }),

    // Interval-overlap join (interval × interval): per-user daily
    // activity spans against per-type daily spans, overlap = purely
    // temporal (no equi key — the shape Spark plans as BNLJ).
    // Joins.intervalJoin bins both sides and keeps each pair only in
    // its canonical first shared bin, so the equi-join emits every
    // overlapping pair exactly once with no dedup re-shuffle.
    // Micros-exact epochs; half-open [min, max+1) spans.
    "q70_interval_join" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val u = ev.groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(unix_micros(min(col("ts"))).as("u_lo"),
          (unix_micros(max(col("ts"))) + 1).as("u_hi"))
      val t = ev.groupBy(col("event_type"), to_date(col("ts")).as("d2"))
        .agg(unix_micros(min(col("ts"))).as("t_lo"),
          (unix_micros(max(col("ts"))) + 1).as("t_hi"))
      operators.Joins.intervalJoin(u, "u_lo", "u_hi", t, "t_lo", "t_hi",
          binWidth = 21600000000L) // 6h bins ≈ the daily span scale
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_overlaps"))
        .orderBy("event_type")
    }),

    // Time-series gap-fill: per-user daily activity densified onto
    // each user's full span, the last-event-type gauge forward-filled
    // across the introduced gap days (deterministic per-day value:
    // event_type of the max-event_id event — event_id is unique).
    // Output: which carried state the pipeline would attribute gap
    // days to — n_ev stays null on gap rows, so it doubles as the gap
    // flag.
    "q71_gap_fill" -> ((s, dir) => {
      val daily = T(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_ev"),
          max_by(col("event_type"), col("event_id")).as("last_type"))
      operators.TimeSeries
        .gapFillDaily(daily, "user_id", "d", Seq("last_type"))
        .where(col("n_ev").isNull)
        .groupBy(col("last_type").as("carried_type"))
        .agg(count(lit(1)).as("n_gap_days"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("carried_type")
    }),

    // Scale-correct decile report over document lengths: exact
    // interpolated decile boundaries from a distributed partial/final
    // percentile aggregate, assignment via a broadcast-literal CASE
    // chain — two scans, zero sorts, where the textbook
    // `ntile(10) OVER ()` funnels every row through ONE window task.
    // 2-dp rounded avg as the cross-engine determinism device.
    "q72_quantile_bucket" -> ((s, dir) => {
      operators.Quantiles
        .quantileBucket(T(s, dir, "documents"), "n_chars", 10)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 2).as("avg_chars"))
        .orderBy("bucket")
    }),

    // Z-ordered layout roundtrip: lineitem rewritten along the Morton
    // curve of (l_partkey, l_suppkey), then a 2-D box predicate (~2%
    // of rows) aggregates from the z-ordered files. The curve changes
    // the LAYOUT only — the oracle proves layout-invariance; the scan
    // win (row groups skipped via parquet min/max stats on BOTH
    // dimensions at once, which neither partitionBy nor a single-col
    // sort can give) is measured in ZOrderSpec.
    "q73_zorder_scan" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_zorder_q73_${ProcessHandle.current().pid()}")
      operators.ZOrder.writeZOrdered(T(s, dir, "lineitem"),
        Seq("l_partkey", "l_suppkey"), base, numFiles = 32)
      s.read.parquet(base)
        .where(col("l_partkey") <= 200 && col("l_suppkey") <= 20)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_suppkey")
    }),

    // SCD2 build: the per-user event-type change log collapsed into
    // validity intervals (one row per run of equal values; null
    // valid_to = still current) — the temporal-table construction
    // behind every as-of enrichment. (ts, event_id) ordering makes
    // run boundaries total on both engines; micros-exact durations.
    "q74_scd2" -> ((s, dir) => {
      operators.TimeSeries.changeIntervals(T(s, dir, "events"),
          "user_id", "ts", "event_type", tieCols = Seq("event_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"),
          count(col("valid_to")).as("n_closed"),
          sum(unix_micros(col("valid_to")) - unix_micros(col("valid_from")))
            .as("dur_us"))
        .orderBy("event_type")
    }),

    // Ordered conversion funnel view → click → purchase: each step
    // strictly after the user's earliest valid previous step. A chain
    // of filtered min-aggregates linked by user equi-joins — one
    // timestamp of state per key per stage, no per-user event lists,
    // no window sort.
    "q75_funnel" -> ((s, dir) => {
      operators.Funnel.funnelCounts(T(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
    }),

    // Wide→long reshape (unpivot/melt): per-flag decimal-exact sums
    // melted to (key, metric, value) — one Expand over the aggregate,
    // not a scan or union per metric.
    "q76_unpivot" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_price"),
          dsum(col("l_discount"), 2).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    }),

    // Column-quality profile: null counts + exact distinct counts for
    // four columns in ONE aggregation pass (value_hi is a derived
    // gated column so null accounting is exercised — the raw tables
    // are null-free).
    "q77_profile" -> ((s, dir) => {
      val ev = T(s, dir, "events")
        .withColumn("value_hi", when(col("value") >= 2.0, col("value")))
      operators.ColumnProfile
        .profile(ev, Seq("user_id", "event_type", "value_hi", "props"))
        .orderBy("col_name")
    }),

    // Schema-evolution read: generation 1 predates the `value` column;
    // mergeSchema unions the generations with nulls where the old
    // files lack it — the long-lived-pipeline read path (a fixed
    // schema would either fail or silently drop the new column).
    "q78_evolution" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_evo_q78_${ProcessHandle.current().pid()}")
      val ev = T(s, dir, "events")
      ev.where(col("event_id") % 2 === 0)
        .select("event_id", "user_id", "event_type")
        .write.mode("overwrite").parquet(s"$base/gen1")
      ev.where(col("event_id") % 2 === 1)
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$base/gen2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/gen1", s"$base/gen2")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_with_value"),
          dsum(coalesce(col("value"), lit(0.0)), 4).as("sum_value"))
        .orderBy("event_type")
    }),

    // PII redaction: deterministic PII-shaped spans (email + phone
    // derived from doc_id — the raw corpus is PII-free) injected, then
    // scrubbed by the codegen'd regexp_replace chain. The oracle
    // replays the identical injection and redaction, so the row hash
    // proves the scrub byte-for-byte.
    "q79_redact_pii" -> ((s, dir) => {
      val injected = concat(
        lit("contact user"), col("doc_id").cast("string"),
        lit("@mail.example or call 555-01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"),
        lit(" "), col("text"))
      T(s, dir, "documents")
        .select(col("doc_id"), injected.as("t"))
        .select(col("doc_id"),
          operators.TextAnalysis.redactPii(col("t")).as("redacted"),
          operators.TextAnalysis.piiCount(col("t")).as("n_pii"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition quality gate: per-doc token diversity +
    // most-frequent-bigram stats, computed entirely map-side in ONE
    // compiled kernel pass per document (not an explode + groupBy
    // shuffle of every bigram occurrence, and not an interpreted
    // Catalyst HOF fold — that form measured 10.4 s at sf0.1).
    "q80_repetition" -> ((s, dir) => {
      operators.Curation
        .repetitionStats(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Train/test decontamination: train docs sharing >= 3 distinct
    // word 5-grams with the held-out slice (doc_id % 50 = 0). Grams
    // join as broadcast 8-byte hashes; at this vocabulary a shared
    // 5-gram is essentially proof of near-duplication, and the >= 3
    // floor drops single-gram coincidences.
    "q81_decontaminate" -> ((s, dir) => {
      operators.Curation.contamination(
        T(s, dir, "documents"), "doc_id", "text",
        isTest = col("doc_id") % 50 === 0, n = 5, minShared = 3)
        .orderBy("doc_id")
    }),

    // Context-window chunking: 64-token windows at stride 48 (16-token
    // overlap) — the sequence-prep step between curation and training.
    // Zero shuffle: sequence/posexplode/slice are all narrow, so the
    // fan-out streams straight from scan to sink.
    "q82_token_chunks" -> ((s, dir) => {
      operators.Curation.tokenChunks(
        T(s, dir, "documents"), "doc_id", "text",
        chunkSize = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")
    }),

    // Greedy first-fit packing of documents into 256-token context
    // windows within 8 id-buckets. The shuffle carries only
    // (bucket, id, n_tokens) — two longs per doc, never the text; the
    // oracle replays the same greedy fold as a per-bucket recursive
    // CTE, proving the sequential pack arithmetic.
    "q83_pack_sequences" -> ((s, dir) => {
      operators.Curation.packSequences(
        T(s, dir, "documents"), "doc_id", "text",
        capacity = 256, nBuckets = 8)
        .orderBy("bucket", "doc_id")
    }),

    // JSONL interchange roundtrip: corpus → JSONL files → explicit-
    // schema read (no inference pass over 100 TB) → row-level compare
    // against the original table via the oracle — the hash proves the
    // text survives JSON encode/decode byte-for-byte.
    "q84_jsonl_roundtrip" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_jsonl_q84_${ProcessHandle.current().pid()}")
      T(s, dir, "documents").write.mode("overwrite").json(base)
      s.read.schema("doc_id BIGINT, text STRING, lang STRING, " +
          "source STRING, n_chars BIGINT")
        .json(base)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // CDC upsert (MERGE semantics): a deterministic change batch —
    // price updates for every 1000th order plus brand-new 'N'-status
    // orders — merged into the snapshot, then re-aggregated. The merge
    // is union-with-priority + one min_by hash aggregation (a full
    // outer join could broadcast neither side); the oracle replays
    // MERGE relationally (source ∪ unmatched target).
    "q85_merge_upsert" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
      val changed = o.where(col("o_orderkey") % 1000 === 0)
      // insert keys live in the negative key space: collision-free
      // with any real (positive) orderkey at ANY scale factor — an
      // additive offset would collide once the table outgrows it,
      // handing upsert duplicate source keys (undefined winner)
      val changes = changed
        .withColumn("o_totalprice", col("o_totalprice") + 1000.5)
        .unionByName(changed.select(
          (-col("o_orderkey") - 1L).as("o_orderkey"),
          col("o_custkey"), lit("N").as("o_orderstatus"),
          lit(1.0).as("o_totalprice")))
      operators.Upsert.upsert(o, changes, Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // Unicode normalization: a deterministic dirty suffix (combining
    // acute + tab + BEL) appended to every doc — the raw corpus is
    // clean ASCII — then control-strip + whitespace-collapse + NFC.
    // The oracle replays it with DuckDB's nfc_normalize, so the row
    // hash proves composed-codepoint byte equality.
    "q86_normalize" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          operators.TextAnalysis.normalizeText(
            concat(col("text"), lit(" cafe\u0301\t\u0007end")))
            .as("norm_text"))
        .orderBy("doc_id")
    }),

    // Incremental ingest dedup: the standing corpus (99% of docs)
    // banded ONCE into a persisted MinHash index; the ingest batch
    // (doc_id % 100 = 45 -- chosen to cross real planted near-dup
    // pairs, so the row set is non-vacuous) probes it and is
    // exact-Jaccard-verified against only the candidate corpus docs.
    // Oracle = the exact delta x corpus pair set; banding recall at
    // this corpus's similarity levels is 1 (the q33 argument).
    "q87_minhash_probe" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val corpus = docs.where(col("doc_id") % 100 =!= 45)
      val delta = docs.where(col("doc_id") % 100 === 45)
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_mhidx_q87_${ProcessHandle.current().pid()}")
      operators.Dedup.writeMinhashIndex(corpus, base, n = 8)
      operators.Dedup
        .probeMinhashIndex(s, base, corpus, delta, n = 8, threshold = 0.35)
        .orderBy("id_new", "id_old")
    }),

    // Corpus heavy hitters (boilerplate/stopword profile): per-
    // partition Misra-Gries candidate pass at FIXED memory, then a
    // broadcast-pruned exact recount — result exact at >= 0.1%
    // corpus frequency with no token-dictionary shuffle.
    "q88_heavy_hitters" -> ((s, dir) => {
      val toks = T(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
      operators.Frequency.heavyHitters(toks, "tok", minFrac = 0.001)
    }),

    // Reproducible training-data shuffle: total order by seeded md5
    // + shard from the leading hash bits. Plans as a range-
    // partitioned SORT (parallel at any scale), not a single-task
    // window; re-runs bit-identically under any input partitioning.
    "q89_seeded_shuffle" -> ((s, dir) => {
      val skey = md5(concat(lit("42-"), col("doc_id").cast("string")))
      T(s, dir, "documents")
        .select(col("doc_id"), skey.as("skey"),
          (conv(substring(skey, 1, 8), 16, 10).cast("long") % 8)
            .as("shard"))
        .orderBy("skey")
    }),

    // Per-language quota sampling (<= 20 docs per lang in seeded-
    // hash order): the bounded top-k-per-key aggregator holds k rows
    // of state per (map partition, lang) BEFORE the shuffle, so the
    // exchange carries <= partitions*k rows — no window sort of the
    // corpus. ord < 2^32 so its double round-trips exactly to long.
    "q90_quota_sample" -> ((s, dir) => {
      val ord = conv(substring(
          md5(concat(lit("7-"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long").cast("double")
      T(s, dir, "documents")
        .select(col("lang"), col("doc_id"), ord.as("ord"))
        .groupBy("lang")
        .agg(operators.TopK.smallestK(20)(col("ord"), col("doc_id"))
          .as("kept"))
        .select(col("lang"), explode(col("kept")).as("e"))
        .select(col("lang"), col("e.id").as("doc_id"),
          col("e.ord").cast("long").as("ord"))
        .orderBy("lang", "ord", "doc_id")
    }),

    // Record-linkage fuzzy join: all customer-name pairs within edit
    // distance 1 via deletion-neighborhood (FastSS) blocking — an
    // equi-join on 8-byte variant hashes + exact levenshtein verify,
    // where the naive form is an n^2 BNLJ cross join.
    "q91_fuzzy_join" -> ((s, dir) => {
      operators.Joins.editDistanceSelfJoin(
          T(s, dir, "customer"), "c_custkey", "c_name", maxDist = 1)
        .orderBy("id_a", "id_b")
    }),

    // Lexical retrieval: BM25 top-20 for a 3-term keyword query
    // ('dup' is the rare discriminator). Postings filtered to the
    // query terms at the scan; df broadcast; top-k as a heap.
    "q92_bm25_topk" -> ((s, dir) => {
      operators.Retrieval.bm25TopK(T(s, dir, "documents"),
        "doc_id", "text", Seq("dup", "spark", "merge"))
    }),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 sparse
    // list (q92's query) with the dense brute-cosine list (q16's
    // query vector). The fusion runs on two already-bounded top-50
    // lists — O(N) whatever the corpus size.
    "q93_hybrid_rrf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      val sparse = operators.Retrieval.bm25TopK(T(s, dir, "documents"),
        "doc_id", "text", Seq("dup", "spark", "merge"), topK = 50)
      val dense = operators.Similarity.bruteForceTopK(emb, q, 50)
        .withColumnRenamed("vec_id", "doc_id")
      operators.Retrieval.rrfFuse(sparse, dense, "doc_id")
    }),

    // Corpus phrase mining: top-20 bigram collocations by PMI with a
    // count->=5 floor applied before the vocabulary joins.
    "q94_collocations" -> ((s, dir) =>
      operators.TextAnalysis.collocations(T(s, dir, "documents"))),

    // Product quantization: 4x16-dim codebooks (k=16, 4 Lloyd iters,
    // the q30/q40 seeded-init device), encoded corpus persisted ONCE
    // (pqIndexPath), then ADC top-10 for q16's query over the code
    // parquet only — the compressed-domain ANN probe path. The raw
    // vectors are not in the scanned files at all.
    "q95_pq_adc" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      operators.Quantization.readPqIndex(s, pqIndexPath(s, dir))
        .adcProbe(q, 10)
    }),

    // IVF-PQ probe over the same persisted index: the coarse quantizer
    // bounds the read to the 3 nearest cells' PARTITIONS of the
    // cell-partitioned code table (PartitionFilters at the scan), ADC
    // ranks the survivors — the composed compressed-domain ANN stack.
    "q96_ivfpq" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      operators.Quantization.readPqIndex(s, pqIndexPath(s, dir))
        .ivfPqProbe(q, 10, nprobe = 3)
    }),

    // Curation: the 10 farthest members of each cluster (q40's fit) —
    // embedding-space outlier candidates, bounded-TopK per cluster.
    "q97_cluster_outliers" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val init = emb.orderBy("vec_id").limit(8)
        .select(col("embedding").cast("array<float>"))
        .collect().map(_.getSeq[Float](0).toArray)
      val model = KMeans.fit(
        emb.select(col("embedding").as("features")),
        KMeansParams(k = 8, threshold = 1e-4, maxLoop = 7,
          initCentroids = Some(init)))
      Similarity.clusterOutliers(emb, model.centroids, 10)
    }),

    // Damped PageRank (10 iterations) over the undirected
    // customer<->supplier purchase graph (supplier node ids offset by
    // 1e7); top-20 by rank.
    "q98_pagerank" -> ((s, dir) =>
      // undirected artifact is sink-free by construction (numDangling
      // = 0 in its meta, so the cheap path's check costs nothing);
      // loop body auto-selected by node count
      graphTable(s, dir, "undirected").pageRank(iters = 10).limit(20)),

    // Retention cohorts: users bucketed by first-seen day, counted per
    // later active day — every exchange co-keyed on the user.
    "q99_retention" -> ((s, dir) =>
      operators.Funnel.retentionCohorts(T(s, dir, "events"),
        "user_id", "ts")),

    // Weighted sample without replacement (A-ES), weight = doc length:
    // seeded md5 -> u, key = ln(u)/w, top-50 keys.
    "q100_weighted_sample" -> ((s, dir) =>
      operators.Sampling.weightedSample(T(s, dir, "documents"),
        "doc_id", greatest(col("n_chars"), lit(1)), k = 50,
        seed = "1337")),

    // Model-based quality filter: every document scored by its mean
    // Laplace-smoothed bigram log-prob under the corpus's own counts,
    // most surprising first.
    "q101_lm_score" -> ((s, dir) =>
      operators.Curation.lmScore(T(s, dir, "documents"),
        "doc_id", "text")),

    // Directed PageRank with dangling-mass redistribution: the
    // customer -> supplier purchase graph fed ONE direction, so every
    // supplier is a sink — the q98 feed would silently leak ~half the
    // mass per round; the correction recycles the 12-dp DECIMAL-exact
    // sink mass uniformly each round (mass stays ~1, GraphSpec).
    "q102_pagerank_directed" -> ((s, dir) =>
      graphTable(s, dir, "directed")
        .pageRank(iters = 10, danglingCorrection = true).limit(20)),

    // Exact duplicated-span diagnostics: per doc, distinct token
    // 8-grams, how many appear in >= 2 docs, and the duplicated
    // fraction — map-side per-doc gram dedup, 8-byte hashes through
    // the shuffle (counts equal string-gram counts absent collisions,
    // the q17 argument).
    "q103_dup_grams" -> ((s, dir) =>
      operators.Curation.duplicatedGramStats(
        T(s, dir, "documents"), "doc_id", "text", w = 8)),

    // Temperature-scaled source mixing (alpha = 0.5): per-source
    // quotas proportional to sqrt(n_s), filled in seeded-hash order
    // via the bounded TopK aggregator — the training-mix flattening
    // device.
    "q104_temperature_mix" -> ((s, dir) =>
      operators.Sampling.temperatureMix(
        T(s, dir, "documents"), "doc_id", "source", k = 100,
        seed = "13")),

    // Batch sessionization (30-min gap) — the offline counterpart of
    // q21's streaming flatMapGroupsWithState sessions, for backfills;
    // one hash exchange on user_id (window + running counter + agg all
    // share it). Epoch-us output per the timestamp-compare convention.
    "q105_batch_sessionize" -> ((s, dir) =>
      operators.TimeSeries.sessionize(T(s, dir, "events"),
        "user_id", "ts", "event_id", gapSeconds = 1800)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events"), col("duration_sec"))
        .orderBy("user_id", "start_us")),

    // Johnson–Lindenstrauss Rademacher projection 64→8: pure map of
    // codegen'd VecDot folds against a seeded ±1 literal matrix.
    // Flattened to one column per coordinate — the compare is
    // scalar-positional and array cells would break it.
    "q106_random_projection" -> ((s, dir) =>
      operators.Similarity.randomProjection(
        T(s, dir, "embeddings"), "vec_id", "embedding",
        outDim = 8, dim = 64, seed = 2027L)
        .select(col("vec_id") +:
          (0 until 8).map(i =>
            element_at(col("proj"), i + 1).as(s"p$i")): _*)),

    // q102's graph through the DISTRIBUTED rank-table loop: ranks stay
    // a hash-partitioned, per-round-checkpointed DataFrame (the 100-TB
    // body — no driver collect anywhere in the loop, GraphSpec-proven);
    // bit-identical to q102 by construction, and this line proves it
    // against the same recursive-CTE oracle.
    "q107_pagerank_dist" -> ((s, dir) =>
      graphTable(s, dir, "directed")
        .pageRank(iters = 10, danglingCorrection = true,
          distributedRanks = Some(true)).limit(20)),

    // q105's sessions via Spark's native session_window (plain
    // aggregate, no analytic windows; Spark's inclusive session merge
    // matches the inclusive gap boundary exactly) — same oracle as
    // q105 proves the twins equal.
    "q108_session_window" -> ((s, dir) =>
      operators.TimeSeries.sessionizeNative(T(s, dir, "events"),
        "user_id", "ts", gapSeconds = 1800)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n_events"), col("duration_sec"))
        .orderBy("user_id", "start_us")),

    // REAL ImageIO decode under oracle check: deterministic 8×1 PNGs
    // (pixel x = gray (id·31+x·97) mod 251), parquet'd once per
    // (JVM, sf) by mediaFixturePath and DECODED here by the
    // production imageDecodeFeatures path; one pixel per strip makes
    // the strip-mean luminance exactly v/255, so the oracle replays
    // the decode bit-for-bit without parsing PNG in SQL.
    "q109_image_decode" -> ((s, dir) =>
      operators.Multimodal.extractFeatures(
          s.read.parquet(s"${mediaFixturePath(s, dir)}/png"), dim = 8,
          imageDecode = true)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("feat_idx", "feat_val")))
        .orderBy("media_id", "feat_idx")),

    // REAL javax.sound WAV decode under oracle check: 64-sample PCM-16
    // fixtures (sample j = (id·7919+j·104729) mod 65536 − 32768) from
    // the same per-(JVM, sf) fixture parquet; per-strip RMS with
    // exact Long sum-of-squares — only the final correctly-rounded
    // div+sqrt touches floating point, so the feature replays
    // bit-for-bit in SQL.
    "q110_audio_rms" -> ((s, dir) =>
      operators.Multimodal.extractFeatures(
          s.read.parquet(s"${mediaFixturePath(s, dir)}/wav"), dim = 8,
          audioDecode = true)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("strip", "rms")))
        .orderBy("media_id", "strip")),

    // Epsilon-stop PageRank under oracle check: the loop halts at the
    // first round whose max |Δrank| <= eps (inclusive — the A7
    // fixpoint discipline), cap 12. The oracle replays all 12 rounds,
    // derives the stop round FROM THE DATA (min it with delta <= eps,
    // else the cap) and selects that round's ranks — so engine and
    // oracle agree at any sf by construction. 10%-sampled edge feed
    // (o_orderkey % 10 = 0) keeps the bench line light.
    "q111_pagerank_eps" -> ((s, dir) =>
      graphTable(s, dir, "sampled10")
        .pageRank(iters = 12, danglingCorrection = true,
          epsilon = Some(2e-3)).limit(20)),

    // q21's sessions via Spark's NATIVE streaming session_window
    // (declarative: no custom state function; watermark bounds state)
    // — fourth member of the sessionization family, same oracle.
    "q112_stream_session_native" -> ((s, dir) =>
      EventWindows.sessionizeNative(s, dir, gapMinutes = 30)
        .orderBy("user_id", "start_us")),

    // Personalized PageRank: reset + dangling mass ride the SEED
    // distribution (customers 1-50), so rank measures proximity to
    // the seed set — built on the distributed rank-table body (no
    // driver collect, GraphSpec-asserted); 10 iterations replayed in
    // the recursive-CTE oracle.
    "q113_ppr" -> ((s, dir) => {
      val seeds = T(s, dir, "orders")
        .select(col("o_custkey").as("node"))
        .where(col("node") <= 50).distinct()
      graphTable(s, dir, "directed")
        .personalizedPageRank(seeds, iters = 10).limit(20)
    }),

    // HITS hubs/authorities (Jacobi variant) on the directed purchase
    // graph: customers are pure sources (hubs), suppliers pure sinks
    // (authorities); 12-dp DECIMAL gathers + exact L1 totals + 9-dp
    // scores make 5 rounds bit-replayable; top-20 authorities.
    "q114_hits" -> ((s, dir) =>
      graphTable(s, dir, "directed").hits(iters = 5).limit(20)),

    // HITS with the A7 epsilon discipline: stop at the first round
    // whose max over nodes of max(|Δauth|, |Δhub|) <= eps (inclusive),
    // cap 8. The oracle replays all 8 capped rounds and derives the
    // stop round FROM THE DATA (the q111 device), so engine and oracle
    // agree at any sf by construction.
    "q115_hits_eps" -> ((s, dir) =>
      graphTable(s, dir, "directed")
        .hits(iters = 8, epsilon = Some(2e-4)).limit(20)),

    // Edge-weighted PageRank: contribution rank·w/Σw with w = the
    // pair's line-item count (purchase frequency) — real relevance
    // graphs are weighted; out-weight totals are 12-dp DECIMAL sums
    // (exact, partition-invariant), replayed with a weight column in
    // the same recursive-CTE oracle shape.
    "q116_pagerank_weighted" -> ((s, dir) =>
      graphTable(s, dir, "directed_w")
        .pageRank(iters = 10, danglingCorrection = true).limit(20)),

    // Label-propagation community detection (Jacobi, deterministic:
    // most frequent neighbor label, min on ties) on the undirected
    // purchase graph — the dedup-clustering sibling of q66's connected
    // components; 5 fixed rounds replayed row-wise in the oracle.
    // Computes the 5 rounds IN-LINE from the prebuilt graph table, so
    // the propagation cost stays inside the timed window (the r11
    // artifact-read form erased it from the min-of-passes bench —
    // only q164, which SCORES a fitted clustering, reads the persisted
    // label artifact). GraphSpec pins artifact ≡ inline bit-for-bit.
    "q117_label_prop" -> ((s, dir) =>
      graphTable(s, dir, "undirected").labelPropagation(iters = 5)
        .orderBy("node")),

    // GLOBAL sequence packing — q83's deterministic scale twin: FFD
    // within harmonic length classes (class k = cap/max(n,1) holds
    // exactly k docs per pack), globally ranked via range partitioning
    // + offset merge, so pack quality no longer depends on how the
    // corpus happened to be hash-bucketed. Every pack except the last
    // of each class is > half full.
    "q118_pack_global" -> ((s, dir) =>
      operators.Curation.packSequencesGlobal(
        T(s, dir, "documents"), "doc_id", "text", capacity = 256)
        .orderBy("doc_id")),

    // Per-node triangle counts on the part↔part co-purchase graph via
    // degree orientation (oriented out-degree O(√E) bounds the wedge
    // set at O(E^1.5) under any skew); exact longs, no rounding device.
    // Top-20 most-embedded parts.
    "q119_triangles" -> ((s, dir) =>
      graphTable(s, dir, "copurchase").triangleCounts()
        .orderBy(desc("tri"), col("node")).limit(20)),

    // Local clustering coefficient cc = 2·tri/(deg·(deg−1)) for every
    // node — one double division of exact longs on top of the q119
    // triangle pass, bit-identical in any engine.
    "q120_clustering_coeff" -> ((s, dir) =>
      graphTable(s, dir, "copurchase").clusteringCoefficient()
        .orderBy("node")),

    // k-core (k=80) by synchronous Jacobi peeling: each round drops
    // ALL nodes with degree < k simultaneously — replayable round by
    // round in the recursive-CTE oracle; the engine's early fixpoint
    // stop equals the oracle's cap-round state because the fixpoint is
    // stationary. Returns the surviving nodes with their in-core
    // degrees.
    "q121_kcore" -> ((s, dir) =>
      graphTable(s, dir, "copurchase").kCore(k = 80, maxRounds = 10)),

    // Cross-document span-level exact dedup (RefinedWeb/C4-style
    // "remove duplicated spans"): 8-token spans, corpus-wide first
    // occurrence by (doc, idx) wins, docs reassembled from surviving
    // spans; 8-byte span fingerprints through the shuffle (the q09
    // device).
    "q122_span_dedup" -> ((s, dir) =>
      operators.Curation.spanDedup(
        T(s, dir, "documents"), "doc_id", "text", spanTokens = 8)),

    // Personalized PageRank over the WEIGHTED purchase graph —
    // proximity to the seed customers with purchase frequency as edge
    // strength: contribution rank·w/Σw (12-dp DECIMAL out-weight
    // totals), reset + sink mass riding the seed distribution; the
    // q113 oracle shape with the q116 weighted-edge base.
    "q123_ppr_weighted" -> ((s, dir) => {
      val seeds = T(s, dir, "orders")
        .select(col("o_custkey").as("node"))
        .where(col("node") <= 50).distinct()
      graphTable(s, dir, "directed_w")
        .personalizedPageRank(seeds, iters = 10).limit(20)
    }),

    // Per-user EWMA over the event stream (α=1/4 — exact in binary):
    // ewmaₜ = round₉(α·xₜ + (1−α)·ewmaₜ₋₁) in (ts, event_id) order —
    // the 9-dp step round makes the recurrence replayable row-by-row
    // in the recursive-CTE oracle; one hash exchange on the user, then
    // a compiled linear scan per key (the recurrence is inherently
    // sequential per key — one-key-per-task is maximal parallelism).
    "q124_ewma" -> ((s, dir) =>
      operators.TimeSeries.ewma(T(s, dir, "events"),
        "user_id", "ts", "event_id", "value", alpha = 0.25)),

    // Streaming twin of q124: the same exact-decimal recurrence kept
    // alive in GroupState across micro-batches (EwmaStreamSpec forces
    // a 3-batch split and proves cross-batch carry); single-batch
    // ingestion makes it ≡ the batch operator here, so the twins
    // answer to the same oracle (the q105/q108 device).
    "q125_stream_ewma" -> ((s, dir) =>
      EventWindows.streamEwma(s, dir, alpha = 0.25)),

    // ORC sink + source roundtrip (the second columnar format the
    // warehouse tier speaks): lineitem written as ORC, read back with
    // a pushed-down filter and pruned columns (PlanSpec asserts both
    // reach the ORC scan), aggregated — the oracle computes the same
    // aggregate over the original parquet, so the row pins ORC
    // write/read fidelity end-to-end.
    "q126_orc_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_orc_q126_${ProcessHandle.current().pid()}")
      T(s, dir, "lineitem").write.mode("overwrite").orc(s"$base/orc")
      s.read.orc(s"$base/orc")
        .where(col("l_quantity") > 30.0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // DOULION sampled triangle estimate — the 100-TB form of q119:
    // each undirected co-purchase edge kept with p = 0.2 by the
    // seeded-md5 coin (bit-reproducible under any partitioning or
    // engine), exact triangle count on the sample, scaled by 1/p³.
    // The oracle replays the identical sample predicate and the
    // id-ordered count.
    "q127_triangle_estimate" -> ((s, dir) =>
      graphTable(s, dir, "copurchase")
        .triangleCountEstimate(keepPct = 20, seed = 13L)),

    // BFS hop levels from the seed customers over the undirected
    // purchase graph — the "within-k-hops-of-known-good" curation
    // primitive; exact-int levels with a unique fixpoint, replayed by
    // a recursive-UNION oracle (DISTINCT recursion keeps the oracle
    // polynomial, min(lvl) = first discovery).
    "q128_bfs_levels" -> ((s, dir) => {
      val seeds = T(s, dir, "orders")
        .select(col("o_custkey").as("node"))
        .where(col("node") <= 50).distinct()
      graphTable(s, dir, "undirected").bfsLevels(seeds, maxDepth = 4)
    }),

    // Neighborhood Jaccard of every co-purchase edge's endpoints —
    // tie strength for "related products": common neighbors = the
    // triangles through the edge, so the computation rides the q119
    // degree-oriented machinery and its O(E^1.5) bound; top-20
    // strongest ties.
    "q129_edge_jaccard" -> ((s, dir) =>
      graphTable(s, dir, "copurchase").edgeJaccard().limit(20)),

    // Graph-artifact APPEND lifecycle under oracle check: the
    // artifact is built from 90% of the order feed, the remaining 10%
    // is folded in via Graph.appendToGraphTable (one merge pass +
    // staged swap — never the raw-feed extraction again), and
    // PageRank over the appended artifact must be bit-identical to
    // the q102 oracle over the FULL feed — append ≡ rebuild, proven
    // end-to-end.
    "q130_graph_append" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_gappend_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val gbase = graphTablePath(s, dir)
      // both edge feeds read the shared persisted artifact (already
      // distinct): the timed line is the LIFECYCLE — base write,
      // one merge-append pass, 10-iteration PageRank — exactly what a
      // deployment pays per delta; the l⋈o raw-feed extraction was
      // paid once at artifact-build time (untimed warmup), like every
      // other graph-tier line
      val e90 = operators.Graph.readGraphTable(s, s"$gbase/sampled90")
        .edges.select(col("src"), col("dst"))
      operators.Graph.writeGraphTable(e90, "src", "dst", base,
        assumeDistinct = true)
      val e10 = operators.Graph.readGraphTable(s, s"$gbase/sampled10")
        .edges.select(col("src"), col("dst"))
      operators.Graph.appendToGraphTable(s, base, e10, "src", "dst")
      operators.Graph.readGraphTable(s, base)
        .pageRank(iters = 10, danglingCorrection = true).limit(20)
    }),

    // Per-key rolling window features (lag-1, rolling count, rolling
    // mean over 5 rows): ONE window spec serves all three, the
    // windowed sum runs in DECIMAL (frame-order-exact), the mean is
    // one double division — the feature-engineering staple before any
    // sequence model.
    "q131_rolling_features" -> ((s, dir) =>
      operators.Features.rollingFeatures(T(s, dir, "events"),
        "user_id", "ts", "event_id", "value", n = 5)),

    // Leave-one-out target encoding of event_type against value —
    // the leakage-free high-cardinality-categorical encoding:
    // (Σ_cat − xᵢ)/(n_cat − 1), category sums exact DECIMAL,
    // categories broadcast back so the row side never shuffles.
    "q132_target_encode" -> ((s, dir) =>
      operators.Features.targetEncodeLoo(T(s, dir, "events"),
        "event_type", "event_id", "value")),

    // GROUP-aware train/valid/test split: the seeded-md5 coin flips
    // on the USER, so all of a user's rows land in one split — the
    // leakage-hygiene property q54's per-row split cannot give;
    // emitted as the per-split (rows, groups) summary.
    "q133_group_split" -> ((s, dir) =>
      operators.Features.groupSplit(T(s, dir, "events"),
        "user_id", seed = 31L, trainPct = 80, validPct = 10)
        .groupBy("split")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_groups"))
        .orderBy("split")),

    // Weighted single-source-set shortest paths (Bellman–Ford frontier
    // relaxation, ≤4 edges per path) from the seed customers over the
    // SYMMETRIC weighted purchase graph — the cost-proximity sibling
    // of q128's hop levels. Purchase-count weights are integers, so
    // every path cost is an exact double sum and min() needs no
    // rounding device; the oracle replays 4 rounds with a zero-weight
    // self-loop so each round is ONE min over in-edges.
    "q134_shortest_paths" -> ((s, dir) => {
      val seeds = T(s, dir, "orders")
        .select(col("o_custkey").as("node"))
        .where(col("node") <= 50).distinct()
      graphTable(s, dir, "undirected_w").shortestPaths(seeds, maxRounds = 4)
    }),

    // Per-category z-score outliers with the EXACT-variance device
    // (stronger than q48's 6-dp rounding): Σx and Σx² go through
    // DECIMAL (2-dp inputs → 4-dp squares, both lossless), so mean,
    // variance, stddev, and z are fixed-order double expressions of
    // exact quantities — bit-identical cross-engine with NO rounding
    // anywhere. Top-20 most anomalous events.
    "q135_zscore_outliers" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val st = T(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).cast("double")
            .as("s"),
          sum((col("value") * col("value")).cast(DecimalType(28, 8)))
            .cast("double").as("ssq"))
        .select(col("event_type"), col("n"),
          (col("s") / col("n")).as("m"),
          sqrt((col("ssq") - col("s") * col("s") / col("n")) /
            (col("n") - 1)).as("sd"))
      T(s, dir, "events")
        .join(broadcast(st), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          ((col("value") - col("m")) / col("sd")).as("z"))
        .orderBy(abs(col("z")).desc, col("event_id"))
        .limit(20)
    }),

    // REAL decode→RESIZE→re-encode→decode under oracle check: the 8×1
    // PNG fixtures are nearest-neighbor downscaled to 4 columns
    // (srcX = 2·strip — exact pixel picks through PNG's lossless
    // roundtrip), then featurized by the production decode path; the
    // oracle replays the picked pixels' recipe directly.
    "q136_image_resize" -> ((s, dir) =>
      operators.Multimodal.extractFeatures(
          operators.Multimodal.resizeImages(
            s.read.parquet(s"${mediaFixturePath(s, dir)}/png"), outW = 4),
          dim = 4, imageDecode = true)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("strip", "lum")))
        .orderBy("media_id", "strip")),

    // LEFT OUTER watermarked stream-stream join — q49's missing half:
    // unmatched clicks emit with nulls exactly once, after the
    // watermark passes their match window (state eviction doubles as
    // the no-match verdict — the "abandoned funnel" feed). Bounded
    // input closed by a TWO-SIDED sentinel-flush device (the
    // watermark is the min across both filtered inputs). Single-batch
    // real data ⇒ ≡ the batch LEFT JOIN.
    "q137_stream_outer_join" -> ((s, dir) =>
      EventWindows.streamClickPurchaseOuter(s, dir, windowMinutes = 30)
        .orderBy("user_id")),

    // Hashing-trick featurizer over (event_type, props.k): fixed
    // 16-bucket signed encoding with NO fitted dictionary — the
    // unbounded-vocabulary categorical encoding; both hashes are the
    // seeded-md5 device, so the vector is engine-replayable. Pure
    // map-side codegen, zero shuffle.
    "q138_feature_hash" -> ((s, dir) =>
      operators.Features.hashFeatures(
          T(s, dir, "events").withColumn("prop_k",
            get_json_object(col("props"), "$.k")),
          "event_id", Seq("event_type", "prop_k"), dim = 16, seed = 7L)
        .orderBy("event_id")),

    // Fit/transform scaler with a PERSISTED stats artifact (the
    // PQ/IVF/graph build-once precedent applied to feature prep): one
    // aggregate pass fits exact min/max + the q135 exact-variance
    // sums per column, written as a parquet model; apply bakes the
    // k-row artifact into literal map-side expressions — min-max and
    // z-score features with no join and no rounding device.
    "q139_fitted_scaler" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_scaler_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val li = T(s, dir, "lineitem")
      operators.Features.fitScaler(
        li, Seq("l_quantity", "l_extendedprice"), s"$base/scaler")
      // z is ROUNDED to 9 dp (the q48 device): at sf0.1 the
      // extendedprice² decimal sum's unscaled value (~6e23) exceeds
      // 2^53, where DuckDB's decimal→double cast and the JVM's
      // BigDecimal.doubleValue can differ by 1 ulp — observed as a
      // 1-ulp z divergence in the sf0.1 robustness run. min-max stays
      // unrounded (min/max are exact doubles at any scale).
      operators.Features.applyScaler(li, s"$base/scaler")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity_minmax"),
          round(col("l_quantity_z"), 9).as("l_quantity_z"),
          col("l_extendedprice_minmax"),
          round(col("l_extendedprice_z"), 9).as("l_extendedprice_z"))
        // (l_orderkey, l_linenumber) is NOT unique in this data (q143
        // measures 14k surplus rows) — sort by the value columns too,
        // so any remaining ties are bit-identical output rows and the
        // positional compare is order-proof
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity_minmax"), col("l_extendedprice_minmax"))
        .limit(100)
    }),

    // Bloom-gated incremental exact dedup: the corpus (docs < 450)
    // gated by a persisted Bloom artifact; the batch re-sends 30
    // known texts under new ids (the ingest-retry shape) plus the 50
    // genuinely new docs. Misses pass map-side without joining;
    // bloom hits get an exact fingerprint verify, so the result IS
    // the anti-join (the oracle) at sketch cost.
    "q140_bloom_gate" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_bloom_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val docs = T(s, dir, "documents")
      val corpus = docs.where(col("doc_id") < 450)
      val batch = docs.where(col("doc_id") >= 450)
        .select(col("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") < 30)
          .select((col("doc_id") + 1000L).as("doc_id"), col("text")))
      Dedup.writeBloomGate(corpus, s"$base/bloom", fpp = 0.01)
      Dedup.probeBloomGate(s, s"$base/bloom", corpus, batch)
        .orderBy("doc_id")
    }),

    // REAL decode→DECIMATE→re-encode→decode for audio (q136's device):
    // the 64-sample WAV fixtures downsampled 4× by pure index picks
    // (sample j' = source 4·j' — no filter arithmetic, lossless PCM-16
    // container roundtrip), then strip-RMS featurized by the
    // production decode path; the oracle replays the picked samples'
    // recipe directly.
    "q141_audio_decimate" -> ((s, dir) =>
      operators.Multimodal.extractFeatures(
          operators.Multimodal.decimateAudio(
            s.read.parquet(s"${mediaFixturePath(s, dir)}/wav"), factor = 4),
          dim = 4, audioDecode = true)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("strip", "rms")))
        .orderBy("media_id", "strip")),

    // SemDeDup-style cluster-then-dedup: coarse-assign embeddings to
    // the fixed hyperplane centroids (the q31 CASE chain), then drop
    // rows with a lower-id same-cluster neighbor above cosine 0.45 —
    // Σ cluster² candidate pairs instead of n², the semantic-dedup
    // scale shape (at corpus scale the coarse fit is the engine's own
    // KMeans, the q40 precedent).
    "q142_semdedup" -> ((s, dir) =>
      Dedup.semDedup(
        T(s, dir, "embeddings").where(col("vec_id") < 2000)
          .select(col("vec_id"), col("embedding")),
        hpCents, threshold = 0.45)),

    // Declarative expectation suite (the Great-Expectations-style
    // contract gate before promoting a data drop): seven rules —
    // null, range, set, regex, and exact uniqueness — all evaluated
    // as conditional counts in ONE aggregation pass over one scan.
    // Two rules fail by design (l_discount caps at 0.10 and orders
    // have multiple lines), so both report paths are exercised.
    "q143_expectations" -> ((s, dir) => {
      import operators.ColumnProfile._
      expectations(T(s, dir, "lineitem"), Seq(
        NotNull("l_shipdate"),
        InRange("l_quantity", 1.0, 50.0),
        InRange("l_discount", 0.0, 0.05),
        InSet("l_returnflag", Seq("A", "N", "R")),
        MatchesRe("l_linestatus", "^[OF]$"),
        Unique(Seq("l_orderkey")),
        Unique(Seq("l_orderkey", "l_linenumber"))))
    }),

    // Streaming CDC materialization — q61's latest-per-key as a
    // STREAM: three forced micro-batches (id-hash split, keys cross
    // batches out of time order) each folded into a persisted parquet
    // snapshot inside foreachBatch via read-merge-staged-swap; the
    // associative max(struct) merge makes the final snapshot equal
    // the batch answer exactly (and re-merges idempotent — the
    // exactly-once story under foreachBatch's at-least-once contract).
    "q144_stream_upsert" -> ((s, dir) =>
      EventWindows.streamUpsertMaterialize(s, dir).orderBy("user_id")),

    // MinHash index APPEND lifecycle (q87's build/probe split + the
    // q130 append discipline): index built from HALF the corpus, the
    // other half folded in by appendToMinhashIndex (cost ∝ batch, no
    // corpus re-banding), then the q87 probe must reproduce the
    // full-corpus oracle pair set exactly — append ≡ rebuild,
    // proven end-to-end.
    "q145_minhash_append" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val corpus = docs.where(col("doc_id") % 100 =!= 45)
      val delta = docs.where(col("doc_id") % 100 === 45)
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_mhidx_q145_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      operators.Dedup.writeMinhashIndex(
        corpus.where(col("doc_id") < 250), base, n = 8)
      operators.Dedup.appendToMinhashIndex(s, base,
        corpus.where(col("doc_id") >= 250), n = 8)
      operators.Dedup
        .probeMinhashIndex(s, base, corpus, delta, n = 8, threshold = 0.35)
        .orderBy("id_new", "id_old")
    }),

    // Cluster-bounded batch ANN JOIN — "3 nearest neighbors for EVERY
    // vector" at Σ cluster² cost (q142's bound applied to retrieval):
    // coarse-assign, self-join within clusters, bounded TopK per
    // query. Exact doubles + (dist, id) tiebreak; the oracle replays
    // assignment + window-rank.
    "q146_cluster_knn_join" -> ((s, dir) =>
      Similarity.clusterKnnJoin(
        T(s, dir, "embeddings").where(col("vec_id") < 2000)
          .select(col("vec_id"), col("embedding")),
        hpCents, k = 3)),

    // Percentile winsorization of the event values to the exact
    // interpolated [p01, p99] band (quantile_cont semantics, the q47
    // device): boundaries from one distributed percentile aggregate,
    // clip as codegen'd least/greatest literals — the outlier-robust
    // transform before any normalization.
    "q147_winsorize" -> ((s, dir) =>
      operators.Quantiles.winsorize(T(s, dir, "events"),
          "value", 0.01, 0.99, "value_w")
        .select(col("event_id"), col("value"), col("value_w"))
        .orderBy("event_id")),

    // Contiguous 0-based sample ids in seeded-shuffle order WITHOUT
    // the single-task global window: range partition + pinned
    // per-partition counts + broadcast offsets + per-partition
    // row_number — the "stable sample index" primitive. Oracle = the
    // global window form (tiny at verification scale, the straggler
    // at 100 TB).
    "q148_sequential_ids" -> ((s, dir) =>
      operators.Sampling.sequentialIds(
          T(s, dir, "documents").select(col("doc_id")),
          md5(concat(lit("17-"), col("doc_id").cast("string"))),
          "sample_id")
        .orderBy("doc_id")),

    // Snapshot DIFF → change feed (the reconciliation half of the CDC
    // loop, q85's apply being the other): before = the event table,
    // after = it with deletes (id % 17 = 0), updates (value + 1 where
    // id % 13 = 0) and inserts (re-keyed id % 11 rows). One
    // union-tag + hash aggregate, no full-outer join.
    "q149_snapshot_diff" -> ((s, dir) => {
      val ev = T(s, dir, "events").select(col("event_id"), col("value"))
      val after = ev.where(col("event_id") % 17 =!= 0)
        .select(col("event_id"),
          when(col("event_id") % 13 === 0, col("value") + 1.0)
            .otherwise(col("value")).as("value"))
        .unionByName(ev.where(col("event_id") % 11 === 0)
          .select((col("event_id") + 10000000L).as("event_id"),
            col("value")))
      operators.Upsert.snapshotDiff(ev, after, Seq("event_id"))
        .orderBy("event_id")
    }),

    // Feature-redundancy screen: all 6 pairwise Pearson correlations
    // of lineitem's numeric columns in ONE aggregation pass (6-dp
    // rounding, the q48 device for order-dependent co-moment
    // aggregates).
    "q150_corr_matrix" -> ((s, dir) =>
      operators.Features.correlationMatrix(T(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // Feature-relevance screen: mutual information (nats) between
    // event_type and the value QUARTILE (the engine's own
    // quantileBucket supplies y) — exact joint counts, per-cell terms
    // rounded to 12 dp and DECIMAL-summed so the scalar is
    // partition-order-exact and engine-replayable.
    "q151_mutual_info" -> ((s, dir) =>
      operators.Features.mutualInformation(
        operators.Quantiles.quantileBucket(
          T(s, dir, "events"), "value", 4, "yb"),
        "event_type", "yb")),

    // Per-segment drift screen: OLS slope of value over time (per
    // day) from EXACT decimal sums — x is centered on the global min
    // timestamp so x² stays inside DECIMAL(38); the slope is one
    // fixed double expression of the exact sums, rounded to 9 dp
    // (the q139 lesson applied up front).
    "q152_group_trend" -> ((s, dir) =>
      operators.Features.groupTrend(T(s, dir, "events"),
        "event_type", "ts", "value")),

    // Seeded negative sampling (contrastive-training negatives): 4
    // random non-self partners per document via a dense q148 index +
    // 48-bit seeded-md5 draws mod n, resolved by ONE hash equi-join —
    // never a cross join; bit-reproducible under any partitioning or
    // engine.
    "q153_negative_samples" -> ((s, dir) =>
      operators.Sampling.negativeSamples(
        T(s, dir, "documents").select(col("doc_id")),
        "doc_id", k = 4, orderSeed = 17L, negSeed = 23L)),

    // Robust scaling (x − median)/IQR — the outlier-insensitive twin
    // of q139's z-score: quartiles from one exact-percentile
    // aggregate baked as literals, the scale a single codegen'd
    // subtract+divide; exact parity, no rounding device.
    "q154_robust_scale" -> ((s, dir) =>
      operators.Quantiles.robustScale(T(s, dir, "events"), "value", "r")
        .select(col("event_id"), col("value"), col("r"))
        .orderBy("event_id")),

    // Frequency (count) encoding of event_type: category counts
    // broadcast back onto the rows (the row side never shuffles),
    // fraction one exact-long division — the zero-leakage
    // categorical encoding next to q132's target encoding.
    "q155_frequency_encode" -> ((s, dir) =>
      operators.Features.frequencyEncode(
          T(s, dir, "events").select(col("event_id"), col("event_type")),
          "event_type")
        .select(col("event_id"), col("event_type"),
          col("event_type_count"), col("event_type_frac"))
        .orderBy("event_id")),

    // Adamic-Adar link prediction on the part↔part co-purchase graph:
    // non-adjacent 2-hop pairs scored by Σ 1/ln(deg) over common
    // neighbors (per-term 12-dp round + DECIMAL sum — the q104/q116
    // exactness device), hub centers capped at deg ≤ 100: a
    // center's evidence is already the weakest at high degree, and the
    // cap bounds wedge fan-out at Σ C(min(deg,100), 2) — the knob that
    // keeps the inherently-quadratic-in-degree score linear-ish at
    // 100 TB. Top-20 candidate links.
    "q156_adamic_adar" -> ((s, dir) =>
      graphTable(s, dir, "copurchase").adamicAdar(maxDegree = 100)
        .limit(20)),

    // CountMin sketch: depth-4 × width-2048 counter table over part
    // frequencies (md5-derived row hashes — engine-portable, so the
    // whole sketch is SQL-replayable), probed for the 20 true-heaviest
    // parts next to their exact counts. est ≥ true by construction;
    // the only shuffle carries depth·width-bounded post-combine
    // partials, never the key dictionary, and disjoint-corpus sketches
    // merge by counter sum (FrequencySpec) — the bounded-memory
    // frequency oracle for 100-TB key universes.
    "q157_countmin" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_partkey"))
      val cms = operators.Frequency.countMinSketch(
        li, "l_partkey", depth = 4, width = 2048)
      val truth = li.groupBy("l_partkey")
        .agg(count(lit(1)).as("true_cnt"))
        .orderBy(desc("true_cnt"), col("l_partkey")).limit(20)
      operators.Frequency.countMinEstimate(
          cms, truth.select("l_partkey"), "l_partkey",
          depth = 4, width = 2048)
        .join(truth, "l_partkey")
        .select(col("l_partkey"), col("true_cnt"), col("est"))
        .orderBy(desc("true_cnt"), col("l_partkey"))
    }),

    // Jensen-Shannon token-distribution drift between the en and de
    // document cohorts: per-token ½p·ln(p/m)+½q·ln(q/m) contributions
    // (0·ln0 = 0), 12-dp single-rounded — the corpus-mix drift monitor
    // run between snapshots/sources before retraining. Top-20 naming
    // WHAT drifted; their sum is the JSD.
    "q158_js_drift" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      operators.TextAnalysis.distributionDrift(
        d.where(col("lang") === "en"), d.where(col("lang") === "de"))
    }),

    // Streaming per-key quantiles from a fixed-bin histogram held in
    // flatMapGroupsWithState state: p50/p90 of value per event_type at
    // bin width 5 — state bounded by OCCUPIED bins (range/width), not
    // event count, which is what makes the quantile streamable. The
    // rank is integer ⌈n·num/den⌉; the estimate a bin lower edge —
    // bit-replayable by the batch cumulative-histogram oracle.
    "q159_stream_quantile" -> ((s, dir) =>
      streaming.EventWindows.streamHistogramQuantile(s, dir,
        binWidth = 5.0,
        quantiles = Seq(("p50", 1L, 2L), ("p90", 9L, 10L)))),

    // Bipartite projection: the customer–part incidence projected onto
    // customers (edge weight = shared distinct parts), right-side hubs
    // capped at 40 incident customers BEFORE the C(d,2) pair expansion
    // — the graph-construction op that feeds the graph tier, with the
    // knob that keeps a bestseller part from dominating the job at
    // 100 TB. Top-20 strongest co-purchase ties.
    "q160_bipartite_project" -> ((s, dir) => {
      val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val cp = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      operators.Graph.bipartiteProject(cp, "c", "p", maxRightDegree = 40)
        .orderBy(desc("w"), col("src"), col("dst")).limit(20)
    }),

    // Symmetric per-vector int8 quantization report: scale =
    // max|x|/127 and the RELATIVE reconstruction RMSE (error in units
    // of scale; per-term 12-dp DECIMAL sum) — the serving-stack
    // compression check next to q95's PQ/ADC: does 8-bit linear hold
    // this corpus, per vector, before shipping the index.
    "q161_embed_int8" -> ((s, dir) =>
      operators.Quantization.int8QuantizeReport(
        T(s, dir, "embeddings"), "vec_id", "embedding")),

    // Top principal component of the q150 feature set by power
    // iteration: corr entries from EXACT distributed DECIMAL moment
    // sums (9-dp-rounded doubles), then the 4×4 iteration driver-side
    // (the DBI bounded-k² precedent) with 12-dp matvec terms and 9-dp
    // damped updates — bit-replayable by a recursive-CTE oracle, the
    // q107 device applied to linear algebra.
    "q162_pca_power" -> ((s, dir) =>
      operators.Features.pcaPowerTop(T(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        iters = 15)),

    // Ordered-changelog replay (the CDC third leg next to q85 upsert
    // and q149 snapshotDiff): per key only the max-seq change counts,
    // 'delete' tombstones, others upsert, absent keys insert. The
    // changelog collapses to one row per touched key BEFORE the
    // full-outer join — the apply cost scales with the delta, not the
    // snapshot.
    "q163_cdc_apply" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val target = o.where(col("o_orderkey") % 5 =!= 0)
      val upserts = o.where(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + lit(10.0)).as("o_totalprice"))
        .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      val dels = o.where(col("o_orderkey") % 6 === 0)
        .withColumn("op", lit("delete")).withColumn("seq", lit(2L))
      operators.Upsert.applyChangeLog(
          target, upserts.unionByName(dels), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // Newman modularity of the q117 label-prop communities: the
    // "better than chance?" score a pipeline checks before trusting a
    // clustering — per-community terms from exact integer edge/degree
    // sums, 12-dp-rounded into a DECIMAL sum (the q151 device). One
    // row: (modularity, n_communities, m_directed).
    "q164_modularity" -> ((s, dir) => {
      // scores the PERSISTED q117 label artifact — no label-prop refit
      // inside the line (the graph-table build-once precedent)
      val gt = graphTable(s, dir, "undirected")
      gt.modularity(s.read.parquet(labelTablePath(s, dir)))
    }),

    // Perceptual average-hash through the REAL ImageIO decode (the
    // q109 fixtures): one bit per pixel, 1 iff integer luminance·n ≥
    // Σluminance — no float in the hash, so the bit string replays
    // exactly from the fixture recipe. Hamming distance over these is
    // the image near-dup measure (SimHash's visual sibling).
    "q165_image_ahash" -> ((s, dir) =>
      operators.Multimodal.aHashImages(
          s.read.parquet(s"${mediaFixturePath(s, dir)}/png"))
        .orderBy("media_id")),

    // Day-of-week seasonal decomposition of the event value stream:
    // exact DECIMAL daily totals, the ISO-dow profile mean, and the
    // residual — the seasonality-vs-anomaly split run before alerting
    // on raw dailies. The ≤7-row profile broadcasts back; the daily
    // table never reshuffles.
    "q166_seasonal_dow" -> ((s, dir) =>
      operators.TimeSeries.seasonalDowProfile(
        T(s, dir, "events"), "ts", "value")),

    // Stratified A-ES weighted sampling: q100's seeded key, top-10
    // WITHIN each event_type via the bounded TopK aggregator on the
    // negated key (≤ partitions·k rows per group through the
    // exchange — never a corpus window sort). The per-source quota
    // form a mixing pipeline actually ships.
    "q167_stratified_sample" -> ((s, dir) =>
      operators.Sampling.stratifiedWeightedSample(
        T(s, dir, "events"), "event_id", "event_type",
        col("value"), k = 10, seed = "77")),

    // Vocabulary growth over 100-doc ingestion batches: occurrences,
    // distinct tokens, and FIRST-SEEN tokens per batch — the
    // saturation curve that tells a crawl when marginal data stops
    // buying vocabulary. Integer-exact.
    "q168_vocab_growth" -> ((s, dir) =>
      operators.TextAnalysis.vocabularyGrowth(
        T(s, dir, "documents"), "doc_id", "text", batchSize = 100L)),

    // Per-document Shannon token entropy (nats) — the gibberish /
    // template discriminator next to q11's quality stats: −Σ p·ln p
    // from exact counts, 12-dp DECIMAL-summed terms.
    "q169_token_entropy" -> ((s, dir) =>
      operators.TextAnalysis.tokenEntropy(
        T(s, dir, "documents"), "doc_id", "text")),

    // Percent-rank (quantile) normalization of value within each
    // event_type — the distribution-free feature transform; ANSI
    // (rank−1)/(n−1) is one exact integer division. One hash exchange
    // on the group + per-group sort, never a global window.
    "q170_rank_normalize" -> ((s, dir) =>
      operators.Features.rankNormalize(
          T(s, dir, "events").select(col("event_id"),
            col("event_type"), col("value")),
          "value", "event_type")
        .orderBy("event_id")),

    // Per-user inter-arrival profile: mean gap + coefficient of
    // variation (CV ≈ 1 Poisson, ≫ 1 bursty) — the bot/organic screen.
    // Gaps exact long micros, Σgap² in DECIMAL(38,0), stats fixed
    // double expressions 9-dp rounded.
    "q171_interarrival" -> ((s, dir) =>
      operators.Features.interArrivalStats(
        T(s, dir, "events"), "user_id", "ts", "event_id")),

    // Pearson chi-square of event_type × value-quartile — the
    // classical independence test on q151's exact cell machinery
    // (χ² statistic where q151 reports nats).
    "q172_chi_square" -> ((s, dir) =>
      operators.Features.chiSquare(
        operators.Quantiles.quantileBucket(
          T(s, dir, "events"), "value", 4, "yb"),
        "event_type", "yb")),

    // Streaming causal z-score: each event against its user's
    // STRICTLY PRIOR mean/sd, exact integer-unit accumulators in
    // GroupState (count, Σ units long, Σ units² BigInteger) — the
    // real-time anomaly twin of q135, null until 3 priors. Replayed
    // bit-exactly by the batch cumulative-window oracle.
    "q173_stream_zscore" -> ((s, dir) =>
      streaming.EventWindows.streamZScore(s, dir)),

    // Directional n-gram CONTAINMENT pairs — q17's asymmetric twin:
    // |A∩B|/|A| catches wholesale inclusion (short doc quoted in a
    // long one) that union-relative Jaccard dilutes away; the
    // boilerplate-wrap / quote-expansion dup shape. Same 8-byte
    // shingle inverted-index join, either direction > 0.5.
    "q174_containment_pairs" -> ((s, dir) =>
      operators.Dedup.ngramContainmentPairs(
          T(s, dir, "documents").where(col("doc_id") < 500),
          n = pairShingleN, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // Persisted mergeable histogram artifact (the PQ/IVF/graph
    // build-once precedent applied to quantiles): base built from 90%
    // of the feed, the rest folded in by counter sum + staged swap,
    // p50/p90/p99 probed from the counter table alone — append ≡
    // rebuild proven end-to-end against the full-feed oracle.
    "q175_histogram_artifact" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_hist_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val ev = T(s, dir, "events").select(col("event_id"), col("value"))
      operators.Quantiles.writeHistogram(
        ev.where(col("event_id") % 10 =!= 0), "value", 5.0, base)
      operators.Quantiles.appendToHistogram(
        s, base, ev.where(col("event_id") % 10 === 0), "value")
      operators.Quantiles.histogramQuantiles(s, base,
        Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)))
    }),

    // Language-ID confusion matrix: declared lang × detected lang
    // counts plus per-declared-lang hit share — the classifier eval
    // every curation pipeline runs before trusting q12's detector as
    // a corpus filter. Exact counts; share one long division.
    "q176_lang_confusion" -> ((s, dir) => {
      val d = T(s, dir, "documents").select(col("lang"),
        operators.TextAnalysis.detectLang(col("text")).as("detected"))
      val cells = d.groupBy("lang", "detected")
        .agg(count(lit(1)).as("n"))
      val tot = cells.groupBy("lang").agg(sum("n").as("n_lang"))
      cells.join(tot, "lang")
        .select(col("lang"), col("detected"), col("n"),
          (col("n").cast("double") / col("n_lang").cast("double"))
            .as("share"))
        .orderBy("lang", "detected")
    }),

    // Unicode tokenizer coverage — the multilingual row: an inline
    // fixture in five non-Latin scripts (Cyrillic, Greek, Arabic, CJK,
    // accented Latin) + English, through the SAME `\p{L}` tokenizer
    // device the whole text surface shares (TextAnalysis.wordTokens /
    // tokenSplitRe): per-doc token stats + Shannon entropy (the q169
    // machinery) + the doc's top TF-IDF term (the q57 scoring, 6-dp).
    // Under the old `[^A-Za-z]+` split every non-Latin doc here
    // tokenized to NOTHING — this row pins the fix cross-engine.
    "q177_unicode_tokens" -> ((s, dir) => {
      val docs = unicodeFixture(s)
      val nDocs = unicodeFixtureRows.size.toDouble
      val ent = operators.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      val cells = docs.select(col("doc_id"),
          explode(operators.TextAnalysis.wordTokens(col("text")))
            .as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = cells.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = cells.join(dfreq, "term")
        .withColumn("score",
          round(col("tf") * log(lit(nDocs) / col("df")), 6))
      val top = scored.withColumn("rn",
          row_number().over(Window.partitionBy(col("doc_id"))
            .orderBy(desc("score"), asc("term"))))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"),
          col("score").as("tfidf"))
      docs.select(col("doc_id"), col("lang"))
        .join(ent, "doc_id").join(top, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("n_distinct"), col("entropy"), col("top_term"),
          col("tfidf"))
        .orderBy("doc_id")
    }),

    // Persisted CountMin lifecycle (q157's artifact form, the
    // q130/q175 build/append/probe precedent): build the sketch from
    // 90% of lineitem part keys, fold the other 10% in via
    // counter-wise merge + staged swap, probe the top-20 true-heaviest
    // parts from the stored counters. Counter sums commute, so the
    // merged artifact IS the full-feed sketch — the oracle is q157's
    // full-corpus replay, bit-for-bit.
    "q178_countmin_artifact" -> ((s, dir) => {
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_cmappend_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val li = T(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_orderkey"))
      operators.Frequency.writeCountMin(
        li.where(col("l_orderkey") % 10 =!= 0), "l_partkey",
        depth = 4, width = 2048, base)
      operators.Frequency.appendToCountMin(s, base,
        li.where(col("l_orderkey") % 10 === 0), "l_partkey")
      val truth = li.groupBy("l_partkey")
        .agg(count(lit(1)).as("true_cnt"))
        .orderBy(desc("true_cnt"), col("l_partkey")).limit(20)
      operators.Frequency.countMinEstimatePersisted(
          s, base, truth.select("l_partkey"), "l_partkey")
        .join(truth, "l_partkey")
        .select(col("l_partkey"), col("true_cnt"), col("est"))
        .orderBy(desc("true_cnt"), col("l_partkey"))
    }),

    // Char-bigram Naive Bayes language ID (Cavnar–Trenkle n-gram
    // profiles, NB-formulated) fit on a labeled real-language train
    // fixture and evaluated on a held-out test split, side by side
    // with the q12 marker heuristic on the SAME split — confusion
    // cells per detector. The NB diagonal dominates (20/20 vs the
    // markers' 15/20: real zh text scores zero on pinyin word
    // markers and falls to the tie-break). Exact-replay classifier:
    // integer gram counts, 12-dp-rounded ln terms, DECIMAL sums.
    "q179_lang_nb" -> ((s, dir) => {
      import s.implicits._
      val train = nbTrainRows.toDF("lang", "text")
      val test = nbTestRows.toDF("doc_id", "lang", "text")
      val model = operators.TextAnalysis.charNgramLangModel(
        train, "lang", "text", n = 2)
      val nb = operators.TextAnalysis.charNgramDetect(
          model, test, "doc_id", "text", n = 2)
        .withColumn("detector", lit("nb"))
      val mk = test.select(col("doc_id"),
          operators.TextAnalysis.detectLang(col("text")).as("detected"))
        .withColumn("detector", lit("marker"))
      nb.unionByName(mk)
        .join(test.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("detector", "lang", "detected")
        .agg(count(lit(1)).as("n"))
        .orderBy("detector", "lang", "detected")
    }),

    // Persisted NB language-model lifecycle (the q178 CountMin shape
    // applied to the q179 classifier): fit on 4-of-6 sentences per
    // language, fold the remaining 2 in via count-sum + staged swap,
    // classify the held-out test split from the stored counters. Gram
    // counts are integer sums, so the split-and-append model IS the
    // full-train model — the oracle is q179's full-train NB replay,
    // bit-for-bit.
    "q180_lang_model_artifact" -> ((s, dir) => {
      import s.implicits._
      val base = TempCleanup.register(sys.props("java.io.tmpdir") +
        s"/graft_lmappend_${ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode))
      val train = nbTrainRows.zipWithIndex
        .map { case ((lang, text), i) => (i.toLong, lang, text) }
        .toDF("row_id", "lang", "text")
      val test = nbTestRows.toDF("doc_id", "lang", "text")
      val model0 = operators.TextAnalysis.charNgramLangModel(
        train.where(col("row_id") % 6 < 4), "lang", "text", n = 2)
      operators.TextAnalysis.writeLangModel(model0, n = 2, base)
      operators.TextAnalysis.appendToLangModel(s, base,
        train.where(col("row_id") % 6 >= 4), "lang", "text")
      operators.TextAnalysis.charNgramDetectPersisted(
          s, base, test, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Unicode script profile on the multilingual fixture: per-doc
    // letter totals, per-script letter counts (Unicode Script
    // property, the same class spelled \p{IsX} in Java and \p{X} in
    // RE2), and the dominant script — the pre-language-ID router of a
    // multilingual corpus. Pure codegen'd regexp counts, one scan.
    "q181_script_profile" -> ((s, dir) => {
      val docs = unicodeFixture(s)
      operators.TextAnalysis.scriptProfile(docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .orderBy("doc_id")
    }),

    // Streaming CountMin ingestion: the events feed arrives as a
    // 3-file micro-batch stream; each batch's sketch folds into the
    // persisted artifact inside foreachBatch (counters+meta swapped
    // in one staged rename carrying the last applied batch id — the
    // exactly-once guard over a non-idempotent fold). Counter sums
    // commute, so the probe must match the full-corpus replay
    // bit-for-bit — same oracle shape as q157/q178, on events.
    "q182_stream_countmin" -> ((s, dir) =>
      streaming.EventWindows.streamCountMin(s, dir)),

    // CJK unigram segmentation vs the plain letter-run tokenizer on
    // the multilingual fixture: Han text has no spaces, so wordTokens
    // yields one giant token per clause while cjkAwareTokens pads
    // every Han code point into its own token (the Lucene-style IR
    // fallback); alphabetic scripts are unchanged (n_plain == n_cjk).
    "q183_cjk_tokens" -> ((s, dir) => {
      val docs = unicodeFixture(s)
      docs.select(col("doc_id"), col("lang"),
          size(operators.TextAnalysis.wordTokens(col("text")))
            .cast("long").as("n_tokens_plain"),
          operators.TextAnalysis.cjkAwareTokens(col("text")).as("a"),
          operators.TextAnalysis.cjkBigramTokens(col("text")).as("b"))
        .select(col("doc_id"), col("lang"), col("n_tokens_plain"),
          size(col("a")).cast("long").as("n_tokens_cjk"),
          size(array_distinct(col("a"))).cast("long")
            .as("n_distinct_cjk"),
          // Lucene-style OVERLAPPING Han bigrams (the IR-standard CJK
          // unit — unigrams inflate df and destroy phrase stats):
          // L-run → L−1 bigrams, isolated Han char → unigram,
          // alphabetic scripts identical to the plain tokenizer
          size(col("b")).cast("long").as("n_tokens_bigram"),
          size(array_distinct(col("b"))).cast("long")
            .as("n_distinct_bigram"))
        .orderBy("doc_id")
    }),

    // Opt-in ASCII case folding on the retrieval surface: q92's BM25
    // with fold = true and a MIXED-CASE query — corpus tokens and
    // query terms both fold A-Z→a-z (a 26-char translate map: no ICU
    // init, no ß/İ divergence, replayed bit-identically by DuckDB's
    // translate), so 'The'/'Spark'/'DUP' retrieve the lowercase
    // corpus the unfolded query would miss entirely. Existing rows
    // (q92 itself) stay case-exact and unchanged.
    "q184_folded_bm25" -> ((s, dir) => {
      operators.Retrieval.bm25TopK(T(s, dir, "documents"),
        "doc_id", "text", Seq("The", "Spark", "DUP"), fold = true)
    }),

    // The q177 corpus-token line ROUTED through the CJK bigram
    // tokenizer (tokenEntropy's tokenizer option): under plain
    // wordTokens a Han document is one clause-sized token (the zh
    // row's entropy degraded toward ln of its clause count); under
    // overlapping bigrams it gets real token statistics while the
    // alphabetic rows keep their plain-tokenizer numbers exactly.
    "q185_cjk_bigram_stats" -> ((s, dir) => {
      val docs = unicodeFixture(s)
      val nDocs = unicodeFixtureRows.size.toDouble
      val ent = operators.TextAnalysis.tokenEntropy(docs, "doc_id",
        "text", operators.TextAnalysis.cjkBigramTokens)
      val cells = docs.select(col("doc_id"),
          explode(operators.TextAnalysis.cjkBigramTokens(col("text")))
            .as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = cells.groupBy("term").agg(count(lit(1)).as("df"))
      val top = cells.join(dfreq, "term")
        .withColumn("score",
          round(col("tf") * log(lit(nDocs) / col("df")), 6))
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("doc_id"))
            .orderBy(desc("score"), asc("term"))))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"),
          col("score").as("tfidf"))
      docs.select(col("doc_id"), col("lang"))
        .join(ent, "doc_id").join(top, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("n_distinct"), col("entropy"), col("top_term"),
          col("tfidf"))
        .orderBy("doc_id")
    }),

    // CORPUS-scale NB fit (q179 fits on a 48-sentence in-code
    // fixture; this line fits on the sf-scaled documents table, so
    // the distributed gram-counter path and the
    // vocabulary-bounded-broadcast claim are exercised at bench
    // scale): fit the char-bigram model on documents(lang, text),
    // self-classify the corpus from it, emit the confusion matrix.
    // Model size is |alphabet|²-bounded regardless of corpus size;
    // scoring is map-side broadcast joins + one (doc, lang) hash
    // aggregate + a doc-keyed argmax — nothing corpus-global.
    "q186_lang_nb_corpus" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val model = operators.TextAnalysis.charNgramLangModel(
        d, "lang", "text", n = 2)
      operators.TextAnalysis.charNgramDetect(
          model, d, "doc_id", "text", n = 2)
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang", "detected")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "detected")
    }),

    // Encoding-damage audit: the three mojibake signatures (U+FFFD,
    // C1 controls, UTF-8-read-as-Latin-1 digraphs) counted per doc on
    // the planted fixture — the gate a scraped corpus passes BEFORE
    // normalization and dedup (damaged text hashes differently from
    // its clean twin, silently defeating dedup). Pure codegen'd
    // regexp counts; PlanSpec asserts the zero-exchange corpus shape.
    "q187_encoding_audit" -> ((s, dir) => {
      import s.implicits._
      operators.TextAnalysis.encodingQuality(
          mojibakeFixtureRows.toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // REAL JPEG decode — the lossy second container format next to
    // q109's bit-exact PNG: per payload the container must parse, the
    // dimensions must survive, and every decoded pixel must sit within
    // 8 levels of the flat recipe gray (DC quantization is the only
    // JPEG error on a flat field). A failed decode reports
    // (-1, -1, false) and breaks the oracle — so the green row proves
    // the codec path, not just the plumbing.
    "q188_jpeg_decode" -> ((s, dir) =>
      operators.Multimodal.jpegDecodeAudit(
          s.read.parquet(s"${mediaFixturePath(s, dir)}/jpg"), tol = 8)
        .orderBy("media_id")),

    // REAL subword tokenization (BPE): fit the merges table on the
    // corpus (distributed word counts -> bounded top-F cut -> driver
    // greedy trainer), persist it, and account real per-doc token
    // counts via the per-DISTINCT-word apply kernel joined back to the
    // occurrence stream. Fit + persist + apply all run INSIDE the
    // timed line (the q130 lifecycle discipline — no build cost
    // escapes the bench). Oracle: the persisted merges are replayed
    // per distinct word by a recursive CTE (lowest-rank applicable
    // merge per step, replace-all leftmost-first on a double-space
    // token string — word-length-bounded), counts joined back.
    "q189_bpe_tokenize" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
      val model = operators.Bpe.fitBpe(docs, "text", numMerges = 48)
      model.merges.map(m => (m.rank, m.l, m.r)).toDF("rank", "l", "r")
        .coalesce(1).write.mode("overwrite").parquet(bpeMergesPath(dir))
      operators.Bpe.tokenCounts(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    }),

    // Sequence packing under the REAL tokenizer — q118's global FFD
    // shape composed with q189's fitted BPE model through the
    // `tokenCount` hook: context windows are sized in actual subword
    // tokens, not the whitespace estimate (the whole point of fitting
    // a tokenizer before packing). The fit + merges persist run
    // in-line (q189 accounting precedent); the oracle replays the
    // merge loop per distinct word over the persisted merges table,
    // then feeds those counts into the q118 harmonic-class replay.
    "q190_pack_bpe" -> ((s, dir) => {
      import s.implicits._
      val docs = T(s, dir, "documents")
      val model = operators.Bpe.fitBpe(docs, "text", numMerges = 48)
      model.merges.map(m => (m.rank, m.l, m.r)).toDF("rank", "l", "r")
        .coalesce(1).write.mode("overwrite").parquet(bpeMergesPath(dir))
      operators.Curation.packSequencesGlobal(
        docs, "doc_id", "text", capacity = 256,
        tokenCount = operators.Bpe.tokenCountCol(model))
        .orderBy("doc_id")
    }))

  // --------------------------------------------------------- oracle SQL

  /** Recursive-CTE replay of the directed+dangling PageRank loop:
    * dm = (DOUBLE)(Σ DECIMAL(38,12) round(rank,12) over sinks) / N,
    * cross-joined into every node's damped update — the third
    * reference to the recursive table is fine in DuckDB.
    * `edgeWhere` filters the order side; `cap` is the round cap;
    * `finalSelect` picks which round's ranks to emit. */
  private def pagerankDirectedCte(
      edgeWhere: String, cap: Int, finalSelect: String): String =
    s"""WITH RECURSIVE
      |base AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
      |  l.l_suppkey + 10000000 AS p
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  $edgeWhere),
      |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM base),
      |od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e
      |  GROUP BY 1),
      |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
      |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      |dang AS MATERIALIZED (SELECT node FROM nodes
      |  WHERE node NOT IN (SELECT src FROM e)),
      |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n
      |  FROM nodes),
      |pr AS (
      |  SELECT 0 AS it, node,
      |    CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
      |  FROM nodes
      |  UNION ALL
      |  SELECT old.it + 1, old.node,
      |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
      |        / (SELECT n FROM nn)
      |      + CAST(0.85 AS DOUBLE)
      |        * (CAST(coalesce(agg.s, 0) AS DOUBLE) + dm.v),
      |      9)
      |  FROM pr old
      |  LEFT JOIN (
      |    SELECT e.dst AS node,
      |      sum(CAST(round(w.rank / CAST(od.outdeg AS DOUBLE), 12)
      |        AS DECIMAL(38,12))) AS s
      |    FROM pr w JOIN e ON e.src = w.node JOIN od ON od.src = e.src
      |    GROUP BY e.dst
      |  ) agg ON agg.node = old.node
      |  CROSS JOIN (
      |    SELECT CAST(coalesce(sum(CAST(round(d.rank, 12)
      |        AS DECIMAL(38,12))), 0) AS DOUBLE)
      |      / (SELECT n FROM nn) AS v
      |    FROM pr d JOIN dang ON dang.node = d.node
      |  ) dm
      |  WHERE old.it + 1 <= $cap
      |)
      |$finalSelect""".stripMargin

  /** Shared by q102 (driver-resident loop) and q107 (distributed rank
    * table): the two loop bodies compute the same fixpoint (GraphSpec
    * proves bit-identity), so they answer to the same oracle. */
  private val pagerankDirectedOracle: String =
    pagerankDirectedCte("", 10,
      """SELECT node, rank FROM pr WHERE it = 10
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin)

  /** q111: replay all 12 capped rounds, derive the stop round FROM THE
    * DATA (first round whose max |Δrank| <= eps, else the cap — the
    * engine's inclusive A7 boundary), and emit that round's ranks. */
  private val pagerankEpsilonOracle: String =
    pagerankDirectedCte("WHERE o.o_orderkey % 10 = 0", 12,
      """, del AS (SELECT a.it AS it, max(abs(a.rank - b.rank)) AS delta
        |  FROM pr a JOIN pr b ON b.node = a.node AND b.it = a.it - 1
        |  GROUP BY a.it),
        |stp AS (SELECT coalesce(min(it), 12) AS r FROM del
        |  WHERE delta <= CAST(2e-3 AS DOUBLE))
        |SELECT node, rank FROM pr CROSS JOIN stp WHERE pr.it = stp.r
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin)

  /** Recursive-CTE replay of the Jacobi HITS loop (shared by q114's
    * fixed-round form and q115's epsilon-stop form — `cap` is the
    * round cap, `finalSelect` picks which round's scores to emit). */
  private def hitsCte(cap: Int, finalSelect: String): String =
    s"""WITH RECURSIVE
      |base AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
      |  l.l_suppkey + 10000000 AS p
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM base),
      |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
      |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n
      |  FROM nodes),
      |hs AS (
      |  SELECT 0 AS it, node,
      |    CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS auth,
      |    CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS hub
      |  FROM nodes
      |  UNION ALL
      |  SELECT old.it + 1, old.node,
      |    round(CAST(coalesce(ar.s, 0) AS DOUBLE) / ta.v, 9),
      |    round(CAST(coalesce(hr.s, 0) AS DOUBLE) / th.v, 9)
      |  FROM hs old
      |  LEFT JOIN (
      |    SELECT e.dst AS node,
      |      sum(CAST(round(w.hub, 12) AS DECIMAL(38,12))) AS s
      |    FROM hs w JOIN e ON e.src = w.node GROUP BY e.dst
      |  ) ar ON ar.node = old.node
      |  LEFT JOIN (
      |    SELECT e.src AS node,
      |      sum(CAST(round(w.auth, 12) AS DECIMAL(38,12))) AS s
      |    FROM hs w JOIN e ON e.dst = w.node GROUP BY e.src
      |  ) hr ON hr.node = old.node
      |  CROSS JOIN (
      |    SELECT CAST(sum(CAST(round(w.hub, 12)
      |      AS DECIMAL(38,12))) AS DOUBLE) AS v
      |    FROM hs w JOIN e ON e.src = w.node
      |  ) ta
      |  CROSS JOIN (
      |    SELECT CAST(sum(CAST(round(w.auth, 12)
      |      AS DECIMAL(38,12))) AS DOUBLE) AS v
      |    FROM hs w JOIN e ON e.dst = w.node
      |  ) th
      |  WHERE old.it + 1 <= $cap
      |)
      |$finalSelect""".stripMargin

  /** Shared base for the q119/q120 structural-graph oracles: the
    * part↔part co-purchase graph (parts sharing an order), its
    * symmetric degree table, and per-node triangle counts by the
    * id-ordered three-way join — deliberately NOT the engine's degree
    * orientation, so the check is algorithm-independent (exact longs
    * either way). */
  private val copurchaseCte: String =
    """WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey
      |  FROM lineitem),
      |pe AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS s1,
      |  b.l_partkey AS s2
      |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
      |  AND a.l_partkey < b.l_partkey),
      |sym AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM pe
      |  UNION ALL SELECT s2, s1 FROM pe),
      |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg
      |  FROM sym GROUP BY 1),
      |tri AS MATERIALIZED (
      |  SELECT node, count(*) AS tri FROM (
      |    SELECT unnest([e1.s1, e1.s2, e2.s2]) AS node
      |    FROM pe e1 JOIN pe e2 ON e1.s1 = e2.s1 AND e1.s2 < e2.s2
      |    JOIN pe e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2)
      |  GROUP BY 1)""".stripMargin

  /** q124/q125 oracle: row-by-row recursive replay of the per-key EWMA
    * recurrence in exact DECIMAL arithmetic. */
  private val ewmaOracle: String =
    """WITH RECURSIVE ev AS MATERIALIZED (
      |  SELECT user_id, event_id,
      |    CAST(round(value, 6) AS DECIMAL(24,6)) AS v6,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |st AS (
      |  SELECT user_id, rn, event_id,
      |    CAST(v6 AS DECIMAL(24,9)) AS ewma
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, e.event_id,
      |    CAST(round(CAST(0.25 AS DECIMAL(3,2)) * e.v6
      |      + CAST(0.75 AS DECIMAL(3,2)) * s.ewma, 9)
      |      AS DECIMAL(24,9))
      |  FROM st s JOIN ev e ON e.user_id = s.user_id
      |    AND e.rn = s.rn + 1)
      |SELECT user_id, event_id, CAST(ewma AS DOUBLE) AS ewma FROM st
      |ORDER BY user_id, event_id""".stripMargin

  /** q21/q112 oracle: 30-min-gap sessionization without the duration
    * column (the streaming surface emits user, start, end, count). */
  private val streamSessionizeOracle: String =
    """WITH d AS (
      |SELECT user_id, ts,
      |CASE WHEN lag(ts) OVER w IS NULL
      |OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS is_start
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), s AS (
      |SELECT user_id, ts, sum(is_start) OVER
      |(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |FROM d)
      |SELECT user_id, epoch_us(min(ts)) AS start_us,
      |epoch_us(max(ts)) AS end_us, count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  /** 30-min-gap sessionization replay, shared by q105 (window +
    * running-sum form) and q108 (native session_window form — equal
    * row-for-row by the +1µs boundary device, TimeSeriesSpec). */
  private val sessionizeOracle: String =
    """WITH d AS (
      |SELECT user_id, ts, event_id,
      |CASE WHEN lag(ts) OVER w IS NULL
      |OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
      |THEN 1 ELSE 0 END AS is_start
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |SELECT user_id, ts, sum(is_start) OVER
      |(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |AS sid FROM d)
      |SELECT user_id, epoch_us(min(ts)) AS start_us,
      |epoch_us(max(ts)) AS end_us, count(*) AS n_events,
      |CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
      |AS duration_sec
      |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_agg_sum" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |CAST(extract(epoch FROM l_shipdate) AS BIGINT) AS ship_epoch
        |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, ship_epoch"""
        .stripMargin,

    "q03_join_dims" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_window_topn" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |SELECT o_custkey, o_orderkey, row_number() OVER
        |(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q06_argmin_assign" ->
      s"""SELECT cluster, count(*) AS n,
         |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS mean_bal
         |FROM (SELECT $acctClusterSql AS cluster, c_acctbal FROM customer)
         |GROUP BY cluster ORDER BY cluster""".stripMargin,

    "q07_kmeans_step" ->
      """SELECT cluster, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS mean_qty,
        |CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS mean_disc,
        |CAST(sum(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS mean_tax
        |FROM (SELECT CASE WHEN
        |(l_quantity - 10.0)*(l_quantity - 10.0) + (l_discount - 0.03)*(l_discount - 0.03) + (l_tax - 0.02)*(l_tax - 0.02)
        |<= (l_quantity - 40.0)*(l_quantity - 40.0) + (l_discount - 0.07)*(l_discount - 0.07) + (l_tax - 0.05)*(l_tax - 0.05)
        |THEN 0 ELSE 1 END AS cluster, l_quantity, l_discount, l_tax FROM lineitem)
        |GROUP BY cluster ORDER BY cluster""".stripMargin,

    "q08_scatter" ->
      s"""SELECT cluster, count(*) AS n,
         |CAST(sum(CAST(dist AS DECIMAL(18,4))) AS DOUBLE)/count(*) AS mean_dist
         |FROM (SELECT $acctClusterSql AS cluster,
         |least(abs(c_acctbal - $C0), abs(c_acctbal - $C1), abs(c_acctbal - $C2)) AS dist
         |FROM customer) GROUP BY cluster ORDER BY cluster""".stripMargin,

    "q09_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q10_token_stats" ->
      """SELECT doc_id, length(text) AS n_chars_calc,
        |CASE WHEN length(trim(text)) = 0 THEN 0
        |ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q11_text_quality" ->
      """SELECT doc_id,
        |length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
        |length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
        |length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS n_alpha
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q12_lang_marker" ->
      """SELECT lang, count(*) AS n_docs,
        |CAST(sum(len(regexp_extract_all(text, '\bthe\b', 0, 'i'))) AS BIGINT) AS the_hits
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q13_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
        |INTERSECT SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,

    "q14_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY custkey""".stripMargin,

    "q15_date_agg" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        |CAST(month(o_orderdate) AS INT) AS m, count(*) AS n_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q16_knn_brute" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |list_sum(list_transform(list_zip(e.embedding, q.qe),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS score
        |FROM embeddings e, q ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,

    "q17_jaccard_pairs" ->
      s"""WITH $jaccardPairsCte
         |SELECT id_a, id_b, jac FROM pairs
         |ORDER BY id_a, id_b""".stripMargin,

    "q18_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |CAST(length(text) % 640 + 1 AS INT) AS width
        |FROM documents ORDER BY media_id""".stripMargin,

    "q19_frame_sample" ->
      """SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
        |CAST(i * 64 AS BIGINT) AS byte_offset FROM (
        |SELECT doc_id AS media_id, unnest(range(0, greatest(
        |CAST(floor(octet_length(CAST(text AS BLOB)) / 64.0) AS INT), 1))) AS i
        |FROM documents) ORDER BY media_id, frame_idx""".stripMargin,

    "q20_stream_hourly" ->
      """SELECT CAST(extract(epoch FROM date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |event_type, count(*) AS n_events,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q21_sessionize" -> streamSessionizeOracle,

    // the native streaming session_window twin computes the SAME
    // sessions (inclusive merge boundary; single-batch delivery in
    // the verification run), so it shares q21's oracle
    "q112_stream_session_native" -> streamSessionizeOracle,

    "q22_asof_join" ->
      """WITH ord AS (SELECT o_custkey, o_orderdate,
        |max(o_totalprice) AS price FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, o.price
        |FROM events e ASOF LEFT JOIN ord o
        |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "q23_rollup" ->
      """SELECT n_name, count(*) AS n_cust,
        |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name) ORDER BY n_name NULLS FIRST""".stripMargin,

    "q24_semi_anti" ->
      """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
        |SELECT c_custkey, 'has_big' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_big' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q25_lang_detect" ->
      s"""SELECT ${TextAnalysis.detectLangSql} AS detected,
         |count(*) AS n_docs FROM documents
         |GROUP BY 1 ORDER BY detected""".stripMargin,

    // the reference's entire pipeline (Main.java:301-343) as a DuckDB
    // recursive CTE — 19-iteration Lloyd fixpoint, bit-exact (see
    // sqlKMeansIterCte for the parity argument)
    "q30_kmeans_fit" ->
      s"""WITH RECURSIVE ${sqlKMeansIterCte(8, 64, 19, 1e-3)}
         |SELECT cluster, CAST(r.i AS INT) AS dim_idx, c[r.i+1] AS cent_val
         |FROM iter, range(0, 64) r(i)
         |WHERE it = (SELECT max(it) FROM iter)
         |ORDER BY cluster, dim_idx""".stripMargin,

    // LSH bucket membership + exact re-rank, with the 6 hyperplanes
    // inlined (generated from the same seed-derived planes the Spark
    // path uses — dot-sign bucket arithmetic is identical)
    "q35_ann_lsh" -> {
      val planes = Similarity.hyperplanes(42L, 6, 64)
      def bucketExpr(c: String): String =
        planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN ${sqlDot(c, sqlVec(p))} >= 0.0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |b AS (SELECT e.vec_id, ${sqlDot("e.embedding", "q.qe")} AS score,
         |${bucketExpr("e.embedding")} AS bkt
         |FROM embeddings e, q),
         |qb AS (SELECT ${bucketExpr("q.qe")} AS bkt FROM q)
         |SELECT vec_id, score FROM b, qb WHERE b.bkt = qb.bkt
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
    },

    // IVF: the same recursive-CTE quantizer fit (6 iterations, thresh
    // 1e-4), then probe the 3 cells nearest the query and re-rank
    "q40_ann_ivf" ->
      s"""WITH RECURSIVE ${sqlKMeansIterCte(8, 64, 6, 1e-4)},
         |cents AS (SELECT cluster, c FROM iter
         |          WHERE it = (SELECT max(it) FROM iter)),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |probed AS (SELECT cents.cluster FROM cents, q
         |  ORDER BY ${sqlSqDistCols("q.qe", "cents.c")}, cents.cluster
         |  LIMIT 3),
         |assigned AS (
         |  SELECT p.vec_id, p.embedding, d.cluster
         |  FROM embeddings p
         |  CROSS JOIN LATERAL (
         |    SELECT c2.cluster FROM cents c2
         |    ORDER BY ${sqlSqDistCols("p.embedding", "c2.c")}, c2.cluster
         |    LIMIT 1) d)
         |SELECT a.vec_id, ${sqlDot("a.embedding", "q.qe")} AS score
         |FROM assigned a JOIN probed USING (cluster), q
         |ORDER BY score DESC, a.vec_id LIMIT 10""".stripMargin,

    // generated from hpCents — argmin CASE chain identical in shape and
    // arithmetic to VectorFunctions.assignCol (see hpAssignSql)
    "q31_kmeans_label" ->
      s"""WITH ${hpAssignSql("vec_id")}
         |SELECT cluster, count(*) AS n FROM a_
         |GROUP BY cluster ORDER BY cluster""".stripMargin,

    "q32_dbi" -> {
      val k = hpCents.length
      // k×k centroid distances are constants of the fixture — inline
      // them shortest-roundtrip so DuckDB recovers the exact doubles
      val d = Array.tabulate(k, k) { (i, j) =>
        graft.functions.VectorFunctions.euclidean(hpCents(i), hpCents(j))
      }
      val sigs = (0 until k)
        .map(i => s"max(CASE WHEN cluster=$i THEN sig END) AS s$i")
        .mkString(", ")
      val maxes = (0 until k).map { i =>
        val ratios = (0 until k).filter(_ != i)
          .map(j => s"(s$i+s$j)/${d(i)(j)}")
          .mkString(", ")
        s"greatest($ratios)"
      }.mkString(" + ")
      s"""WITH ${hpAssignSql("vec_id")},
         |sc AS (SELECT cluster, sqrt(least(d0, d1, d2, d3)) AS dist FROM a_),
         |sg AS (SELECT cluster,
         |CAST(sum(CAST(dist AS DECIMAL(28,6))) AS DOUBLE)/count(*) AS sig
         |FROM sc GROUP BY cluster),
         |p AS (SELECT $sigs FROM sg)
         |SELECT ($maxes)/$k AS dbi FROM p""".stripMargin
    },

    // q33's LSH candidates verified with exact Jaccard: on this corpus
    // every >0.35 pair sits at jac ≥ 0.92, where 16×4 banding recall is
    // 1 − 3e-10 — so the exact-pair oracle (q17's SQL, unrestricted)
    // is the correct expected output.
    "q33_minhash_lsh" ->
      """WITH s AS (SELECT doc_id, list_distinct(list_transform(
        |range(1, length(text) - 6), i -> substr(text, CAST(i AS INT), 8))) AS sh
        |FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |len(list_distinct(list_concat(a.sh, b.sh))) AS jac
        |FROM s a, s b WHERE a.doc_id < b.doc_id
        |AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |len(list_distinct(list_concat(a.sh, b.sh))) > 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    // pair-extraction replay over the fingerprint table the q34 query
    // itself persisted (write→read round trip on the Spark side, so
    // both engines decide over byte-identical fp values): exact
    // all-pairs Hamming — the banding must reproduce it at recall 1
    "q34_simhash" ->
      s"""SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS dist
         |FROM read_parquet('${simhashFpPath(lastDatasetDir)}/*.parquet') a
         |JOIN read_parquet('${simhashFpPath(lastDatasetDir)}/*.parquet') b
         |  ON a.id < b.id
         |WHERE bit_count(xor(a.fp, b.fp)) <= 6
         |ORDER BY id_a, id_b""".stripMargin,

    "q36_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding,
        |sqrt(list_sum(list_transform(embedding,
        |x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
        |FROM embeddings WHERE vec_id < 2000)
        |SELECT id_a, id_b, cos FROM (
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0 ELSE
        |list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))/(a.nrm*b.nrm)
        |END AS cos
        |FROM e a, e b WHERE a.vec_id < b.vec_id)
        |WHERE cos > 0.45 ORDER BY id_a, id_b""".stripMargin,

    // same brute-force SQL over the unioned (original + f32-perturbed)
    // set: the uniform positive scaling preserves direction exactly, so
    // banded-LSH recall on the planted pairs is 1 by construction and
    // the exact pair set is the correct expected output
    "q42_embed_neardup_lsh" ->
      """WITH u AS (
        |SELECT vec_id, embedding FROM embeddings WHERE vec_id < 2000
        |UNION ALL
        |SELECT vec_id + 1000000 AS vec_id,
        |list_transform(embedding, x -> x * CAST(1.0001 AS FLOAT)) AS embedding
        |FROM embeddings WHERE vec_id < 2000),
        |e AS (SELECT vec_id, embedding,
        |sqrt(list_sum(list_transform(embedding,
        |x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm FROM u)
        |SELECT id_a, id_b, cos FROM (
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0 ELSE
        |list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))/(a.nrm*b.nrm)
        |END AS cos
        |FROM e a, e b WHERE a.vec_id < b.vec_id)
        |WHERE cos > 0.9 ORDER BY id_a, id_b""".stripMargin,

    // stub decode oracle: byte at min(i*stride, len-1) of the utf-8
    // payload, /255 in f32 (bytes via hex() because DuckDB has no direct
    // blob indexing; f32 division parity verified for all 256 values)
    "q37_multimodal_decode" ->
      """WITH m AS (SELECT doc_id AS media_id, CAST(text AS BLOB) AS b
        |FROM documents),
        |h AS (SELECT media_id, hex(b) AS hx, octet_length(b) AS len FROM m)
        |SELECT media_id, CAST(i AS INT) AS feat_idx,
        |CASE WHEN len = 0 THEN CAST(0 AS FLOAT) ELSE
        |CAST((strpos('0123456789ABCDEF',
        |substr(hx, 2*least(i*greatest(len//8, 1), len-1)+1, 1))-1)*16
        |+ (strpos('0123456789ABCDEF',
        |substr(hx, 2*least(i*greatest(len//8, 1), len-1)+2, 1))-1) AS FLOAT)
        |/CAST(255 AS FLOAT) END AS feat_val
        |FROM h CROSS JOIN range(0, 8) r(i)
        |ORDER BY media_id, feat_idx""".stripMargin,

    "q38_stream_user" ->
      """SELECT CAST(extract(epoch FROM date_trunc('hour', ts)) AS BIGINT)
        |AS hour_epoch, user_id, count(*) AS n_events
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q44_stream_assign" ->
      s"""WITH ${hpAssignSql("vec_id")}
         |SELECT cluster, count(*) AS n FROM a_
         |GROUP BY cluster ORDER BY cluster""".stripMargin,

    "q47_percentile" ->
      """SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.5) AS p50_qty,
        |quantile_cont(l_quantity, 0.95) AS p95_qty,
        |quantile_cont(l_extendedprice, 0.9) AS p90_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q48_stats" ->
      """SELECT l_returnflag,
        |round(stddev_samp(l_quantity), 6) AS sd_qty,
        |round(var_samp(l_discount), 6) AS var_disc,
        |round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_stream_enrich" ->
      """SELECT c_nationkey, count(*) AS n_events,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q46_stream_dedup" ->
      """SELECT CAST(length(text) % 16 AS INT) AS shard,
        |count(DISTINCT text) AS n_distinct
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q43_salted_join" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, count(*) AS n_lines,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 100000.0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q39_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5,
        |CAST(len(regexp_extract_all(text, '[^\s.,!?;:]+|[.,!?;:]', 0))
        |AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // batch equivalent of the watermarked stream-stream join: the
    // verification input is single-batch (no late data), so the
    // streaming pair set equals the batch time-range self-join exactly
    "q49_stream_join" ->
      """SELECT c.user_id AS user_id, count(*) AS n_pairs
        |FROM events c JOIN events p
        |ON c.user_id = p.user_id
        |AND c.event_type = 'click' AND p.event_type = 'purchase'
        |AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTES
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the gate's contract IS the anti-join (bloom false positives are
    // removed by the exact verify): same corpus/batch construction,
    // text equality standing in for the 64-bit fingerprints (the q17
    // collision argument)
    "q140_bloom_gate" ->
      """WITH corpus AS (SELECT text FROM documents WHERE doc_id < 450),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 450
        |  UNION ALL
        |  SELECT doc_id + 1000, text FROM documents WHERE doc_id < 30)
        |SELECT b.doc_id FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
        |ORDER BY doc_id""".stripMargin,

    // identical seeded-md5 bucket (first 8 hex chars mod dim) and
    // sign (9th hex digit parity) per feature column, summed per
    // bucket; a NULL feature falls to the ELSE 0 branch in both
    // engines
    "q138_feature_hash" -> featureHashOracleSql(dim = 16, seed = 7L),

    // scaler replay: exact min/max + the q135 exact-variance sums in
    // one CTE, then the identical fixed-order double expressions —
    // the engine bakes the same stats in as driver literals
    "q139_fitted_scaler" ->
      """WITH st AS (SELECT
        |  min(l_quantity) AS mn_q, max(l_quantity) AS mx_q,
        |  min(l_extendedprice) AS mn_p, max(l_extendedprice) AS mx_p,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s_q,
        |  CAST(sum(CAST(l_quantity*l_quantity AS DECIMAL(28,8)))
        |    AS DOUBLE) AS ssq_q,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS s_p,
        |  CAST(sum(CAST(l_extendedprice*l_extendedprice
        |    AS DECIMAL(28,8))) AS DOUBLE) AS ssq_p
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  (l_quantity - mn_q)/(mx_q - mn_q) AS l_quantity_minmax,
        |  round((l_quantity - s_q/n)/sqrt((ssq_q - s_q*s_q/n)/(n-1)), 9)
        |    AS l_quantity_z,
        |  (l_extendedprice - mn_p)/(mx_p - mn_p)
        |    AS l_extendedprice_minmax,
        |  round((l_extendedprice - s_p/n)
        |    /sqrt((ssq_p - s_p*s_p/n)/(n-1)), 9)
        |    AS l_extendedprice_z
        |FROM lineitem CROSS JOIN st
        |ORDER BY l_orderkey, l_linenumber, l_quantity_minmax,
        |  l_extendedprice_minmax LIMIT 100""".stripMargin,

    // the outer twin: per-user clicks / matched pairs / unmatched
    // clicks — the purchase-side predicates live in the ON clause so
    // unmatched clicks survive with nulls
    "q137_stream_outer_join" ->
      """SELECT c.user_id AS user_id, count(*) AS n_rows,
        |count(p.ts) AS n_matched,
        |CAST(sum(CASE WHEN p.ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_unmatched
        |FROM events c LEFT JOIN events p
        |ON c.user_id = p.user_id AND p.event_type = 'purchase'
        |AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTES
        |WHERE c.event_type = 'click'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q50_cube" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_cust,
        |CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    // the oracle recomputes the exact side and expects the sketch to
    // have landed in-bound (flag 1); the sketch value itself is not
    // cross-engine comparable, its error is
    "q51_approx_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact,
        |1 AS within_10pct
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q52_approx_percentile" ->
      """SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.5) AS p50_exact, 1 AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // bucketing is pure physical layout — the oracle is the plain join
    "q53_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the hash-mod sampling arithmetic is plain BIGINT — bit-identical
    // across engines (the whole point of reproducible sampling)
    "q54_sample_split" ->
      """SELECT lang,
        |CASE WHEN (doc_id * 1099087573) % 10 < 8
        |THEN 'train' ELSE 'test' END AS split,
        |count(*) AS n_docs
        |FROM documents
        |WHERE (doc_id * 2654435761) % 100 <
        |(CASE WHEN lang = 'en' THEN 20 ELSE 50 END)
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q55_pivot" ->
      """SELECT o_orderpriority,
        |count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q56_window_running" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |lag(o_totalprice) OVER w AS prev_price,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |AS run_sum
        |FROM orders WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_custkey
        |ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q57_tfidf_top_terms" ->
      """WITH tok AS (
        |SELECT lang, doc_id,
        |unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS term
        |FROM documents),
        |t AS (SELECT * FROM tok WHERE term <> ''),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |tf AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY 1,2),
        |df AS (SELECT term, count(*) AS df FROM
        |(SELECT DISTINCT doc_id, term FROM t) GROUP BY 1),
        |scored AS (SELECT lang, tf.term AS term,
        |round(tf * ln(n_docs / df), 6) AS score
        |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        |SELECT lang, CAST(rn AS INT) AS rn, term, score FROM (
        |SELECT lang, term, score, row_number() OVER
        |(PARTITION BY lang ORDER BY score DESC, term) AS rn FROM scored)
        |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,

    // compaction is content-preserving — oracle aggregates the
    // ORIGINAL table; the query aggregates the compacted copy
    // sums CAST to BIGINT: DuckDB's sum over INTEGER is HUGEINT, which
    // the harness hashes differently than Spark's int64 even when the
    // values are identical (r4: rows+schema matched, hash didn't)
    "q58_compact_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |CAST(sum(length(text)) AS BIGINT) AS sum_len
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // hot-key salting is pure physical rebalancing — same plain join
    // as the q43 oracle
    "q59_hotkey_join" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, count(*) AS n_lines,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 100000.0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q60_global_sort" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,

    "q61_latest_event" -> latestEventOracle,

    // the streaming materialization answers to the SAME latest-per-key
    // oracle: the snapshot after the last micro-batch IS q61's answer
    "q144_stream_upsert" -> latestEventOracle,

    "q62_json_extract" ->
      """SELECT event_type, count(*) AS n_events,
        |count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q64_string_agg" ->
      """SELECT lang, count(*) AS n_docs,
        |array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 5), ',')
        |AS first_ids
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q65_partitioned_write" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
        |count(*) AS n_events,
        |CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // dedup keyed on text (not the engine's xxhash64 — DuckDB lacks it);
    // identical keepers under the standard 64-bit no-collision assumption
    "q63_curation_pipeline" ->
      """WITH kept AS (
        |SELECT min(doc_id) AS doc_id FROM documents
        |WHERE lang IN ('en','de','fr') AND n_chars BETWEEN 60 AND 400
        |GROUP BY text),
        |s AS (SELECT d.lang, d.text FROM documents d JOIN kept USING (doc_id)
        |WHERE (doc_id * 2654435761) % 100 < 70)
        |SELECT lang, count(*) AS n_docs,
        |CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT)
        |AS sum_tokens
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // q17's pair graph (the SAME interpolated CTE — see
    // jaccardPairsCte), then components as a recursive transitive-
    // closure fixpoint: reach(id, r) = "r reaches id"; the component
    // label is min(reachable id), exactly the min-label fixpoint the
    // distributed loop converges to
    "q66_dedup_components" ->
      s"""WITH RECURSIVE $jaccardPairsCte,
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |UNION SELECT id_b, id_a FROM pairs),
         |reach AS (SELECT src AS id, src AS r FROM edges
         |UNION
         |SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
         |SELECT id AS doc_id, min(r) AS component FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    // same left-to-right double fold as VecSqDist (the q16/q08 proven
    // device, here with both vectors as columns); row_number with the
    // (dist, id) tiebreak mirrors the aggregator's ordering exactly
    "q68_knn_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS cand_id, embedding AS ce
        |FROM embeddings WHERE vec_id >= 10),
        |d AS (SELECT query_id, cand_id,
        |list_sum(list_transform(list_zip(ce, qe),
        |p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
        |(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
        |FROM c, q),
        |r AS (SELECT query_id, cand_id, dist,
        |row_number() OVER (PARTITION BY query_id ORDER BY dist, cand_id) AS rn
        |FROM d)
        |SELECT query_id, CAST(rn AS BIGINT) AS nb_rank,
        |cand_id AS neighbor_id, dist
        |FROM r WHERE rn <= 3 ORDER BY query_id, nb_rank""".stripMargin,

    // plain theta overlap join — DuckDB's IEJoin handles it; the
    // engine's binned form must produce the identical pair multiset
    "q70_interval_join" ->
      """WITH u AS (SELECT user_id, date_trunc('day', ts) AS d,
        |min(epoch_us(ts)) AS u_lo, max(epoch_us(ts)) + 1 AS u_hi
        |FROM events GROUP BY 1,2),
        |t AS (SELECT event_type, date_trunc('day', ts) AS d2,
        |min(epoch_us(ts)) AS t_lo, max(epoch_us(ts)) + 1 AS t_hi
        |FROM events GROUP BY 1,2)
        |SELECT event_type, count(*) AS n_overlaps
        |FROM u JOIN t ON u_lo < t_hi AND t_lo < u_hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // dense grid via generate_series; IGNORE NULLS last_value is the
    // forward fill; arg_max mirrors the engine's max_by gauge
    "q71_gap_fill" ->
      """WITH daily AS (
        |SELECT user_id, date_trunc('day', ts)::DATE AS d, count(*) AS n_ev,
        |arg_max(event_type, event_id) AS last_type
        |FROM events GROUP BY 1,2),
        |spans AS (SELECT user_id, min(d) AS lo, max(d) AS hi
        |FROM daily GROUP BY 1),
        |grid AS (SELECT user_id,
        |unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        |FROM spans),
        |filled AS (SELECT g.user_id, g.d, daily.n_ev,
        |last_value(daily.last_type IGNORE NULLS) OVER (
        |PARTITION BY g.user_id ORDER BY g.d
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
        |FROM grid g LEFT JOIN daily
        |ON g.user_id = daily.user_id AND g.d = daily.d)
        |SELECT carried AS carried_type, count(*) AS n_gap_days,
        |count(DISTINCT user_id) AS n_users
        |FROM filled WHERE n_ev IS NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    // same boundary definition on both engines (quantile_cont ≡ Spark
    // percentile, bit-identical interpolation), same lower-bucket tie
    // rule — the oracle replicates the DEFINITION, not ntile()
    "q72_quantile_bucket" ->
      """WITH b AS (SELECT quantile_cont(n_chars,
        |[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM documents)
        |SELECT bucket, count(*) AS n_docs,
        |round(avg(n_chars), 2) AS avg_chars
        |FROM (SELECT n_chars, 1
        |+ (n_chars > qs[1])::INT + (n_chars > qs[2])::INT
        |+ (n_chars > qs[3])::INT + (n_chars > qs[4])::INT
        |+ (n_chars > qs[5])::INT + (n_chars > qs[6])::INT
        |+ (n_chars > qs[7])::INT + (n_chars > qs[8])::INT
        |+ (n_chars > qs[9])::INT AS bucket FROM documents, b)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the layout never changes results: the oracle is the plain
    // filter+aggregate over the original table
    "q73_zorder_scan" ->
      """SELECT l_suppkey, count(*) AS n_rows,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |AS sum_price
        |FROM lineitem WHERE l_partkey <= 200 AND l_suppkey <= 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // WHERE runs before the window in the same SELECT, so the lead()
    // in c is over change rows only — same two-step as the engine
    "q74_scd2" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |lag(event_type) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id) AS prev FROM events),
        |c AS (SELECT user_id, event_type, ts AS valid_from,
        |lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |AS valid_to
        |FROM o WHERE prev IS NULL OR prev <> event_type)
        |SELECT event_type, count(*) AS n_intervals,
        |count(valid_to) AS n_closed,
        |CAST(sum(CASE WHEN valid_to IS NOT NULL THEN
        |epoch_us(valid_to) - epoch_us(valid_from) END) AS BIGINT)
        |AS dur_us
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same stage-chained min-aggregate cascade; strict > makes
    // equal-timestamp "progress" impossible on both engines
    "q75_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |JOIN s1 USING (user_id)
        |WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |JOIN s2 USING (user_id)
        |WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        |SELECT * FROM (
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |count(*) AS n_keys FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
        |UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3)
        |ORDER BY step""".stripMargin,

    // explicit per-metric UNION — the reshape definition, engine-agnostic
    "q76_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |AS sum_price,
        |CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
        |FROM lineitem GROUP BY 1)
        |SELECT * FROM (
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc', sum_disc FROM w)
        |ORDER BY l_returnflag, metric""".stripMargin,

    // per-column audit rows written out longhand; HUGEINT sums CAST
    "q77_profile" ->
      """WITH ev AS (SELECT user_id, event_type, props,
        |CASE WHEN value >= 2.0 THEN value END AS value_hi FROM events)
        |SELECT * FROM (
        |SELECT 'event_type' AS col_name,
        |CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |AS n_nulls, count(DISTINCT event_type) AS n_distinct FROM ev
        |UNION ALL SELECT 'props',
        |CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |count(DISTINCT props) FROM ev
        |UNION ALL SELECT 'user_id',
        |CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |count(DISTINCT user_id) FROM ev
        |UNION ALL SELECT 'value_hi',
        |CAST(sum(CASE WHEN value_hi IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |count(DISTINCT value_hi) FROM ev)
        |ORDER BY col_name""".stripMargin,

    // the merged read is definitionally the base table with `value`
    // nulled on even event_ids
    "q78_evolution" ->
      """SELECT event_type, count(*) AS n_rows,
        |count(CASE WHEN event_id % 2 = 1 THEN value END) AS n_with_value,
        |CAST(sum(CAST(CASE WHEN event_id % 2 = 1 THEN value ELSE 0 END
        |AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // one row kept per user (single-batch ≡ global dedup) → the shard
    // histogram is a COUNT(DISTINCT user_id) per shard
    "q69_stream_dedup_bounded" ->
      """SELECT CAST(user_id % 16 AS BIGINT) AS shard,
        |count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // integer-exact micros arithmetic; LEFT JOIN + count(b) keeps the
    // zero-match events the engine's left join back preserves
    "q67_range_join" ->
      """SELECT a.event_id, count(b.event_id) AS n_prior_5min
        |FROM events a LEFT JOIN events b
        |ON epoch_us(b.ts) >= epoch_us(a.ts) - 300000000
        |AND epoch_us(b.ts) < epoch_us(a.ts)
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,

    // identical injection, identical Java∩RE2 patterns, 'g' flag so
    // DuckDB replaces every span the way Spark does
    "q79_redact_pii" ->
      """WITH inj AS (SELECT doc_id,
        |'contact user' || CAST(doc_id AS VARCHAR) ||
        |'@mail.example or call 555-01' ||
        |lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' ' || text AS t
        |FROM documents)
        |SELECT doc_id,
        |regexp_replace(regexp_replace(t,
        |'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |'\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted,
        |CAST(len(regexp_extract_all(t,
        |'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |len(regexp_extract_all(regexp_replace(t,
        |'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |'\b\d{3}-\d{4}\b')) AS BIGINT) AS n_pii
        |FROM inj ORDER BY doc_id""".stripMargin,

    // the oracle may use the shuffle form (unnest + group by) the
    // engine deliberately avoids — only the VALUES must match
    "q80_repetition" ->
      """WITH d AS (SELECT doc_id,
        |CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |ELSE string_split_regex(trim(text), '\s+') END AS l
        |FROM documents),
        |base AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
        |CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct FROM d),
        |g AS (SELECT doc_id,
        |list_extract(l, i) || ' ' || list_extract(l, i + 1) AS bg
        |FROM d CROSS JOIN UNNEST(generate_series(1, len(l) - 1)) t(i)),
        |top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n
        |FROM (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY 1, 2)
        |GROUP BY 1)
        |SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |coalesce(t.top_bigram_n, 0) AS top_bigram_n,
        |(b.n_tokens > 1 AND b.n_distinct * 5 >= b.n_tokens * 2 AND
        |coalesce(t.top_bigram_n, 0) * 10 <= greatest(b.n_tokens - 1, 0))
        |AS keep
        |FROM base b LEFT JOIN top t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // string-gram join (no xxhash64 in DuckDB) — equal to the engine's
    // hashed join under the standard 64-bit no-collision assumption
    "q81_decontaminate" ->
      """WITH d AS (SELECT doc_id,
        |CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |ELSE string_split_regex(trim(text), '\s+') END AS l
        |FROM documents),
        |g AS (SELECT doc_id, list_extract(l, i) || ' ' ||
        |list_extract(l, i + 1) || ' ' || list_extract(l, i + 2) || ' ' ||
        |list_extract(l, i + 3) || ' ' || list_extract(l, i + 4) AS ng
        |FROM d CROSS JOIN UNNEST(generate_series(1, len(l) - 4)) t(i)),
        |te AS (SELECT DISTINCT ng FROM g WHERE doc_id % 50 = 0),
        |tr AS (SELECT DISTINCT doc_id, ng FROM g WHERE doc_id % 50 != 0)
        |SELECT tr.doc_id, count(*) AS n_shared
        |FROM tr JOIN te USING (ng)
        |GROUP BY 1 HAVING count(*) >= 3 ORDER BY doc_id""".stripMargin,

    // 1-based list ops: chunk start st = 1, 49, 97, ... <= n_tokens;
    // list_slice's inclusive end clamps exactly like Spark's slice
    "q82_token_chunks" ->
      """WITH d AS (SELECT doc_id,
        |CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |ELSE string_split_regex(trim(text), '\s+') END AS l
        |FROM documents),
        |s AS (SELECT doc_id, l,
        |UNNEST(generate_series(1, len(l), 48)) AS st
        |FROM d WHERE len(l) > 0)
        |SELECT doc_id, CAST((st - 1) // 48 AS BIGINT) AS chunk_id,
        |CAST(len(list_slice(l, st, st + 63)) AS BIGINT) AS n_tokens,
        |array_to_string(list_slice(l, st, st + 63), ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    // the same greedy first-fit fold, replayed sequentially per bucket
    // by a recursive CTE stepping rn -> rn+1 (MATERIALIZED: d is
    // referenced from both the base and the recursive arm, and WITH
    // RECURSIVE re-inlines multiply-referenced CTEs)
    "q83_pack_sequences" ->
      """WITH RECURSIVE d AS MATERIALIZED (
        |SELECT doc_id % 8 AS bucket, doc_id,
        |CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
        |AS n_tokens,
        |row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
        |AS rn FROM documents),
        |p AS (
        |SELECT bucket, doc_id, n_tokens, rn,
        |CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
        |FROM d WHERE rn = 1
        |UNION ALL
        |SELECT d.bucket, d.doc_id, d.n_tokens, d.rn,
        |CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > 256
        |THEN p.pack_id + 1 ELSE p.pack_id END,
        |CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > 256
        |THEN d.n_tokens ELSE p.fill + d.n_tokens END
        |FROM d JOIN p ON d.bucket = p.bucket AND d.rn = p.rn + 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket, doc_id, n_tokens,
        |pack_id FROM p ORDER BY bucket, doc_id""".stripMargin,

    // roundtrip is content-preserving: the oracle reads the ORIGINAL
    // table; the query reads the JSONL copy it just wrote
    "q84_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // identical injection (chr 769 = combining acute, 9 = tab, 7 =
    // BEL) and identical Java∩RE2 patterns; nfc_normalize is DuckDB's
    // NFC twin of the engine's Normalizer UDF
    "q86_normalize" ->
      """WITH inj AS (SELECT doc_id,
        |text || ' cafe' || chr(769) || chr(9) || chr(7) || 'end' AS t
        |FROM documents)
        |SELECT doc_id,
        |nfc_normalize(trim(regexp_replace(regexp_replace(t,
        |'[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_text
        |FROM inj ORDER BY doc_id""".stripMargin,

    // exact delta×corpus near-dup pairs, the q33 oracle restricted to
    // the ingest split (predicates push into the join sides, so this
    // stays delta×corpus, not n²)
    "q87_minhash_probe" -> minhashProbeOracle,

    // append ≡ rebuild: the probe over the appended index answers to
    // the identical full-corpus pair oracle
    "q145_minhash_append" -> minhashProbeOracle,

    // exact token counts with the same threshold arithmetic; the
    // engine's Misra-Gries pass only ever over-generates candidates,
    // so its exact recount must equal the direct group-count
    "q88_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text),
        |'\s+')) AS tok FROM documents),
        |t AS (SELECT tok FROM toks WHERE tok <> ''),
        |n AS (SELECT count(*) AS total FROM t)
        |SELECT tok, count(*) AS cnt FROM t, n GROUP BY tok, n.total
        |HAVING count(*) >= CAST(ceil(0.001 * n.total) AS BIGINT)
        |ORDER BY cnt DESC, tok""".stripMargin,

    "q89_seeded_shuffle" ->
      """SELECT doc_id, md5('42-' || doc_id) AS skey,
        |CAST(('0x' || substr(md5('42-' || doc_id), 1, 8)) AS BIGINT) % 8
        |AS shard
        |FROM documents ORDER BY skey""".stripMargin,

    // BM25 replicated with the identical IEEE expression tree; the
    // 9-dp-round + DECIMAL-sum device makes the per-doc score
    // order-independent, so the 6-dp result hash-matches
    "q92_bm25_topk" ->
      """WITH tok AS (SELECT doc_id,
        |unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS term
        |FROM documents),
        |t AS (SELECT * FROM tok WHERE term <> ''),
        |dl AS (SELECT doc_id, count(*) AS dlen FROM t GROUP BY 1),
        |st AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE)
        |AS n_docs,
        |CAST((SELECT sum(dlen) FROM dl) AS DOUBLE) /
        |CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
        |WHERE term IN ('dup', 'spark', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |(tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen / avgdl)),
        |9) AS ts
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        |CROSS JOIN st)
        |SELECT doc_id,
        |round(CAST(sum(CAST(ts AS DECIMAL(28,9))) AS DOUBLE), 6) AS score
        |FROM sc GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // RRF fusion of the q92 BM25 list and the q16 dense list, both at
    // top-50. Ranks are integers; each reciprocal is one DOUBLE
    // division and the fused sum is two terms in fixed order, so the
    // score is bit-identical across engines. CASTs keep DuckDB off
    // its DECIMAL-literal arithmetic path.
    "q93_hybrid_rrf" ->
      """WITH tok AS (SELECT doc_id,
        |unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS term
        |FROM documents),
        |t AS (SELECT * FROM tok WHERE term <> ''),
        |dl AS (SELECT doc_id, count(*) AS dlen FROM t GROUP BY 1),
        |st AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE)
        |AS n_docs,
        |CAST((SELECT sum(dlen) FROM dl) AS DOUBLE) /
        |CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
        |WHERE term IN ('dup', 'spark', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |(tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen / avgdl)),
        |9) AS ts
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        |CROSS JOIN st),
        |bm AS (SELECT doc_id,
        |round(CAST(sum(CAST(ts AS DECIMAL(28,9))) AS DOUBLE), 6) AS score
        |FROM sc GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 50),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |dn AS (SELECT e.vec_id AS doc_id,
        |list_sum(list_transform(list_zip(e.embedding, q.qe),
        |p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS score
        |FROM embeddings e, qv q ORDER BY score DESC, e.vec_id LIMIT 50),
        |rs AS (SELECT doc_id,
        |row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
        |rd AS (SELECT doc_id,
        |row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM dn)
        |SELECT COALESCE(rs.doc_id, rd.doc_id) AS doc_id,
        |COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + rs.r AS DOUBLE),
        |CAST(0.0 AS DOUBLE)) +
        |COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + rd.r AS DOUBLE),
        |CAST(0.0 AS DOUBLE)) AS rrf
        |FROM rs FULL OUTER JOIN rd ON rs.doc_id = rd.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // PMI with the identical fixed association of exact-in-double
    // products ((cxy*nu)*nu / ((nb*cx)*cy)); counts are exact longs in
    // both engines so the 9-dp-rounded doubles hash-match
    "q94_collocations" ->
      """WITH ta AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
        |t -> t <> '') AS a FROM documents),
        |tok AS (SELECT doc_id, unnest(a) AS term,
        |generate_subscripts(a, 1) AS pos FROM ta),
        |bg AS (SELECT x.term AS w1, y.term AS w2 FROM tok x
        |JOIN tok y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1),
        |cb AS (SELECT w1, w2, count(*) AS cxy FROM bg GROUP BY 1, 2),
        |cu AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST((SELECT count(*) FROM tok) AS DOUBLE) AS nu,
        |CAST((SELECT count(*) FROM bg) AS DOUBLE) AS nb)
        |SELECT w1, w2, cxy AS pair_count,
        |round(ln(((CAST(cxy AS DOUBLE) * nu) * nu) /
        |((nb * CAST(cx.c AS DOUBLE)) * CAST(cy.c AS DOUBLE))), 9) AS pmi
        |FROM cb JOIN cu cx ON cb.w1 = cx.term
        |JOIN cu cy ON cb.w2 = cy.term CROSS JOIN tot
        |WHERE cxy >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    // PQ replica: one recursive-CTE Lloyd fit per 16-dim subspace
    // (bit-exact by the q30/q40 5-dp-round device), encode via the
    // same lowest-cluster-tie argmin, ADC as the identical
    // fixed-association sum of four double sub-distances. cents are
    // MATERIALIZED: multiply-referenced CTEs inside WITH RECURSIVE
    // otherwise re-run per reference.
    "q95_pq_adc" -> {
      def sl(base: String, j: Int) =
        s"list_slice($base, ${j * 16 + 1}, ${j * 16 + 16})"
      val fits = (0 until 4).map { j =>
        sqlKMeansIterCte(16, 16, 4, 1e-4,
          vecExpr = sl("embedding", j), cteName = s"it$j")
      }.mkString(",\n")
      val cents = (0 until 4).map { j =>
        s"cents$j AS MATERIALIZED (SELECT cluster, c FROM it$j " +
          s"WHERE it = (SELECT max(it) FROM it$j))"
      }.mkString(",\n")
      val lats = (0 until 4).map { j =>
        s"""CROSS JOIN LATERAL (SELECT w.cluster FROM cents$j w
           |ORDER BY ${sqlSqDistCols(sl("p.embedding", j), "w.c")},
           |w.cluster LIMIT 1) d$j""".stripMargin
      }.mkString("\n")
      val luts = (0 until 4).map { j =>
        s"lut$j AS (SELECT w.cluster, " +
          s"${sqlSqDistCols(sl("q.qe", j), "w.c")} AS d " +
          s"FROM cents$j w, qv q)"
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |$fits,
         |$cents,
         |qv AS MATERIALIZED (SELECT embedding AS qe FROM embeddings
         |  WHERE vec_id = 0),
         |enc AS (SELECT p.vec_id, d0.cluster AS c0, d1.cluster AS c1,
         |d2.cluster AS c2, d3.cluster AS c3
         |FROM embeddings p
         |$lats),
         |$luts
         |SELECT enc.vec_id, ((l0.d + l1.d) + l2.d) + l3.d AS adist
         |FROM enc
         |JOIN lut0 l0 ON l0.cluster = enc.c0
         |JOIN lut1 l1 ON l1.cluster = enc.c1
         |JOIN lut2 l2 ON l2.cluster = enc.c2
         |JOIN lut3 l3 ON l3.cluster = enc.c3
         |ORDER BY adist, enc.vec_id LIMIT 10""".stripMargin
    },

    // IVF-PQ replica: q40's coarse fit + probed-cells candidate CTE
    // composed with q95's four subspace fits and ADC. Everything
    // multiply-referenced is MATERIALIZED (WITH RECURSIVE re-runs
    // inlined CTEs per reference).
    "q96_ivfpq" -> {
      def sl(base: String, j: Int) =
        s"list_slice($base, ${j * 16 + 1}, ${j * 16 + 16})"
      val subFits = (0 until 4).map { j =>
        sqlKMeansIterCte(16, 16, 4, 1e-4,
          vecExpr = sl("embedding", j), cteName = s"it$j")
      }.mkString(",\n")
      val cents = (0 until 4).map { j =>
        s"cents$j AS MATERIALIZED (SELECT cluster, c FROM it$j " +
          s"WHERE it = (SELECT max(it) FROM it$j))"
      }.mkString(",\n")
      val lats = (0 until 4).map { j =>
        s"""CROSS JOIN LATERAL (SELECT w.cluster FROM cents$j w
           |ORDER BY ${sqlSqDistCols(sl("p.embedding", j), "w.c")},
           |w.cluster LIMIT 1) d$j""".stripMargin
      }.mkString("\n")
      val luts = (0 until 4).map { j =>
        s"lut$j AS (SELECT w.cluster, " +
          s"${sqlSqDistCols(sl("q.qe", j), "w.c")} AS d " +
          s"FROM cents$j w, qv q)"
      }.mkString(",\n")
      s"""WITH RECURSIVE ${sqlKMeansIterCte(8, 64, 6, 1e-4)},
         |$subFits,
         |coarse AS MATERIALIZED (SELECT cluster, c FROM iter
         |  WHERE it = (SELECT max(it) FROM iter)),
         |$cents,
         |qv AS MATERIALIZED (SELECT embedding AS qe FROM embeddings
         |  WHERE vec_id = 0),
         |probed AS (SELECT coarse.cluster FROM coarse, qv q
         |  ORDER BY ${sqlSqDistCols("q.qe", "coarse.c")}, coarse.cluster
         |  LIMIT 3),
         |cand AS MATERIALIZED (
         |  SELECT a.vec_id, a.embedding
         |  FROM (SELECT p.vec_id, p.embedding, d.cluster
         |        FROM embeddings p
         |        CROSS JOIN LATERAL (
         |          SELECT c2.cluster FROM coarse c2
         |          ORDER BY ${sqlSqDistCols("p.embedding", "c2.c")},
         |          c2.cluster
         |          LIMIT 1) d) a
         |  JOIN probed USING (cluster)),
         |enc AS (SELECT p.vec_id, d0.cluster AS c0, d1.cluster AS c1,
         |d2.cluster AS c2, d3.cluster AS c3
         |FROM cand p
         |$lats),
         |$luts
         |SELECT enc.vec_id, ((l0.d + l1.d) + l2.d) + l3.d AS adist
         |FROM enc
         |JOIN lut0 l0 ON l0.cluster = enc.c0
         |JOIN lut1 l1 ON l1.cluster = enc.c1
         |JOIN lut2 l2 ON l2.cluster = enc.c2
         |JOIN lut3 l3 ON l3.cluster = enc.c3
         |ORDER BY adist, enc.vec_id LIMIT 10""".stripMargin
    },

    // outliers: q40's coarse fit, assigned distance = the lateral min
    // (same double as Spark's least-over-VecSqDist), 9-dp rounded
    // BEFORE ranking in both engines; the window-rank form here is the
    // oracle for the engine's bounded-TopK aggregation
    "q97_cluster_outliers" ->
      s"""WITH RECURSIVE ${sqlKMeansIterCte(8, 64, 6, 1e-4)},
         |cents AS MATERIALIZED (SELECT cluster, c FROM iter
         |  WHERE it = (SELECT max(it) FROM iter)),
         |asg AS (SELECT p.vec_id, d.cluster, round(sqrt(d.sq), 9) AS dist
         |  FROM embeddings p
         |  CROSS JOIN LATERAL (
         |    SELECT w.cluster, ${sqlSqDistCols("p.embedding", "w.c")} AS sq
         |    FROM cents w
         |    ORDER BY ${sqlSqDistCols("p.embedding", "w.c")}, w.cluster
         |    LIMIT 1) d),
         |r AS (SELECT vec_id, cluster, dist,
         |  row_number() OVER (PARTITION BY cluster
         |    ORDER BY dist DESC, vec_id) AS rn FROM asg)
         |SELECT cluster, vec_id, dist FROM r WHERE rn <= 10
         |ORDER BY cluster, dist DESC, vec_id""".stripMargin,

    // PageRank fixpoint replica: the recursive arm carries every
    // node's rank forward; contributions are 12-dp-rounded and summed
    // as DECIMAL(38,12) (exact, associative — the partition-order
    // device), the damped update is the identical fixed-association
    // double tree rounded to 9 dp, so every iteration is bit-identical
    // to the engine's loop
    "q98_pagerank" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM base
        |  UNION ALL SELECT p, c FROM base),
        |od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e
        |  GROUP BY 1),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n
        |  FROM nodes),
        |pr AS (
        |  SELECT 0 AS it, node,
        |    CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
        |  FROM nodes
        |  UNION ALL
        |  SELECT old.it + 1, old.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
        |        / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE) * CAST(coalesce(agg.s, 0) AS DOUBLE),
        |      9)
        |  FROM pr old
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(w.rank / CAST(od.outdeg AS DOUBLE), 12)
        |        AS DECIMAL(38,12))) AS s
        |    FROM pr w JOIN e ON e.src = w.node JOIN od ON od.src = e.src
        |    GROUP BY e.dst
        |  ) agg ON agg.node = old.node
        |  WHERE old.it + 1 <= 10
        |)
        |SELECT node, rank FROM pr WHERE it = 10
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin,

    // (user, day) is distinct and each user has one cohort day, so the
    // matrix count(*) is a distinct-user count in both engines
    "q99_retention" ->
      """WITH fd AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY 1),
        |ad AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events)
        |SELECT fd.cohort_day,
        |CAST(datediff('day', fd.cohort_day, ad.day) AS BIGINT)
        |AS offset_days, count(*) AS users
        |FROM ad JOIN fd USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // A-ES with the q89 hex-parse device; ln is the one libm call
    // (parity established by q92's idf), key rounded to 9 dp
    "q100_weighted_sample" ->
      """SELECT doc_id,
        |CAST(greatest(n_chars, 1) AS DOUBLE) AS weight,
        |round(ln(CAST(CAST(('0x' || substr(md5('1337-' || doc_id), 1, 15))
        |  AS BIGINT) + 1 AS DOUBLE)
        |  / CAST(1152921504606846976 AS DOUBLE)), 9)
        |  / CAST(greatest(n_chars, 1) AS DOUBLE) AS skey
        |FROM documents ORDER BY skey DESC, doc_id LIMIT 50""".stripMargin,

    // bigram LM: identical Laplace tree ((cxy+1)/(cx+V), one ln),
    // 9-dp-round + DECIMAL-sum per doc, 6-dp mean — the q92 device
    "q101_lm_score" ->
      """WITH ta AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
        |t -> t <> '') AS a FROM documents),
        |tok AS (SELECT doc_id, unnest(a) AS term,
        |generate_subscripts(a, 1) AS pos FROM ta),
        |bg AS (SELECT x.doc_id, x.term AS w1, y.term AS w2 FROM tok x
        |JOIN tok y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1),
        |cb AS (SELECT w1, w2, count(*) AS cxy FROM bg GROUP BY 1, 2),
        |cu AS (SELECT w1, count(*) AS cx FROM bg GROUP BY 1),
        |vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM cu),
        |sc AS (SELECT bg.doc_id,
        |CAST(round(ln((CAST(cxy AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |  / (CAST(cx AS DOUBLE) + v)), 9) AS DECIMAL(28,9)) AS l
        |FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN vv)
        |SELECT doc_id, count(*) AS n_bigrams,
        |round(CAST(sum(l) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |AS avg_lp
        |FROM sc GROUP BY doc_id
        |ORDER BY avg_lp, doc_id""".stripMargin,

    // q98's 10-iteration recursive-CTE replay, plus the dangling term:
    // dm = (DOUBLE)(Σ DECIMAL(38,12) round(rank,12) over sinks) / N,
    // cross-joined into every node's damped update — the third
    // reference to the recursive table is fine in DuckDB
    "q102_pagerank_directed" -> pagerankDirectedOracle,

    // the distributed-rank-table body computes the SAME fixpoint
    // (GraphSpec bit-identity), so it answers to the same oracle
    "q107_pagerank_dist" -> pagerankDirectedOracle,

    // epsilon stop: the oracle derives the stop round from the data
    // (first round with max |Δrank| <= eps, else the cap), so engine
    // and oracle agree at any sf by construction
    "q111_pagerank_eps" -> pagerankEpsilonOracle,

    // append ≡ rebuild: the appended artifact covers the SAME full
    // edge set as q102, so the same recursive-CTE replay is the oracle
    "q130_graph_append" -> pagerankDirectedOracle,

    // the DECIMAL windowed sum is frame-order-exact in both engines;
    // lag is an exact pass-through and the mean one double division
    "q131_rolling_features" ->
      """SELECT user_id, event_id,
        |  lag(value, 1) OVER w AS v_lag1,
        |  count(*) OVER wf AS roll_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER wf AS DOUBLE)
        |    / count(*) OVER wf AS roll_mean
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // category sums exact DECIMAL; (S − x) stays DECIMAL and only the
    // final division touches doubles — bit-identical cross-engine
    "q132_target_encode" ->
      """WITH st AS (SELECT event_type,
        |  sum(CAST(value AS DECIMAL(18,4))) AS s, count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type,
        |  CASE WHEN st.n = 1 THEN NULL
        |  ELSE CAST(st.s - CAST(e.value AS DECIMAL(18,4)) AS DOUBLE)
        |    / (st.n - 1) END AS loo
        |FROM events e JOIN st USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    // exact-variance replay: DECIMAL sums of x and x² (2-dp inputs →
    // both lossless), then the identical fixed-order double
    // expressions — no rounding device needed anywhere
    "q135_zscore_outliers" ->
      """WITH st AS (SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |  CAST(sum(CAST(value*value AS DECIMAL(28,8))) AS DOUBLE)
        |    AS ssq
        |  FROM events GROUP BY 1),
        |sd AS (SELECT event_type, s/n AS m,
        |  sqrt((ssq - s*s/n)/(n - 1)) AS sd FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  (e.value - sd.m)/sd.sd AS z
        |FROM events e JOIN sd USING (event_type)
        |ORDER BY abs((e.value - sd.m)/sd.sd) DESC, e.event_id
        |LIMIT 20""".stripMargin,

    // the resized image's strip i is the EXACT source pixel 2i, so
    // the oracle replays the fixture recipe at the picked columns
    "q136_image_resize" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS strip,
        |CAST(CAST((doc_id*31 + 2*i*97) % 251 AS DOUBLE)/255.0 AS FLOAT)
        |AS lum
        |FROM documents CROSS JOIN range(0, 4) r(i)
        |ORDER BY media_id, strip""".stripMargin,

    // identical seeded-md5 coin on the GROUP key (8 hex chars ->
    // BIGINT, mod 100), bucket thresholds 80/90
    "q133_group_split" ->
      """WITH b AS (SELECT user_id,
        |  CAST(('0x' || substr(md5('31-' || user_id), 1, 8)) AS BIGINT)
        |    % 100 AS bk
        |  FROM events),
        |s AS (SELECT CASE WHEN bk < 80 THEN 'train'
        |  WHEN bk < 90 THEN 'valid' ELSE 'test' END AS split, user_id
        |  FROM b)
        |SELECT split, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS n_groups
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // 4-round Bellman–Ford replay: the zero-weight self-loop row in
    // `e` turns min(carry, relax) into ONE min over in-edges, so the
    // recursive term references `d` once; costs are exact
    // integer-valued doubles (1 + floor(100/count)) so min() is
    // engine-independent with no rounding device
    "q134_shortest_paths" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p,
        |  CAST(1 + floor(100.0 / count(*)) AS DOUBLE) AS w
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (
        |  SELECT c AS src, p AS dst, w FROM base
        |  UNION ALL SELECT p, c, w FROM base
        |  UNION ALL SELECT node, node, CAST(0 AS DOUBLE) FROM
        |    (SELECT DISTINCT c AS node FROM base
        |     UNION SELECT DISTINCT p FROM base)),
        |seeds AS MATERIALIZED (SELECT DISTINCT c AS node FROM base
        |  WHERE c <= 50),
        |d AS (
        |  SELECT 0 AS r, node, CAST(0 AS DOUBLE) AS dist FROM seeds
        |  UNION ALL
        |  SELECT d.r + 1, e.dst, min(d.dist + e.w) AS dist
        |  FROM d JOIN e ON e.src = d.node
        |  WHERE d.r < 4
        |  GROUP BY 1, 2)
        |SELECT node, min(dist) AS dist FROM d WHERE r = 4
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // PPR: reset weights r(v)=1/|S| on seed nodes (<=50) join every
    // damped update; dangling mass rides r too (NOT divided by N) —
    // same 12-dp DECIMAL / 9-dp round devices as the q102 replay
    "q113_ppr" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM base),
        |od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e
        |  GROUP BY 1),
        |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |dang AS MATERIALIZED (SELECT node FROM nodes
        |  WHERE node NOT IN (SELECT src FROM e)),
        |ks AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS k
        |  FROM nodes WHERE node <= 50),
        |rv AS MATERIALIZED (SELECT node,
        |  CASE WHEN node <= 50
        |  THEN CAST(1.0 AS DOUBLE) / (SELECT k FROM ks)
        |  ELSE CAST(0.0 AS DOUBLE) END AS r FROM nodes),
        |pr AS (
        |  SELECT 0 AS it, node, r AS rank FROM rv
        |  UNION ALL
        |  SELECT old.it + 1, old.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * rv.r
        |      + CAST(0.85 AS DOUBLE)
        |        * (CAST(coalesce(agg.s, 0) AS DOUBLE) + dm.v * rv.r),
        |      9)
        |  FROM pr old
        |  JOIN rv ON rv.node = old.node
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(w.rank / CAST(od.outdeg AS DOUBLE), 12)
        |        AS DECIMAL(38,12))) AS s
        |    FROM pr w JOIN e ON e.src = w.node JOIN od ON od.src = e.src
        |    GROUP BY e.dst
        |  ) agg ON agg.node = old.node
        |  CROSS JOIN (
        |    SELECT CAST(coalesce(sum(CAST(round(d.rank, 12)
        |        AS DECIMAL(38,12))), 0) AS DOUBLE) AS v
        |    FROM pr d JOIN dang ON dang.node = d.node
        |  ) dm
        |  WHERE old.it + 1 <= 10
        |)
        |SELECT node, rank FROM pr WHERE it = 10
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin,

    // Jacobi HITS: both scores from the previous round, 12-dp DECIMAL
    // gathers, L1 totals computed over the edge list (≡ the engine's
    // sum-of-per-node-sums — DECIMAL addition is associative), 9-dp
    // normalized scores
    "q114_hits" -> hitsCte(5,
      """SELECT node, auth, hub FROM hs WHERE it = 5
        |ORDER BY auth DESC, node LIMIT 20""".stripMargin),

    // q115: replay all 8 capped rounds, derive the stop round FROM THE
    // DATA (first round whose max over nodes of max(|Δauth|, |Δhub|)
    // <= eps — the engine's inclusive A7 boundary), emit that round
    "q115_hits_eps" -> hitsCte(8,
      """, del AS (SELECT a.it AS it,
        |  max(greatest(abs(a.auth - b.auth), abs(a.hub - b.hub)))
        |    AS delta
        |  FROM hs a JOIN hs b ON b.node = a.node AND b.it = a.it - 1
        |  GROUP BY a.it),
        |stp AS (SELECT coalesce(min(it), 8) AS r FROM del
        |  WHERE delta <= CAST(2e-4 AS DOUBLE))
        |SELECT node, auth, hub FROM hs CROSS JOIN stp
        |WHERE hs.it = stp.r
        |ORDER BY auth DESC, node LIMIT 20""".stripMargin),

    // weighted recursive-CTE replay: contribution rank·w/wout with
    // wout the 12-dp DECIMAL out-weight total — same dangling and
    // 9-dp damped-update devices as the q102 oracle
    "q116_pagerank_weighted" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p, CAST(count(*) AS DOUBLE) AS w
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT c AS src, p AS dst, w FROM base),
        |od AS MATERIALIZED (SELECT src,
        |  CAST(sum(CAST(round(w, 12) AS DECIMAL(38,12))) AS DOUBLE)
        |    AS wout
        |  FROM e GROUP BY 1),
        |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |dang AS MATERIALIZED (SELECT node FROM nodes
        |  WHERE node NOT IN (SELECT src FROM e)),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n
        |  FROM nodes),
        |pr AS (
        |  SELECT 0 AS it, node,
        |    CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
        |  FROM nodes
        |  UNION ALL
        |  SELECT old.it + 1, old.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
        |        / (SELECT n FROM nn)
        |      + CAST(0.85 AS DOUBLE)
        |        * (CAST(coalesce(agg.s, 0) AS DOUBLE) + dm.v),
        |      9)
        |  FROM pr old
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(pw.rank * e.w / od.wout, 12)
        |        AS DECIMAL(38,12))) AS s
        |    FROM pr pw JOIN e ON e.src = pw.node JOIN od ON od.src = e.src
        |    GROUP BY e.dst
        |  ) agg ON agg.node = old.node
        |  CROSS JOIN (
        |    SELECT CAST(coalesce(sum(CAST(round(d.rank, 12)
        |        AS DECIMAL(38,12))), 0) AS DOUBLE)
        |      / (SELECT n FROM nn) AS v
        |    FROM pr d JOIN dang ON dang.node = d.node
        |  ) dm
        |  WHERE old.it + 1 <= 10
        |)
        |SELECT node, rank FROM pr WHERE it = 10
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin,

    // Jacobi label propagation on the undirected (double-edged) feed:
    // per round each node takes the most frequent in-neighbor label
    // (max count, min label on ties — replayed as a max-count join +
    // min pick), keeping its own when it has no in-edges; all counts
    // exact longs, so no rounding device is needed
    "q117_label_prop" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM base
        |  UNION ALL SELECT p, c FROM base),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
        |lp AS (
        |  SELECT 0 AS it, node, node AS lbl FROM nodes
        |  UNION ALL
        |  SELECT old.it + 1, old.node, coalesce(pick.lbl, old.lbl)
        |  FROM lp old
        |  LEFT JOIN (
        |    SELECT c1.node, min(c1.lbl) AS lbl
        |    FROM (SELECT e.dst AS node, w.lbl AS lbl, count(*) AS cnt
        |          FROM lp w JOIN e ON e.src = w.node GROUP BY 1, 2) c1
        |    JOIN (SELECT node, max(cnt) AS mc FROM
        |            (SELECT e.dst AS node, w.lbl AS lbl,
        |               count(*) AS cnt
        |             FROM lp w JOIN e ON e.src = w.node GROUP BY 1, 2)
        |            c2
        |          GROUP BY 1) b
        |      ON b.node = c1.node AND c1.cnt = b.mc
        |    GROUP BY c1.node
        |  ) pick ON pick.node = old.node
        |  WHERE old.it + 1 <= 5
        |)
        |SELECT node, lbl FROM lp WHERE it = 5 ORDER BY node""".stripMargin,

    // harmonic-class FFD replay: class = capacity div max(n,1), rank
    // within class by (n desc, id), pack = class base + rank div k —
    // closed-form, no sequential fold needed (unlike the q83 oracle)
    "q118_pack_global" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |  ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
        |    AS n
        |  FROM documents),
        |s AS (SELECT doc_id, n,
        |  CAST(256 AS BIGINT) // greatest(n, 1) AS cls FROM d),
        |r AS (SELECT doc_id, n, cls,
        |  row_number() OVER (PARTITION BY cls ORDER BY n DESC, doc_id)
        |    - 1 AS rk
        |  FROM s),
        |cc AS (SELECT cls, count(*) AS cnt FROM s GROUP BY 1),
        |cb AS (SELECT cls,
        |  coalesce(sum((cnt + greatest(cls, 1) - 1) // greatest(cls, 1))
        |    OVER (ORDER BY cls
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS base
        |  FROM cc)
        |SELECT r.cls AS cls, r.doc_id, r.n AS n_tokens,
        |  CAST(cb.base + rk // greatest(r.cls, 1) AS BIGINT) AS pack_id
        |FROM r JOIN cb ON cb.cls = r.cls
        |ORDER BY r.doc_id""".stripMargin,

    // triangles are exact longs, so ANY correct count matches: the
    // oracle uses the simple id-ordered three-way join (each triangle
    // a<b<c counted once), independent of the engine's degree
    // orientation — a genuinely independent check
    "q119_triangles" ->
      s"""$copurchaseCte
        |SELECT d.node, d.deg, coalesce(t.tri, 0) AS tri
        |FROM deg d LEFT JOIN tri t USING (node)
        |ORDER BY tri DESC, node LIMIT 20""".stripMargin,

    // cc = 2·tri/(deg·(deg−1)): one double division of exact longs —
    // bit-identical across engines with no rounding device
    "q120_clustering_coeff" ->
      s"""$copurchaseCte
        |SELECT d.node, d.deg, coalesce(t.tri, 0) AS tri,
        |  CASE WHEN d.deg < 2 THEN CAST(0.0 AS DOUBLE)
        |  ELSE CAST(coalesce(t.tri, 0) AS DOUBLE) * 2.0
        |    / (d.deg * (d.deg - 1)) END AS cc
        |FROM deg d LEFT JOIN tri t USING (node)
        |ORDER BY d.node""".stripMargin,

    // k-core by synchronous peel, replayed round-by-round: round r+1
    // keeps the edges whose BOTH endpoints have round-r degree >= k
    // (two window counts on the symmetric edge state — degree = count
    // as src = count as dst); the engine's early fixpoint stop equals
    // the cap-round state because the fixpoint is stationary
    "q121_kcore" ->
      """WITH RECURSIVE
        |lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem),
        |pe AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS s1,
        |  b.l_partkey AS s2
        |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey),
        |sym AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM pe
        |  UNION ALL SELECT s2, s1 FROM pe),
        |st AS (
        |  SELECT 0 AS r, src, dst FROM sym
        |  UNION ALL
        |  SELECT r + 1, src, dst FROM (
        |    SELECT r, src, dst,
        |      count(*) OVER (PARTITION BY r, src) AS ds,
        |      count(*) OVER (PARTITION BY r, dst) AS dd
        |    FROM st)
        |  WHERE r < 10 AND ds >= 80 AND dd >= 80)
        |SELECT src AS node, count(*) AS deg FROM st WHERE r = 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // span strings stand in for the engine's xxhash64 span
    // fingerprints (first-occurrence sets equal absent 64-bit
    // collisions — the q09 argument); first occurrence = the
    // (doc_id, idx)-minimal row of each span's partition
    "q122_span_dedup" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN []
        |  ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents),
        |sp AS MATERIALIZED (
        |  SELECT doc_id, CAST(i AS BIGINT) AS idx,
        |    array_to_string(tk[(i*8+1):(i*8+8)], ' ') AS span
        |  FROM toks,
        |    UNNEST(range(0, CAST(ceil(len(tk)/8.0) AS BIGINT))) AS t(i)),
        |keep AS (SELECT doc_id, idx, span,
        |  row_number() OVER (PARTITION BY span ORDER BY doc_id, idx)
        |    AS rn FROM sp)
        |SELECT t.doc_id,
        |  CAST(ceil(len(t.tk)/8.0) AS BIGINT) AS n_spans,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  coalesce(k.text_clean, '') AS text_clean
        |FROM toks t LEFT JOIN (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(span, ' ' ORDER BY idx) AS text_clean
        |  FROM keep WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // the q113 PPR replay with the q116 weighted-edge base:
    // contribution rank·w/wout (12-dp DECIMAL out-weight totals),
    // reset + sink mass riding the seed distribution
    "q123_ppr_weighted" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p, CAST(count(*) AS DOUBLE) AS w
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (SELECT c AS src, p AS dst, w FROM base),
        |od AS MATERIALIZED (SELECT src,
        |  CAST(sum(CAST(round(w, 12) AS DECIMAL(38,12))) AS DOUBLE)
        |    AS wout
        |  FROM e GROUP BY 1),
        |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |dang AS MATERIALIZED (SELECT node FROM nodes
        |  WHERE node NOT IN (SELECT src FROM e)),
        |ks AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS k
        |  FROM nodes WHERE node <= 50),
        |rv AS MATERIALIZED (SELECT node,
        |  CASE WHEN node <= 50
        |  THEN CAST(1.0 AS DOUBLE) / (SELECT k FROM ks)
        |  ELSE CAST(0.0 AS DOUBLE) END AS r FROM nodes),
        |pr AS (
        |  SELECT 0 AS it, node, r AS rank FROM rv
        |  UNION ALL
        |  SELECT old.it + 1, old.node,
        |    round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * rv.r
        |      + CAST(0.85 AS DOUBLE)
        |        * (CAST(coalesce(agg.s, 0) AS DOUBLE) + dm.v * rv.r),
        |      9)
        |  FROM pr old
        |  JOIN rv ON rv.node = old.node
        |  LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(pw.rank * e.w / od.wout, 12)
        |        AS DECIMAL(38,12))) AS s
        |    FROM pr pw JOIN e ON e.src = pw.node
        |    JOIN od ON od.src = e.src
        |    GROUP BY e.dst
        |  ) agg ON agg.node = old.node
        |  CROSS JOIN (
        |    SELECT CAST(coalesce(sum(CAST(round(d.rank, 12)
        |        AS DECIMAL(38,12))), 0) AS DOUBLE) AS v
        |    FROM pr d JOIN dang ON dang.node = d.node
        |  ) dm
        |  WHERE old.it + 1 <= 10
        |)
        |SELECT node, rank FROM pr WHERE it = 10
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin,

    // row-by-row recursive replay of the per-key EWMA recurrence in
    // EXACT DECIMAL arithmetic (inputs quantized at 6 dp, 9-dp HALF_UP
    // state) — a decimal state that is a pure decimal function of the
    // previous one carries no drift and none of the double-rounding
    // boundary hazards of a float recurrence; the final CAST to DOUBLE
    // is the same correctly-rounded conversion the engine emits.
    // Shared by the batch operator (q124) and its streaming GroupState
    // twin (q125) — one oracle proves the twins equal.
    "q124_ewma" -> ewmaOracle,
    "q125_stream_ewma" -> ewmaOracle,

    // the oracle aggregates the ORIGINAL parquet table — equality
    // proves the ORC write+read preserved every row and value; the
    // DECIMAL(18,2) sum is the repo's exact-summation device
    "q126_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem WHERE l_quantity > 30.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // identical seeded-md5 coin (8 hex chars -> BIGINT, mod 100 < 20),
    // id-ordered exact count on the sample, and the same
    // tri·(10⁶/20³) = tri·125.0 scale (exact in IEEE)
    "q127_triangle_estimate" ->
      """WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem),
        |pe AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS s1,
        |  b.l_partkey AS s2
        |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey),
        |sp AS MATERIALIZED (SELECT s1, s2 FROM pe
        |  WHERE CAST(('0x' || substr(md5('13-' || s1 || '-' || s2), 1, 8))
        |    AS BIGINT) % 100 < 20),
        |tri AS (SELECT count(*) AS t
        |  FROM sp e1 JOIN sp e2 ON e1.s1 = e2.s1 AND e1.s2 < e2.s2
        |  JOIN sp e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2)
        |SELECT (SELECT count(*) FROM sp) AS n_sampled_edges,
        |  t AS tri_sampled,
        |  CAST(t AS DOUBLE) * 125.0 AS est_triangles
        |FROM tri""".stripMargin,

    // recursive-UNION BFS replay: the DISTINCT recursion generates
    // every (node, lvl <= 4) pair reachable by SOME walk, min(lvl)
    // picks the first discovery — exactly the engine's anti-join
    // frontier semantics; supplier ids are offset by 1e7, so
    // node <= 50 seeds only customers
    "q128_bfs_levels" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM base
        |  UNION ALL SELECT p, c FROM base),
        |seeds AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
        |  WHERE src <= 50),
        |lv AS (
        |  SELECT node, 0 AS lvl FROM seeds
        |  UNION
        |  SELECT e.dst, lv.lvl + 1 FROM lv JOIN e ON e.src = lv.node
        |  WHERE lv.lvl < 4)
        |SELECT node, min(lvl) AS lvl FROM lv
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-edge common neighbors = the id-ordered triangle triples
    // exploded onto their three (min, max) edges — the same exact
    // longs as the engine's least/greatest explode; jac is one double
    // division
    "q129_edge_jaccard" ->
      """WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem),
        |pe AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS s1,
        |  b.l_partkey AS s2
        |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey),
        |sym AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM pe
        |  UNION ALL SELECT s2, s1 FROM pe),
        |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg
        |  FROM sym GROUP BY 1),
        |t3 AS MATERIALIZED (
        |  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
        |  FROM pe e1 JOIN pe e2 ON e1.s1 = e2.s1 AND e1.s2 < e2.s2
        |  JOIN pe e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2),
        |pedge AS (SELECT src, dst, count(*) AS common FROM (
        |  SELECT a AS src, b AS dst FROM t3
        |  UNION ALL SELECT a, c FROM t3
        |  UNION ALL SELECT b, c FROM t3) GROUP BY 1, 2)
        |SELECT pe.s1 AS src, pe.s2 AS dst, d1.deg AS deg_src,
        |  d2.deg AS deg_dst, coalesce(p.common, 0) AS common,
        |  CAST(coalesce(p.common, 0) AS DOUBLE)
        |    / (d1.deg + d2.deg - coalesce(p.common, 0)) AS jac
        |FROM pe JOIN deg d1 ON d1.node = pe.s1
        |JOIN deg d2 ON d2.node = pe.s2
        |LEFT JOIN pedge p ON p.src = pe.s1 AND p.dst = pe.s2
        |ORDER BY jac DESC, src, dst LIMIT 20""".stripMargin,

    // string grams stand in for the engine's xxhash64 grams (counts
    // equal absent 64-bit collisions — the q17 argument); per-doc
    // dedup via list_distinct mirrors the map-side array_distinct;
    // sum(CASE) is HUGEINT in DuckDB -> CAST back to BIGINT
    "q103_dup_grams" ->
      """WITH ta AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
        |t -> t <> '') AS a FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |  range(1, len(a) - 6), i -> array_to_string(a[i:i+7], ' '))))
        |  AS gram
        |FROM ta WHERE len(a) >= 8),
        |df AS (SELECT gram, count(*) AS dfreq FROM g GROUP BY 1)
        |SELECT g.doc_id, count(*) AS n_grams,
        |CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_dup,
        |round(CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_frac
        |FROM g JOIN df USING (gram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    // sqrt is correctly rounded (unlike general pow) so the
    // 12-dp-round + DECIMAL-sum weight total and the floor(k*w/t+0.5)
    // quotas are bit-identical; the window-rank form is the oracle
    // for the engine's bounded-TopK per-source fill
    "q104_temperature_mix" ->
      """WITH n AS (SELECT source, count(*) AS ns FROM documents
        |  GROUP BY 1),
        |w AS (SELECT source,
        |  CAST(round(sqrt(CAST(ns AS DOUBLE)), 12) AS DECIMAL(38,12))
        |  AS ws FROM n),
        |tt AS (SELECT CAST(sum(ws) AS DOUBLE) AS t FROM w),
        |q AS (SELECT source,
        |  CAST(floor(100 * CAST(ws AS DOUBLE) / t + 0.5) AS BIGINT)
        |  AS quota FROM w CROSS JOIN tt),
        |s AS (SELECT source, doc_id,
        |  CAST(('0x' || substr(md5('13-' || doc_id), 1, 8)) AS BIGINT)
        |  AS ord FROM documents),
        |r AS (SELECT source, doc_id, ord,
        |  row_number() OVER (PARTITION BY source ORDER BY ord, doc_id)
        |  AS rn FROM s)
        |SELECT r.source, doc_id, ord FROM r JOIN q USING (source)
        |WHERE rn <= quota ORDER BY r.source, ord, doc_id""".stripMargin,

    // date_diff('microsecond') floors both sides to us boundaries —
    // exactly the engine's nanos->micros truncation, so the boundary
    // decision agrees at any ns remainder (q21's INTERVAL form relies
    // on the data having none near the gap edge; this one doesn't)
    "q105_batch_sessionize" -> sessionizeOracle,

    // the native session_window twin computes the SAME sessions
    // (Spark's session merge is inclusive at the gap edge, matching
    // the split-strictly-past-the-gap rule — TimeSeriesSpec proves
    // the ±1µs boundary), so it shares q105's oracle
    "q108_session_window" -> sessionizeOracle,

    // the engine decodes REAL PNGs; the oracle replays the pixel
    // recipe instead (PNG is lossless, one pixel per strip → feature
    // is exactly v/255 as a correctly-rounded float in both engines)
    "q109_image_decode" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS feat_idx,
        |CAST(CAST((doc_id*31 + i*97) % 251 AS DOUBLE)/255.0 AS FLOAT)
        |AS feat_val
        |FROM documents CROSS JOIN range(0, 8) r(i)
        |ORDER BY media_id, feat_idx""".stripMargin,

    // the engine decodes REAL WAVs; the oracle replays the sample
    // recipe — sum of squares is exact integer arithmetic in both
    // engines, and div+sqrt are correctly rounded, so the RMS float
    // is bit-identical
    "q110_audio_rms" ->
      """WITH j AS (SELECT doc_id, unnest(range(0, 64)) AS j
        |FROM documents),
        |s AS (SELECT doc_id, CAST(j // 8 AS INT) AS strip,
        |(doc_id*7919 + j*104729) % 65536 - 32768 AS smp FROM j)
        |SELECT doc_id AS media_id, strip,
        |CAST(sqrt(CAST(sum(smp*smp) AS DOUBLE) / (8 * 1073741824.0))
        |AS FLOAT) AS rms
        |FROM s GROUP BY 1, 2 ORDER BY media_id, strip""".stripMargin,

    // identical conditional counts (value rules judge non-null values
    // only; uniqueness = rows minus distinct tuples), long-formed to
    // one line per rule; labels replicate the Expectation ADT's
    "q143_expectations" ->
      """WITH v AS (SELECT
        |  count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS v0,
        |  count(CASE WHEN l_quantity IS NOT NULL
        |    AND (l_quantity < 1.0 OR l_quantity > 50.0) THEN 1 END) AS v1,
        |  count(CASE WHEN l_discount IS NOT NULL
        |    AND (l_discount < 0.0 OR l_discount > 0.05) THEN 1 END) AS v2,
        |  count(CASE WHEN l_returnflag IS NOT NULL
        |    AND l_returnflag NOT IN ('A','N','R') THEN 1 END) AS v3,
        |  count(CASE WHEN l_linestatus IS NOT NULL
        |    AND NOT regexp_matches(l_linestatus, '^[OF]$') THEN 1 END)
        |    AS v4,
        |  count(*) - count(DISTINCT l_orderkey) AS v5,
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v6
        |  FROM lineitem)
        |SELECT rule, n_violations,
        |  CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass
        |FROM (
        |  SELECT 'not_null(l_shipdate)' AS rule, v0 AS n_violations FROM v
        |  UNION ALL SELECT 'in_range(l_quantity, 1.0, 50.0)', v1 FROM v
        |  UNION ALL SELECT 'in_range(l_discount, 0.0, 0.05)', v2 FROM v
        |  UNION ALL SELECT 'in_set(l_returnflag, A|N|R)', v3 FROM v
        |  UNION ALL SELECT 'matches(l_linestatus)', v4 FROM v
        |  UNION ALL SELECT 'unique(l_orderkey)', v5 FROM v
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', v6 FROM v)
        |ORDER BY rule""".stripMargin,

    // identical quartiles (quantile_cont ≡ Spark percentile, the q47
    // device) in the identical scale expression
    "q154_robust_scale" ->
      """WITH b AS (SELECT quantile_cont(value, 0.25) AS q1,
        |  quantile_cont(value, 0.5) AS med,
        |  quantile_cont(value, 0.75) AS q3 FROM events)
        |SELECT event_id, value,
        |  CASE WHEN value IS NULL OR q3 - q1 = 0 THEN NULL
        |  ELSE (value - med) / (q3 - q1) END AS r
        |FROM events CROSS JOIN b ORDER BY event_id""".stripMargin,

    // identical exact counts and one exact-long division
    "q155_frequency_encode" ->
      """WITH c AS (SELECT event_type, count(*) AS event_type_count
        |  FROM events GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM events)
        |SELECT e.event_id, e.event_type, c.event_type_count,
        |  CAST(c.event_type_count AS DOUBLE) / n.n AS event_type_frac
        |FROM events e JOIN c USING (event_type) CROSS JOIN n
        |ORDER BY event_id""".stripMargin,

    // same 12-dp-rounded 1/ln(deg) terms summed in DECIMAL(38,12),
    // same deg ≤ 100 hub cap, same (u < w) wedge orientation and
    // existing-edge anti-join; ln and the 12-dp round agree bit-wise
    // across engines on these magnitudes (the q104 argument)
    "q156_adamic_adar" ->
      """WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem),
        |pe AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS s1,
        |  b.l_partkey AS s2
        |  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey),
        |sym AS MATERIALIZED (SELECT s1 AS src, s2 AS dst FROM pe
        |  UNION ALL SELECT s2, s1 FROM pe),
        |deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg
        |  FROM sym GROUP BY 1),
        |nb AS MATERIALIZED (SELECT sym.src AS b, sym.dst AS n,
        |  CAST(CAST(round(1.0 / ln(deg), 12) AS DECIMAL(14,12))
        |    * 1000000000000 AS BIGINT) AS units
        |  FROM sym JOIN deg ON deg.node = sym.src
        |  WHERE deg BETWEEN 2 AND 100),
        |sc AS (SELECT x.n AS u, y.n AS w,
        |  CAST(sum(x.units) AS BIGINT) AS aa_units,
        |  count(*) AS common
        |  FROM nb x JOIN nb y ON x.b = y.b AND x.n < y.n
        |  GROUP BY 1, 2)
        |SELECT sc.u AS src, sc.w AS dst, CAST(common AS BIGINT)
        |  AS common,
        |  CAST(aa_units AS DOUBLE) / 1000000000000.0 AS aa
        |FROM sc ANTI JOIN pe ON pe.s1 = sc.u AND pe.s2 = sc.w
        |ORDER BY aa DESC, src, dst LIMIT 20""".stripMargin,

    // identical md5-hex row hashes mod 2048, identical counter
    // GROUP BY and min-probe; every value integer-exact
    "q157_countmin" -> countMinOracleSql,

    // the SAME full-corpus oracle as q157: counter-wise sum over a
    // 90/10 split is EXACTLY the full-feed sketch (integer adds
    // commute), so the artifact lifecycle must reproduce q157's
    // numbers bit-for-bit — that identity IS what this row checks
    "q178_countmin_artifact" -> countMinOracleSql,

    // and the same identity for the STREAMED build: the micro-batch
    // split is an id-hash 3-way split, counter sums commute, so the
    // foreachBatch-folded artifact must replay the full events corpus
    "q182_stream_countmin" -> countMinOracleFor("events", "user_id"),

    // same VALUES fixture; RE2's (\p{Han}) → ' \1 ' pad is the same
    // Unicode Script substitution as Java's (\p{IsHan}) → ' $1 ',
    // then the shared '[^\p{L}]+' split — integer-exact counts
    "q183_cjk_tokens" ->
      s"""WITH docs(doc_id, lang, text) AS (VALUES
        |    $unicodeFixtureSqlValues),
        |p AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
        |    t -> t <> '') AS a FROM docs),
        |c AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(
        |    regexp_replace(text, '(\\p{Han})', ' \\1 ', 'g'),
        |    '[^\\p{L}]+'), t -> t <> '') AS a FROM docs),
        |bg AS (SELECT doc_id,
        |  flatten(list_transform(
        |    list_filter(regexp_split_to_array(
        |      regexp_replace(text, '(\\p{Han}+)', ' \\1 ', 'g'),
        |      '[^\\p{L}]+'), t -> t <> ''),
        |    t -> CASE WHEN regexp_matches(t, '^\\p{Han}{2,}$$')
        |      THEN list_transform(range(1, length(t)),
        |        i -> substr(t, CAST(i AS INT), 2))
        |      ELSE [t] END)) AS a FROM docs)
        |SELECT d.doc_id, d.lang,
        |  CAST(len(p.a) AS BIGINT) AS n_tokens_plain,
        |  CAST(len(c.a) AS BIGINT) AS n_tokens_cjk,
        |  CAST(len(list_distinct(c.a)) AS BIGINT) AS n_distinct_cjk,
        |  CAST(len(bg.a) AS BIGINT) AS n_tokens_bigram,
        |  CAST(len(list_distinct(bg.a)) AS BIGINT) AS n_distinct_bigram
        |FROM docs d JOIN p USING (doc_id) JOIN c USING (doc_id)
        |JOIN bg USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // the q92 BM25 replay with the SAME 26-char ASCII fold applied to
    // the tokenized text (asciiFoldSql — generated from the same char
    // ranges as the engine's translate) and to the query terms
    "q184_folded_bm25" ->
      s"""WITH tok AS (SELECT doc_id,
        |unnest(regexp_split_to_array(
        |${operators.TextAnalysis.asciiFoldSql("text")}, '[^\\p{L}]+'))
        |AS term FROM documents),
        |t AS (SELECT * FROM tok WHERE term <> ''),
        |dl AS (SELECT doc_id, count(*) AS dlen FROM t GROUP BY 1),
        |st AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE)
        |AS n_docs,
        |CAST((SELECT sum(dlen) FROM dl) AS DOUBLE) /
        |CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
        |WHERE term IN ('the', 'spark', 'dup') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |(tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen / avgdl)),
        |9) AS ts
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        |CROSS JOIN st)
        |SELECT doc_id,
        |round(CAST(sum(CAST(ts AS DECIMAL(28,9))) AS DOUBLE), 6) AS score
        |FROM sc GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // the q177 replay with the Han-BIGRAM token stream (same pad →
    // split → slide as the q183 bg CTE), same entropy and TF-IDF
    // devices — alphabetic rows must come out identical to q177
    "q185_cjk_bigram_stats" ->
      s"""WITH docs(doc_id, lang, text) AS (VALUES
        |    $unicodeFixtureSqlValues),
        |tk AS (SELECT doc_id,
        |  unnest(flatten(list_transform(
        |    list_filter(regexp_split_to_array(
        |      regexp_replace(text, '(\\p{Han}+)', ' \\1 ', 'g'),
        |      '[^\\p{L}]+'), t -> t <> ''),
        |    t -> CASE WHEN regexp_matches(t, '^\\p{Han}{2,}$$')
        |      THEN list_transform(range(1, length(t)),
        |        i -> substr(t, CAST(i AS INT), 2))
        |      ELSE [t] END))) AS tok
        |  FROM docs),
        |cells AS MATERIALIZED (SELECT doc_id, tok, count(*) AS c
        |  FROM tk GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n, count(*) AS nd
        |  FROM cells GROUP BY 1),
        |t AS (SELECT cells.doc_id,
        |  CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |    AS DECIMAL(38,12)) AS t, n, nd
        |  FROM cells JOIN tot USING (doc_id)),
        |ent AS (SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_tokens,
        |  CAST(any_value(nd) AS BIGINT) AS n_distinct,
        |  0.0 - CAST(sum(t) AS DOUBLE) AS entropy
        |  FROM t GROUP BY doc_id),
        |dfq AS (SELECT tok, count(*) AS df FROM cells GROUP BY 1),
        |scored AS (SELECT doc_id, tok,
        |  round(CAST(c AS DOUBLE) *
        |    ln(${unicodeFixtureRows.size}.0 / CAST(df AS DOUBLE)), 6)
        |    AS score
        |  FROM cells JOIN dfq USING (tok)),
        |top AS (SELECT doc_id, tok AS top_term, score AS tfidf,
        |  row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, tok) AS rn
        |  FROM scored)
        |SELECT d.doc_id, d.lang, e.n_tokens, e.n_distinct, e.entropy,
        |  top.top_term, top.tfidf
        |FROM docs d JOIN ent e USING (doc_id)
        |JOIN top ON top.doc_id = d.doc_id AND top.rn = 1
        |ORDER BY d.doc_id""".stripMargin,

    // full NB replay: same VALUES fixtures (ONE Scala Seq each), same
    // code-point substr bigrams, same Laplace term
    // round(ln((c+1)/(n_lang+V)), 12) DECIMAL-summed, same
    // (score desc, lang) argmax; the marker twin is detectLangSql —
    // generated from the SAME marker map as the engine
    "q179_lang_nb" ->
      s"""WITH train(lang, text) AS (VALUES
        |    $nbTrainSqlValues),
        |test(doc_id, lang, text) AS (VALUES
        |    $nbTestSqlValues),
        |tg AS (SELECT lang, substr(text, CAST(i AS INT), 2) AS g
        |  FROM (SELECT lang, unnest(range(1, length(text))) AS i, text
        |    FROM train)),
        |model AS MATERIALIZED (SELECT lang, g, count(*) AS c
        |  FROM tg GROUP BY 1, 2),
        |nl AS (SELECT lang, sum(c) AS n_lang FROM model GROUP BY 1),
        |vv AS (SELECT count(DISTINCT g) AS v FROM model),
        |dg AS (SELECT doc_id, substr(text, CAST(i AS INT), 2) AS g
        |  FROM (SELECT doc_id, unnest(range(1, length(text))) AS i, text
        |    FROM test)),
        |scored AS (SELECT dg.doc_id, nl.lang,
        |  sum(CAST(round(ln(CAST(coalesce(m.c, 0) + 1 AS DOUBLE) /
        |    CAST(nl.n_lang + vv.v AS DOUBLE)), 12)
        |    AS DECIMAL(38,12))) AS score
        |  FROM dg CROSS JOIN nl CROSS JOIN vv
        |  LEFT JOIN model m ON m.lang = nl.lang AND m.g = dg.g
        |  GROUP BY 1, 2),
        |nb AS (SELECT doc_id, lang AS detected FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, lang) AS rn FROM scored)
        |  WHERE rn = 1),
        |mk AS (SELECT doc_id, ${TextAnalysis.detectLangSql} AS detected
        |  FROM test),
        |cells AS (
        |  SELECT 'nb' AS detector, t.lang, nb.detected
        |  FROM nb JOIN test t USING (doc_id)
        |  UNION ALL
        |  SELECT 'marker', t.lang, mk.detected
        |  FROM mk JOIN test t USING (doc_id))
        |SELECT detector, lang, detected, count(*) AS n
        |FROM cells GROUP BY 1, 2, 3
        |ORDER BY detector, lang, detected""".stripMargin,

    // q179's NB replay on the FULL train fixture: integer gram counts
    // sum, so the engine's 4+2-per-language split-and-append artifact
    // must reproduce the full-train predictions exactly
    "q180_lang_model_artifact" ->
      s"""WITH train(lang, text) AS (VALUES
        |    $nbTrainSqlValues),
        |test(doc_id, lang, text) AS (VALUES
        |    $nbTestSqlValues),
        |tg AS (SELECT lang, substr(text, CAST(i AS INT), 2) AS g
        |  FROM (SELECT lang, unnest(range(1, length(text))) AS i, text
        |    FROM train)),
        |model AS MATERIALIZED (SELECT lang, g, count(*) AS c
        |  FROM tg GROUP BY 1, 2),
        |nl AS (SELECT lang, sum(c) AS n_lang FROM model GROUP BY 1),
        |vv AS (SELECT count(DISTINCT g) AS v FROM model),
        |dg AS (SELECT doc_id, substr(text, CAST(i AS INT), 2) AS g
        |  FROM (SELECT doc_id, unnest(range(1, length(text))) AS i, text
        |    FROM test)),
        |scored AS (SELECT dg.doc_id, nl.lang,
        |  sum(CAST(round(ln(CAST(coalesce(m.c, 0) + 1 AS DOUBLE) /
        |    CAST(nl.n_lang + vv.v AS DOUBLE)), 12)
        |    AS DECIMAL(38,12))) AS score
        |  FROM dg CROSS JOIN nl CROSS JOIN vv
        |  LEFT JOIN model m ON m.lang = nl.lang AND m.g = dg.g
        |  GROUP BY 1, 2)
        |SELECT doc_id, lang AS detected FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, lang) AS rn FROM scored)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // same VALUES fixture; the \p{IsX} Java classes and DuckDB's RE2
    // \p{X} name the same Unicode Script property; counts are BMP code
    // points in both engines (UTF-16 units = code points here); the
    // window argmax mirrors the engine's (−count, name) min-struct.
    // GENERATED from TextAnalysis.scriptClasses (the RE2 column), so
    // adding a script to the router extends the oracle automatically.
    "q181_script_profile" ->
      s"""WITH docs(doc_id, lang, text) AS (VALUES
        |    $unicodeFixtureSqlValues),
        |wide AS (SELECT doc_id, lang,
        |  length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
        |    AS n_letters,
        |${operators.TextAnalysis.scriptClasses
          .map { case (name, _, re2) =>
            s"  length(regexp_replace(text, '[^$re2]', '', 'g'))\n" +
            s"        |    AS n_$name" }
          .mkString("", ",\n        |", "")}
        |  FROM docs),
        |u AS (${operators.TextAnalysis.scriptClasses.zipWithIndex
          .map { case ((name, _, _), i) =>
            if (i == 0)
              s"SELECT doc_id, '$name' AS s, n_$name AS c FROM wide"
            else s"  UNION ALL SELECT doc_id, '$name', n_$name FROM wide" }
          .mkString("", "\n        |", "")}),
        |dom AS (SELECT doc_id, s, c, row_number() OVER (
        |  PARTITION BY doc_id ORDER BY c DESC, s) AS rn FROM u)
        |SELECT w.doc_id, w.lang, w.n_letters,
        |${operators.TextAnalysis.scriptClasses
          .map { case (name, _, _) => s"  w.n_$name" }
          .mkString("", ",\n        |", ",")}
        |  CASE WHEN w.n_letters = 0 THEN 'und'
        |       WHEN d.c = 0 THEN 'other' ELSE d.s END AS dominant
        |FROM wide w JOIN dom d ON d.doc_id = w.doc_id AND d.rn = 1
        |ORDER BY w.doc_id""".stripMargin,

    // same token split, same p/q/m expression order, one 12-dp round
    // of the final double — ln agrees bit-wise at these magnitudes
    // (the q104 argument)
    "q158_js_drift" ->
      """WITH tk AS MATERIALIZED (SELECT lang,
        |  unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
        |    t -> t <> '')) AS tok
        |  FROM documents WHERE lang IN ('en', 'de')),
        |ca AS MATERIALIZED (SELECT tok, count(*) AS c FROM tk
        |  WHERE lang = 'en' GROUP BY 1),
        |cb AS MATERIALIZED (SELECT tok, count(*) AS c FROM tk
        |  WHERE lang = 'de' GROUP BY 1),
        |na AS (SELECT CAST(sum(c) AS DOUBLE) AS na FROM ca),
        |nb AS (SELECT CAST(sum(c) AS DOUBLE) AS nb FROM cb),
        |j AS (SELECT coalesce(ca.tok, cb.tok) AS tok,
        |  coalesce(ca.c, 0) AS cnt_a, coalesce(cb.c, 0) AS cnt_b
        |  FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
        |t AS (SELECT tok, cnt_a, cnt_b,
        |  CAST(cnt_a AS DOUBLE) / na AS p, CAST(cnt_b AS DOUBLE) / nb AS q
        |  FROM j CROSS JOIN na CROSS JOIN nb)
        |SELECT tok, cnt_a, cnt_b,
        |  round((CASE WHEN cnt_a = 0 THEN 0.0
        |      ELSE p * ln(p / ((p + q) / 2.0)) END) * 0.5
        |    + (CASE WHEN cnt_b = 0 THEN 0.0
        |      ELSE q * ln(q / ((p + q) / 2.0)) END) * 0.5, 12)
        |    AS jsd_term
        |FROM t ORDER BY jsd_term DESC, tok LIMIT 20""".stripMargin,

    // batch replay of the streaming histogram: same ⌊value/5⌋ bins,
    // same integer ceil-rank, same lower-edge estimate — the
    // verification input is single-batch so stream ≡ batch exactly
    "q159_stream_quantile" ->
      """WITH b AS MATERIALIZED (SELECT event_type,
        |  CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS c
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |n AS MATERIALIZED (SELECT event_type, sum(c) AS n FROM b
        |  GROUP BY 1),
        |cum AS MATERIALIZED (SELECT event_type, bin,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
        |  FROM b),
        |q(qname, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10)),
        |sel AS (SELECT c.event_type, q.qname, min(c.bin) AS mbin
        |  FROM cum c JOIN n USING (event_type) CROSS JOIN q
        |  WHERE c.cum >= (n.n * q.num + q.den - 1) // q.den
        |  GROUP BY 1, 2)
        |SELECT s.event_type, s.qname, CAST(n.n AS BIGINT) AS n_events,
        |  s.mbin * 5.0 AS est
        |FROM sel s JOIN n USING (event_type)
        |ORDER BY event_type, qname""".stripMargin,

    // same distinct incidence, same HAVING-count hub cap, same
    // oriented pair expansion; weights integer-exact
    "q160_bipartite_project" ->
      """WITH cp AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
        |  l.l_partkey AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |keep AS MATERIALIZED (SELECT p FROM cp GROUP BY p
        |  HAVING count(*) <= 40),
        |pr AS MATERIALIZED (SELECT cp.c, cp.p FROM cp JOIN keep
        |  USING (p))
        |SELECT a.c AS src, b.c AS dst, count(*) AS w
        |FROM pr a JOIN pr b ON a.p = b.p AND a.c < b.c
        |GROUP BY 1, 2 ORDER BY w DESC, src, dst LIMIT 20""".stripMargin,

    // same float→double widening, same round-half-away integer codes,
    // same relative-error terms 12-dp-rounded into a DECIMAL sum;
    // sqrt is correctly rounded (the q104 argument)
    "q161_embed_int8" ->
      """WITH ex AS MATERIALIZED (SELECT vec_id,
        |  CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |sc AS MATERIALIZED (SELECT vec_id, max(abs(x)) / 127.0 AS scale
        |  FROM ex GROUP BY 1),
        |t AS (SELECT ex.vec_id, sc.scale,
        |  CASE WHEN sc.scale = 0 THEN CAST(0 AS DECIMAL(38,12))
        |  ELSE CAST(round(
        |    ((x - round(x / scale) * scale) / scale) *
        |    ((x - round(x / scale) * scale) / scale), 12)
        |    AS DECIMAL(38,12)) END AS t
        |  FROM ex JOIN sc USING (vec_id))
        |SELECT vec_id, any_value(scale) AS scale,
        |  sqrt(CAST(sum(t) AS DOUBLE) / count(*)) AS rmse_rel
        |FROM t GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // same exact DECIMAL moment sums -> same 9-dp corr entries ->
    // same 12-dp matvec terms and 9-dp updates, replayed by the
    // recursive CTE (it may be referenced repeatedly in DuckDB — the
    // q107 device); v0 = round(1/sqrt(4), 9)
    "q162_pca_power" ->
      """WITH RECURSIVE
        |m AS MATERIALIZED (SELECT count(*) AS n,
        |  sum(CAST(l_quantity AS DECIMAL(18,4))) AS s0,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS s1,
        |  sum(CAST(l_discount AS DECIMAL(18,4))) AS s2,
        |  sum(CAST(l_tax AS DECIMAL(18,4))) AS s3,
        |  sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
        |    CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p00,
        |  sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
        |    CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p01,
        |  sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
        |    CAST(l_discount AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p02,
        |  sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
        |    CAST(l_tax AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p03,
        |  sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
        |    CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p11,
        |  sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
        |    CAST(l_discount AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p12,
        |  sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
        |    CAST(l_tax AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p13,
        |  sum(CAST(CAST(l_discount AS DECIMAL(19,4)) *
        |    CAST(l_discount AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p22,
        |  sum(CAST(CAST(l_discount AS DECIMAL(19,4)) *
        |    CAST(l_tax AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p23,
        |  sum(CAST(CAST(l_tax AS DECIMAL(19,4)) *
        |    CAST(l_tax AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS p33
        |  FROM lineitem),
        |nn AS (SELECT CAST(n AS DOUBLE) AS n FROM m),
        |sv AS MATERIALIZED (
        |  SELECT 0 AS i, CAST(s0 AS DOUBLE) AS s FROM m
        |  UNION ALL SELECT 1, CAST(s1 AS DOUBLE) FROM m
        |  UNION ALL SELECT 2, CAST(s2 AS DOUBLE) FROM m
        |  UNION ALL SELECT 3, CAST(s3 AS DOUBLE) FROM m),
        |pv AS MATERIALIZED (
        |  SELECT 0 AS i, 0 AS j, CAST(p00 AS DOUBLE) AS sij FROM m
        |  UNION ALL SELECT 0, 1, CAST(p01 AS DOUBLE) FROM m
        |  UNION ALL SELECT 0, 2, CAST(p02 AS DOUBLE) FROM m
        |  UNION ALL SELECT 0, 3, CAST(p03 AS DOUBLE) FROM m
        |  UNION ALL SELECT 1, 1, CAST(p11 AS DOUBLE) FROM m
        |  UNION ALL SELECT 1, 2, CAST(p12 AS DOUBLE) FROM m
        |  UNION ALL SELECT 1, 3, CAST(p13 AS DOUBLE) FROM m
        |  UNION ALL SELECT 2, 2, CAST(p22 AS DOUBLE) FROM m
        |  UNION ALL SELECT 2, 3, CAST(p23 AS DOUBLE) FROM m
        |  UNION ALL SELECT 3, 3, CAST(p33 AS DOUBLE) FROM m),
        |pv2 AS (SELECT i, j, sij FROM pv
        |  UNION ALL SELECT j, i, sij FROM pv WHERE i < j),
        |cov AS MATERIALIZED (SELECT p.i, p.j,
        |  p.sij / nn.n - (a.s / nn.n) * (b.s / nn.n) AS cv
        |  FROM pv2 p JOIN sv a ON a.i = p.i JOIN sv b ON b.i = p.j
        |  CROSS JOIN nn),
        |cm AS MATERIALIZED (SELECT c1.i, c1.j,
        |  round(c1.cv / sqrt(dii.cv * djj.cv), 9) AS v
        |  FROM cov c1 JOIN cov dii ON dii.i = c1.i AND dii.j = c1.i
        |  JOIN cov djj ON djj.i = c1.j AND djj.j = c1.j),
        |it AS (
        |  SELECT 0 AS t, sv.i AS i, round(1.0 / sqrt(4.0), 9) AS v
        |  FROM sv
        |  UNION ALL
        |  SELECT w.t + 1, w.i,
        |    round(w.wd / sqrt(CAST(sum(CAST(round(w.wd * w.wd, 12)
        |      AS DECIMAL(38,12))) OVER () AS DOUBLE)), 9)
        |  FROM (SELECT it.t AS t, cm.i AS i,
        |      CAST(sum(CAST(round(cm.v * it.v, 12) AS DECIMAL(38,12)))
        |        AS DOUBLE) AS wd
        |    FROM it JOIN cm ON cm.j = it.i
        |    WHERE it.t < 15 GROUP BY 1, 2) w),
        |fin AS (SELECT i, v FROM it WHERE t = 15),
        |w2 AS (SELECT cm.i,
        |  CAST(sum(CAST(round(cm.v * f.v, 12) AS DECIMAL(38,12)))
        |    AS DOUBLE) AS wd
        |  FROM fin f JOIN cm ON cm.j = f.i GROUP BY 1),
        |lam AS (SELECT round(sqrt(CAST(sum(CAST(round(wd * wd, 12)
        |  AS DECIMAL(38,12))) AS DOUBLE)), 9) AS lambda FROM w2),
        |names(i, feature) AS (VALUES (0, 'l_quantity'),
        |  (1, 'l_extendedprice'), (2, 'l_discount'), (3, 'l_tax'))
        |SELECT names.feature, f.v AS loading, lam.lambda
        |FROM fin f JOIN names USING (i) CROSS JOIN lam
        |ORDER BY feature""".stripMargin,

    // same synthesized changelog, same max-seq winner per key, same
    // tombstone/upsert/insert semantics via the window-rank form
    "q163_cdc_apply" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders),
        |tgt AS (SELECT * FROM o WHERE o_orderkey % 5 <> 0),
        |ch AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 10.0
        |    AS o_totalprice, 'upsert' AS op, 1 AS seq
        |  FROM o WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, 'delete', 2
        |  FROM o WHERE o_orderkey % 6 = 0),
        |last AS (SELECT o_orderkey, o_custkey, o_totalprice, op FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY seq DESC) AS rn FROM ch) WHERE rn = 1)
        |SELECT coalesce(l.o_orderkey, t.o_orderkey) AS o_orderkey,
        |  CASE WHEN l.o_orderkey IS NOT NULL THEN l.o_custkey
        |    ELSE t.o_custkey END AS o_custkey,
        |  CASE WHEN l.o_orderkey IS NOT NULL THEN l.o_totalprice
        |    ELSE t.o_totalprice END AS o_totalprice
        |FROM tgt t FULL OUTER JOIN last l
        |  ON l.o_orderkey = t.o_orderkey
        |WHERE l.op IS NULL OR l.op <> 'delete'
        |ORDER BY o_orderkey""".stripMargin,

    // the q117 label-prop replay verbatim, then Q from exact integer
    // edge/degree sums with the same 12-dp-round + DECIMAL-sum device
    "q164_modularity" ->
      """WITH RECURSIVE
        |base AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c,
        |  l.l_suppkey + 10000000 AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS MATERIALIZED (SELECT c AS src, p AS dst FROM base
        |  UNION ALL SELECT p, c FROM base),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
        |lp AS (
        |  SELECT 0 AS it, node, node AS lbl FROM nodes
        |  UNION ALL
        |  SELECT old.it + 1, old.node, coalesce(pick.lbl, old.lbl)
        |  FROM lp old
        |  LEFT JOIN (
        |    SELECT c1.node, min(c1.lbl) AS lbl
        |    FROM (SELECT e.dst AS node, w.lbl AS lbl, count(*) AS cnt
        |          FROM lp w JOIN e ON e.src = w.node GROUP BY 1, 2) c1
        |    JOIN (SELECT node, max(cnt) AS mc FROM
        |            (SELECT e.dst AS node, w.lbl AS lbl,
        |               count(*) AS cnt
        |             FROM lp w JOIN e ON e.src = w.node GROUP BY 1, 2)
        |            c2
        |          GROUP BY 1) b
        |      ON b.node = c1.node AND c1.cnt = b.mc
        |    GROUP BY c1.node
        |  ) pick ON pick.node = old.node
        |  WHERE old.it + 1 <= 5
        |),
        |fin AS MATERIALIZED (SELECT node, lbl FROM lp WHERE it = 5),
        |md AS (SELECT CAST(count(*) AS DOUBLE) AS m,
        |  count(*) AS mi FROM e),
        |ein AS MATERIALIZED (SELECT a.lbl, count(*) AS ein FROM e
        |  JOIN fin a ON a.node = e.src JOIN fin b ON b.node = e.dst
        |  WHERE a.lbl = b.lbl GROUP BY 1),
        |deg AS MATERIALIZED (SELECT f.lbl, count(*) AS dg FROM e
        |  JOIN fin f ON f.node = e.src GROUP BY 1),
        |terms AS (SELECT CAST(round(
        |    CAST(coalesce(ein.ein, 0) AS DOUBLE) / md.m
        |    - (CAST(deg.dg AS DOUBLE) / md.m) *
        |      (CAST(deg.dg AS DOUBLE) / md.m), 12)
        |  AS DECIMAL(38,12)) AS t
        |  FROM deg LEFT JOIN ein ON ein.lbl = deg.lbl CROSS JOIN md)
        |SELECT CAST(sum(t) AS DOUBLE) AS modularity,
        |  CAST(count(*) AS BIGINT) AS n_communities,
        |  (SELECT CAST(mi AS BIGINT) FROM md) AS m_directed
        |FROM terms""".stripMargin,

    // the engine hashes REAL decoded PNGs; the oracle replays the
    // gray-level recipe — luminance of a gray pixel is exactly its
    // level, and the threshold compare is cross-multiplied integers
    "q165_image_ahash" ->
      """WITH px AS (SELECT doc_id, i, (doc_id*31 + i*97) % 251 AS v
        |  FROM documents CROSS JOIN range(0, 8) r(i)),
        |t AS (SELECT doc_id, sum(v) AS s FROM px GROUP BY 1)
        |SELECT px.doc_id AS media_id,
        |  string_agg(CASE WHEN px.v * 8 >= t.s THEN '1' ELSE '0' END,
        |    '' ORDER BY px.i) AS ahash
        |FROM px JOIN t USING (doc_id)
        |GROUP BY px.doc_id ORDER BY media_id""".stripMargin,

    // same exact DECIMAL daily totals; isodow == Spark weekday+1;
    // every double a fixed expression of the exact sums
    "q166_seasonal_dow" ->
      """WITH daily AS MATERIALIZED (SELECT CAST(ts AS DATE) AS d,
        |  sum(CAST(value AS DECIMAL(18,4))) AS dt
        |  FROM events GROUP BY 1),
        |prof AS (SELECT CAST(isodow(d) AS INT) AS dow,
        |  CAST(sum(dt) AS DOUBLE) / count(*) AS dow_mean
        |  FROM daily GROUP BY 1)
        |SELECT daily.d AS date, CAST(dt AS DOUBLE) AS daily_total,
        |  prof.dow, prof.dow_mean,
        |  CAST(dt AS DOUBLE) - prof.dow_mean AS residual
        |FROM daily JOIN prof ON prof.dow = CAST(isodow(daily.d) AS INT)
        |ORDER BY date""".stripMargin,

    // q100's exact key expression, ranked within the group by the
    // window form (the engine's bounded-TopK twin)
    "q167_stratified_sample" ->
      """WITH b AS (SELECT event_type, event_id,
        |  round(ln(CAST(CAST(('0x' || substr(md5('77-' || event_id),
        |      1, 15)) AS BIGINT) + 1 AS DOUBLE)
        |    / CAST(1152921504606846976 AS DOUBLE)), 9)
        |    / CAST(value AS DOUBLE) AS skey
        |  FROM events WHERE CAST(value AS DOUBLE) > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY skey DESC, event_id) AS rn FROM b)
        |SELECT event_type, event_id, skey FROM r WHERE rn <= 10
        |ORDER BY event_type, skey DESC, event_id""".stripMargin,

    // same token split, same floor-div batches, integer-exact
    "q168_vocab_growth" ->
      """WITH tk AS (SELECT doc_id // 100 AS batch,
        |  unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
        |    t -> t <> '')) AS tok
        |  FROM documents),
        |cells AS MATERIALIZED (SELECT batch, tok, count(*) AS c
        |  FROM tk GROUP BY 1, 2),
        |first AS (SELECT tok, min(batch) AS fb FROM cells GROUP BY 1)
        |SELECT cells.batch, CAST(sum(c) AS BIGINT) AS n_occurrences,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(CASE WHEN fb = batch THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new
        |FROM cells JOIN first USING (tok)
        |GROUP BY cells.batch ORDER BY batch""".stripMargin,

    // same per-doc cells; p·ln p terms 12-dp-rounded into a DECIMAL
    // sum; 0.0 − sum keeps a zero entropy at +0.0 in both engines
    "q169_token_entropy" ->
      """WITH tk AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
        |    t -> t <> '')) AS tok
        |  FROM documents),
        |cells AS MATERIALIZED (SELECT doc_id, tok, count(*) AS c
        |  FROM tk GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n, count(*) AS nd
        |  FROM cells GROUP BY 1),
        |t AS (SELECT cells.doc_id,
        |  CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |    AS DECIMAL(38,12)) AS t, n, nd
        |  FROM cells JOIN tot USING (doc_id))
        |SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_tokens,
        |  CAST(any_value(nd) AS BIGINT) AS n_distinct,
        |  0.0 - CAST(sum(t) AS DOUBLE) AS entropy
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ANSI percent_rank is (rank−1)/(n−1) in both engines
    "q170_rank_normalize" ->
      """SELECT event_id, event_type, value,
        |  percent_rank() OVER (PARTITION BY event_type ORDER BY value)
        |    AS pr
        |FROM events ORDER BY event_id""".stripMargin,

    // same exact micro gaps (epoch_us == unix_micros on the
    // normalized ts), Σg² via HUGEINT ≙ DECIMAL(38,0), identical
    // guarded 9-dp stat expressions
    "q171_interarrival" ->
      """WITH g AS (SELECT user_id,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS g
        |  FROM events),
        |a AS (SELECT user_id, count(*) AS n_events, sum(g) AS sg,
        |  CAST(sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS DOUBLE)
        |    AS sgg,
        |  count(g) AS ng FROM g GROUP BY 1)
        |SELECT user_id, n_events,
        |  CASE WHEN ng = 0 THEN NULL
        |    ELSE round(CAST(sg AS DOUBLE) / ng / 1000000.0, 9) END
        |    AS mean_gap_sec,
        |  CASE WHEN ng < 2 OR sg = 0 THEN NULL
        |    ELSE round(sqrt(greatest((sgg - CAST(sg AS DOUBLE)
        |      * CAST(sg AS DOUBLE) / ng) / ng, 0.0))
        |      / (CAST(sg AS DOUBLE) / ng), 9) END AS cv
        |FROM a ORDER BY user_id""".stripMargin,

    // q151's exact cell/bucket machinery with the χ² term instead of
    // the MI term; same 12-dp round + DECIMAL sum
    "q172_chi_square" ->
      """WITH b AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75])
        |    AS qs FROM events),
        |t AS (SELECT event_type AS x, 1
        |  + (value > qs[1])::INT + (value > qs[2])::INT
        |  + (value > qs[3])::INT AS y FROM events, b),
        |j AS (SELECT x, y, count(*) AS c FROM t GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM j GROUP BY 1),
        |my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM j GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
        |nx AS (SELECT count(*) AS nx FROM mx),
        |ny AS (SELECT count(*) AS ny FROM my)
        |SELECT CAST(sum(CAST(round(
        |    (CAST(coalesce(c, 0) AS DOUBLE)
        |      - CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |    * (CAST(coalesce(c, 0) AS DOUBLE)
        |      - CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |    / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)
        |      / CAST(n AS DOUBLE)), 12)
        |  AS DECIMAL(38,12))) AS DOUBLE) AS chi2,
        |  (SELECT CAST((nx - 1) * (ny - 1) AS BIGINT) FROM nx, ny)
        |    AS dof,
        |  max(n) AS n_rows, count(*) AS n_cells
        |FROM mx CROSS JOIN my LEFT JOIN j USING (x, y) CROSS JOIN n"""
        .stripMargin,

    // batch cumulative-window replay of the streaming accumulators:
    // prior-rows frame, exact integer unit sums (HUGEINT ≙ the
    // engine's BigInteger), identical guarded 9-dp z expression
    "q173_stream_zscore" ->
      """WITH u AS (SELECT user_id, event_id, ts,
        |  CAST(round(value * 10000.0) AS BIGINT) AS xu FROM events),
        |w AS (SELECT user_id, event_id, xu,
        |  count(*) OVER wp AS n,
        |  sum(xu) OVER wp AS su,
        |  sum(CAST(xu AS HUGEINT) * xu) OVER wp AS sq
        |  FROM u WINDOW wp AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id,
        |  CASE WHEN n >= 3 AND (CAST(sq AS DOUBLE) / n
        |      - (CAST(su AS DOUBLE) / n) * (CAST(su AS DOUBLE) / n)) > 0
        |    THEN round((CAST(xu AS DOUBLE) - CAST(su AS DOUBLE) / n)
        |      / sqrt(CAST(sq AS DOUBLE) / n
        |        - (CAST(su AS DOUBLE) / n) * (CAST(su AS DOUBLE) / n)),
        |      9)
        |    ELSE NULL END AS z
        |FROM w ORDER BY user_id, event_id""".stripMargin,

    // q17's string-shingle CTE with the directional divisors; string
    // grams stand in for the engine's xxhash64 grams (the q17
    // collision argument)
    "q174_containment_pairs" ->
      """WITH s AS MATERIALIZED (SELECT doc_id,
        |  list_distinct(list_transform(range(1, length(text) - 6),
        |    i -> substr(text, CAST(i AS INT), 8))) AS sh
        |  FROM documents WHERE doc_id < 500)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh)
        |    AS cont_a_in_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh)
        |    AS cont_b_in_a
        |FROM s a, s b WHERE a.doc_id < b.doc_id
        |AND greatest(
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh),
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh))
        |  > 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // append ≡ rebuild: the oracle bins the FULL feed; the same
    // real-division ceil-rank predicate picks the same bins
    "q175_histogram_artifact" ->
      """WITH b AS (SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
        |  count(*) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM b),
        |cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM b),
        |q(qname, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10),
        |  ('p99', 99, 100)),
        |sel AS (SELECT q.qname, min(bin) AS mbin
        |  FROM cum CROSS JOIN n CROSS JOIN q
        |  WHERE cum >= CAST(n.n * q.num AS DOUBLE) / q.den
        |  GROUP BY 1)
        |SELECT s.qname, (SELECT CAST(n AS BIGINT) FROM n) AS n_values,
        |  s.mbin * 5.0 AS est
        |FROM sel s ORDER BY qname""".stripMargin,

    // the q25 detector expression crossed with the declared label;
    // share is one exact long division
    "q176_lang_confusion" ->
      s"""WITH d AS (SELECT lang, ${TextAnalysis.detectLangSql}
         |  AS detected FROM documents),
         |cells AS (SELECT lang, detected, count(*) AS n FROM d
         |  GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
         |  FROM cells GROUP BY 1)
         |SELECT cells.lang, detected, n,
         |  CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE) AS share
         |FROM cells JOIN tot USING (lang)
         |ORDER BY lang, detected""".stripMargin,

    // same VALUES fixture (generated from the ONE Scala Seq), same
    // '[^\p{L}]+' split, the q169 entropy device (12-dp rounded
    // p·ln p terms, DECIMAL sum, 0.0 − x) and the q57 TF-IDF scoring
    // (6-dp round of tf·ln(N/df)) with the same (score desc, term)
    // top-1 tie-break
    "q177_unicode_tokens" ->
      s"""WITH docs(doc_id, lang, text) AS (VALUES
        |    $unicodeFixtureSqlValues),
        |tk AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(text, '[^\\p{L}]+'),
        |    t -> t <> '')) AS tok
        |  FROM docs),
        |cells AS MATERIALIZED (SELECT doc_id, tok, count(*) AS c
        |  FROM tk GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n, count(*) AS nd
        |  FROM cells GROUP BY 1),
        |t AS (SELECT cells.doc_id,
        |  CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |    AS DECIMAL(38,12)) AS t, n, nd
        |  FROM cells JOIN tot USING (doc_id)),
        |ent AS (SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_tokens,
        |  CAST(any_value(nd) AS BIGINT) AS n_distinct,
        |  0.0 - CAST(sum(t) AS DOUBLE) AS entropy
        |  FROM t GROUP BY doc_id),
        |dfq AS (SELECT tok, count(*) AS df FROM cells GROUP BY 1),
        |scored AS (SELECT doc_id, tok,
        |  round(CAST(c AS DOUBLE) *
        |    ln(${unicodeFixtureRows.size}.0 / CAST(df AS DOUBLE)), 6)
        |    AS score
        |  FROM cells JOIN dfq USING (tok)),
        |top AS (SELECT doc_id, tok AS top_term, score AS tfidf,
        |  row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, tok) AS rn
        |  FROM scored)
        |SELECT d.doc_id, d.lang, e.n_tokens, e.n_distinct, e.entropy,
        |  top.top_term, top.tfidf
        |FROM docs d JOIN ent e USING (doc_id)
        |JOIN top ON top.doc_id = d.doc_id AND top.rn = 1
        |ORDER BY d.doc_id""".stripMargin,

    // the q179 NB replay with train = test = the documents TABLE
    // (corpus-scale fit): same substr bigrams, same Laplace term
    // round(ln((c+1)/(n_lang+V)), 12) DECIMAL-summed, same
    // (score desc, lang) argmax, rolled up to the confusion matrix
    "q186_lang_nb_corpus" ->
      s"""WITH tg AS (SELECT lang, substr(text, CAST(i AS INT), 2) AS g
        |  FROM (SELECT lang, unnest(range(1, length(text))) AS i, text
        |    FROM documents)),
        |model AS MATERIALIZED (SELECT lang, g, count(*) AS c
        |  FROM tg GROUP BY 1, 2),
        |nl AS (SELECT lang, sum(c) AS n_lang FROM model GROUP BY 1),
        |vv AS (SELECT count(DISTINCT g) AS v FROM model),
        |dg AS (SELECT doc_id, substr(text, CAST(i AS INT), 2) AS g
        |  FROM (SELECT doc_id, unnest(range(1, length(text))) AS i, text
        |    FROM documents)),
        |scored AS (SELECT dg.doc_id, nl.lang,
        |  sum(CAST(round(ln(CAST(coalesce(m.c, 0) + 1 AS DOUBLE) /
        |    CAST(nl.n_lang + vv.v AS DOUBLE)), 12)
        |    AS DECIMAL(38,12))) AS score
        |  FROM dg CROSS JOIN nl CROSS JOIN vv
        |  LEFT JOIN model m ON m.lang = nl.lang AND m.g = dg.g
        |  GROUP BY 1, 2),
        |nb AS (SELECT doc_id, lang AS detected FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, lang) AS rn FROM scored)
        |  WHERE rn = 1)
        |SELECT d.lang, nb.detected, count(*) AS n
        |FROM nb JOIN documents d USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the lossy-codec contract replayed from the recipe: the engine's
    // within_tol flag must come back TRUE for every doc (and dims 8×1)
    // — any decode failure or out-of-tolerance pixel flips a row and
    // breaks the hash
    "q188_jpeg_decode" ->
      """SELECT doc_id AS media_id, CAST(8 AS INT) AS width,
        |  CAST(1 AS INT) AS height, true AS within_tol
        |FROM documents ORDER BY media_id""".stripMargin,

    // greedy BPE apply replayed per DISTINCT word over the merges
    // table the query persisted: token state = tokens joined on
    // DOUBLE spaces with single-space sentinels, so replace-all of
    // ' l  r ' -> ' lr ' is exactly the kernel's leftmost-first
    // non-overlapping merge of the lowest-rank applicable pair; a
    // word drops out of the recursion when no merge applies
    // (word-length-bounded). Counts join back on the word stream.
    "q189_bpe_tokenize" ->
      s"""WITH RECURSIVE
        |mg AS MATERIALIZED (SELECT rank, ' ' || l || '  ' || r || ' '
        |    AS pat, ' ' || l || r || ' ' AS rep
        |  FROM read_parquet('${bpeMergesPath(lastDatasetDir)}/*.parquet')),
        |w AS MATERIALIZED (SELECT doc_id,
        |  unnest(regexp_extract_all(text, '[^\\s.,!?;:]+|[.,!?;:]', 0))
        |    AS word FROM documents),
        |v AS MATERIALIZED (SELECT DISTINCT word FROM w),
        |seed AS (SELECT word, ' ' || array_to_string(list_transform(
        |    range(1, length(word) + 1),
        |    i -> substr(word, CAST(i AS INT), 1)), '  ') || ' ' AS st
        |  FROM v),
        |steps AS (
        |  SELECT word, st FROM seed
        |  UNION ALL
        |  SELECT s.word, replace(s.st, m.pat, m.rep) AS st
        |  FROM steps s JOIN mg m ON contains(s.st, m.pat)
        |  WHERE m.rank =
        |    (SELECT min(m2.rank) FROM mg m2 WHERE contains(s.st, m2.pat))),
        |fin AS (SELECT word, st FROM steps s
        |  WHERE NOT EXISTS (SELECT 1 FROM mg m WHERE contains(s.st, m.pat))),
        |tc AS (SELECT word,
        |  CAST(len(string_split(trim(st), '  ')) AS BIGINT) AS n FROM fin)
        |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(tc.n) AS BIGINT) AS n_tokens
        |FROM w JOIN tc USING (word)
        |GROUP BY w.doc_id ORDER BY doc_id""".stripMargin,

    // q189's recursive-CTE per-distinct-word merge replay composed
    // into q118's closed-form harmonic-class FFD replay: per-doc n is
    // the REAL BPE token count (LEFT JOINs keep zero-word docs at
    // n=0, matching the engine's tokenCountCol null/empty → 0)
    "q190_pack_bpe" ->
      s"""WITH RECURSIVE
        |mg AS MATERIALIZED (SELECT rank, ' ' || l || '  ' || r || ' '
        |    AS pat, ' ' || l || r || ' ' AS rep
        |  FROM read_parquet('${bpeMergesPath(lastDatasetDir)}/*.parquet')),
        |w AS MATERIALIZED (SELECT doc_id,
        |  unnest(regexp_extract_all(text, '[^\\s.,!?;:]+|[.,!?;:]', 0))
        |    AS word FROM documents),
        |v AS MATERIALIZED (SELECT DISTINCT word FROM w),
        |seed AS (SELECT word, ' ' || array_to_string(list_transform(
        |    range(1, length(word) + 1),
        |    i -> substr(word, CAST(i AS INT), 1)), '  ') || ' ' AS st
        |  FROM v),
        |steps AS (
        |  SELECT word, st FROM seed
        |  UNION ALL
        |  SELECT s.word, replace(s.st, m.pat, m.rep) AS st
        |  FROM steps s JOIN mg m ON contains(s.st, m.pat)
        |  WHERE m.rank =
        |    (SELECT min(m2.rank) FROM mg m2 WHERE contains(s.st, m2.pat))),
        |fin AS (SELECT word, st FROM steps s
        |  WHERE NOT EXISTS (SELECT 1 FROM mg m WHERE contains(s.st, m.pat))),
        |tc AS (SELECT word,
        |  CAST(len(string_split(trim(st), '  ')) AS BIGINT) AS n FROM fin),
        |nt AS (SELECT d.doc_id,
        |  CAST(coalesce(sum(tc.n), 0) AS BIGINT) AS n
        |  FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
        |  LEFT JOIN tc USING (word) GROUP BY d.doc_id),
        |s AS (SELECT doc_id, n,
        |  CAST(256 AS BIGINT) // greatest(n, 1) AS cls FROM nt),
        |r AS (SELECT doc_id, n, cls,
        |  row_number() OVER (PARTITION BY cls ORDER BY n DESC, doc_id)
        |    - 1 AS rk
        |  FROM s),
        |cc AS (SELECT cls, count(*) AS cnt FROM s GROUP BY 1),
        |cb AS (SELECT cls,
        |  coalesce(sum((cnt + greatest(cls, 1) - 1) // greatest(cls, 1))
        |    OVER (ORDER BY cls
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS base
        |  FROM cc)
        |SELECT r.cls AS cls, r.doc_id, r.n AS n_tokens,
        |  CAST(cb.base + rk // greatest(r.cls, 1) AS BIGINT) AS pack_id
        |FROM r JOIN cb ON cb.cls = r.cls
        |ORDER BY r.doc_id""".stripMargin,

    // same VALUES fixture (ONE Scala Seq), same three Java∩RE2
    // patterns spelled for RE2 — counts are integer-exact
    "q187_encoding_audit" ->
      s"""WITH docs(doc_id, text) AS (VALUES
        |    $mojibakeFixtureSqlValues),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '${operators.TextAnalysis.replacementRe}')) AS BIGINT)
        |    AS n_replacement,
        |  CAST(len(regexp_extract_all(text,
        |    '${operators.TextAnalysis.c1ControlRe}')) AS BIGINT)
        |    AS n_c1_control,
        |  CAST(len(regexp_extract_all(text,
        |    '${operators.TextAnalysis.doubleEncodeRe}')) AS BIGINT)
        |    AS n_double_encoded
        |  FROM docs)
        |SELECT doc_id, n_replacement, n_c1_control, n_double_encoded,
        |  (n_replacement + n_c1_control + n_double_encoded = 0)
        |    AS clean
        |FROM c ORDER BY doc_id""".stripMargin,

    // identical dense index (q148's window form), identical 48-bit
    // md5 draws mod n with the same self-remap, resolved by the same
    // index join
    "q153_negative_samples" ->
      """WITH ids AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY md5('17-' || doc_id)) - 1 AS sid
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM ids),
        |cand AS (SELECT i.doc_id, i.sid, CAST(r.j AS INT) AS neg_idx,
        |  CAST(('0x' || substr(md5('23-' || i.sid || '-' || r.j), 1, 12))
        |    AS BIGINT) % nn.n AS neg0, nn.n AS n
        |  FROM ids i CROSS JOIN nn CROSS JOIN range(0, 4) r(j)),
        |fx AS (SELECT doc_id, neg_idx,
        |  CASE WHEN neg0 = sid THEN (neg0 + 1) % n ELSE neg0 END AS nsid
        |  FROM cand)
        |SELECT f.doc_id, f.neg_idx, i2.doc_id AS neg_doc_id
        |FROM fx f JOIN ids i2 ON i2.sid = f.nsid
        |ORDER BY 1, 2""".stripMargin,

    // same 6 corr aggregates, 6-dp rounded, long-formed
    "q150_corr_matrix" ->
      """WITH s AS (SELECT
        |  round(corr(l_quantity, l_extendedprice), 6) AS c0,
        |  round(corr(l_quantity, l_discount), 6) AS c1,
        |  round(corr(l_quantity, l_tax), 6) AS c2,
        |  round(corr(l_extendedprice, l_discount), 6) AS c3,
        |  round(corr(l_extendedprice, l_tax), 6) AS c4,
        |  round(corr(l_discount, l_tax), 6) AS c5
        |  FROM lineitem)
        |SELECT col_a, col_b, corr FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    c0 AS corr FROM s
        |  UNION ALL SELECT 'l_quantity', 'l_discount', c1 FROM s
        |  UNION ALL SELECT 'l_quantity', 'l_tax', c2 FROM s
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', c3 FROM s
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', c4 FROM s
        |  UNION ALL SELECT 'l_discount', 'l_tax', c5 FROM s)
        |ORDER BY col_a, col_b""".stripMargin,

    // quartile replication (quantile_cont boundaries, the q72 device)
    // + the identical MI arithmetic: exact counts, per-cell term
    // rounded to 12 dp, DECIMAL sum
    "q151_mutual_info" ->
      """WITH b AS (SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS qs
        |  FROM events),
        |t AS (SELECT event_type AS x, 1
        |  + (value > qs[1])::INT + (value > qs[2])::INT
        |  + (value > qs[3])::INT AS y FROM events, b),
        |j AS (SELECT x, y, count(*) AS c FROM t GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM j GROUP BY 1),
        |my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM j GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j)
        |SELECT CAST(sum(CAST(round(
        |    (CAST(c AS DOUBLE) / n) *
        |    ln(CAST(c AS DOUBLE) * n / (CAST(cx AS DOUBLE) * cy)), 12)
        |  AS DECIMAL(38,12))) AS DOUBLE) AS mi_nats,
        |  max(n) AS n_rows, count(*) AS n_cells
        |FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n"""
        .stripMargin,

    // identical exact sums (x centered on the same global min) and
    // the identical rounded slope expression; x² via HUGEINT (exact,
    // as is Spark's DECIMAL(38,0))
    "q152_group_trend" ->
      """WITH m AS (SELECT min(epoch_us(ts)) AS m0 FROM events),
        |s AS (SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(CAST(epoch_us(ts) - m0 AS HUGEINT)) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(CAST(epoch_us(ts) - m0 AS DECIMAL(20,0))
        |    * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,4)))
        |    AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(epoch_us(ts) - m0 AS HUGEINT)
        |    * CAST(epoch_us(ts) - m0 AS HUGEINT)) AS DOUBLE) AS sxx
        |  FROM events, m GROUP BY 1)
        |SELECT event_type, n_rows,
        |  CASE WHEN n_rows * sxx - sx * sx = 0 THEN NULL
        |  ELSE round((n_rows * sxy - sx * sy) / (n_rows * sxx - sx * sx)
        |    * 86400000000.0, 9) END AS slope_per_day
        |FROM s ORDER BY event_type""".stripMargin,

    // the global-window form IS the oracle: identical seeded-md5
    // order key (hex strings compare identically), ids 0-based
    "q148_sequential_ids" ->
      """SELECT doc_id,
        |CAST(row_number() OVER (ORDER BY md5('17-' || doc_id)) - 1
        |  AS BIGINT) AS sample_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // full-outer-join replay of the union-tag diff: same
    // delete/update/insert construction, unchanged keys omitted
    "q149_snapshot_diff" ->
      """WITH b AS (SELECT event_id, value FROM events),
        |a AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 13 = 0 THEN value + 1.0 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 17 != 0
        |  UNION ALL
        |  SELECT event_id + 10000000, value FROM events
        |  WHERE event_id % 11 = 0)
        |SELECT coalesce(b.event_id, a.event_id) AS event_id,
        |  CASE WHEN b.event_id IS NULL THEN 'insert'
        |       WHEN a.event_id IS NULL THEN 'delete'
        |       WHEN a.value != b.value THEN 'update' END AS op
        |FROM b FULL JOIN a ON b.event_id = a.event_id
        |WHERE (b.event_id IS NULL OR a.event_id IS NULL
        |  OR a.value != b.value)
        |ORDER BY event_id""".stripMargin,

    // assignment CTE + within-cluster self-join + window-rank replay
    // of the (dist, id)-tiebroken top-3; sqdist is the proven
    // list_sum fold
    "q146_cluster_knn_join" ->
      s"""WITH ${hpAssignSql("vec_id, embedding")},
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  ${sqlSqDistCols("a.embedding", "b.embedding")} AS dist
        |  FROM a_ a JOIN a_ b ON a.cluster = b.cluster
        |  AND a.vec_id != b.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |  ORDER BY dist, neighbor_id) AS rn FROM p)
        |SELECT query_id, CAST(rn AS BIGINT) AS nb_rank, neighbor_id,
        |  dist
        |FROM r WHERE rn <= 3 ORDER BY query_id, nb_rank""".stripMargin,

    // identical interpolated percentiles (quantile_cont ≡ Spark's
    // percentile, the proven q47 device) baked into the same
    // least/greatest clip tree
    "q147_winsorize" ->
      """WITH b AS (SELECT quantile_cont(value, 0.01) AS lo,
        |  quantile_cont(value, 0.99) AS hi FROM events)
        |SELECT event_id, value,
        |  CASE WHEN value IS NULL THEN NULL
        |  ELSE least(greatest(value, lo), hi) END AS value_w
        |FROM events CROSS JOIN b ORDER BY event_id""".stripMargin,

    // the q31 assignment CTE + the q36 cosine tree, composed: a row is
    // dropped iff a lower-id same-cluster row clears the threshold
    "q142_semdedup" ->
      s"""WITH ${hpAssignSql("vec_id, embedding")},
        |e AS (SELECT vec_id, embedding, cluster,
        |  sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm FROM a_),
        |drp AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b
        |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  AND (CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0 ELSE
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))/(a.nrm*b.nrm)
        |    END) > 0.45)
        |SELECT e.cluster, e.vec_id AS id,
        |  CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
        |FROM e LEFT JOIN drp d ON d.vec_id = e.vec_id
        |ORDER BY cluster, id""".stripMargin,

    // decimated sample j is the EXACT source sample 4j, so the oracle
    // replays the fixture recipe at the picked indices; 16 samples →
    // 4 strips of 4
    "q141_audio_decimate" ->
      """WITH j AS (SELECT doc_id, unnest(range(0, 16)) AS j
        |FROM documents),
        |s AS (SELECT doc_id, CAST(j // 4 AS INT) AS strip,
        |(doc_id*7919 + (4*j)*104729) % 65536 - 32768 AS smp FROM j)
        |SELECT doc_id AS media_id, strip,
        |CAST(sqrt(CAST(sum(smp*smp) AS DOUBLE) / (4 * 1073741824.0))
        |AS FLOAT) AS rms
        |FROM s GROUP BY 1, 2 ORDER BY media_id, strip""".stripMargin,

    "q106_random_projection" -> rpOracleSql(seed = 2027L, outDim = 8, dim = 64),

    // the naive quadratic form IS the oracle — DuckDB's vectorized
    // levenshtein over 1500x1500 is fine at verification scale; the
    // engine's blocked join must produce the identical pair set
    "q91_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a, customer b
        |WHERE a.c_custkey < b.c_custkey
        |AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "q90_quota_sample" ->
      """WITH s AS (SELECT lang, doc_id,
        |CAST(('0x' || substr(md5('7-' || doc_id), 1, 8)) AS BIGINT) AS ord
        |FROM documents),
        |r AS (SELECT lang, doc_id, ord,
        |row_number() OVER (PARTITION BY lang ORDER BY ord, doc_id) AS rn
        |FROM s)
        |SELECT lang, doc_id, ord FROM r WHERE rn <= 20
        |ORDER BY lang, ord, doc_id""".stripMargin,

    // MERGE replayed relationally: source rows win, unmatched target
    // rows pass through
    "q85_merge_upsert" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |o_totalprice FROM orders),
        |src AS (
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |o_totalprice + 1000.5 AS o_totalprice
        |FROM o WHERE o_orderkey % 1000 = 0
        |UNION ALL
        |SELECT -o_orderkey - 1, o_custkey, 'N', 1.0
        |FROM o WHERE o_orderkey % 1000 = 0),
        |m AS (
        |SELECT * FROM src
        |UNION ALL
        |SELECT * FROM o
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src))
        |SELECT o_orderstatus, count(*) AS n_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |AS sum_price
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-cluster-per-dim mean of the hyperplane-assigned embeddings,
    // with the exact meanRounded5 f32 rounding pipeline
    "q41_vector_mean" -> {
      s"""WITH ${hpAssignSql("embedding AS emb2")},
         |ex AS (SELECT cluster, CAST(i AS INT) AS dim_idx,
         |CAST(emb2[i+1] AS DOUBLE) AS v
         |FROM a_ CROSS JOIN range(0, 64) r(i))
         |SELECT cluster, dim_idx,
         |${sqlMeanRounded5("sum(v)/count(*)")} AS mean_val
         |FROM ex GROUP BY cluster, dim_idx
         |ORDER BY cluster, dim_idx""".stripMargin
    })
}
