package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming surface: windowed aggregation over the `events`
  * table driven as a file stream (the reference is batch-only — this is
  * part of the beyond-reference pipeline surface).
  *
  * For verification the stream is run synchronously to completion over
  * the static parquet (memory sink + processAllAvailable) — the same
  * plan that, pointed at a real unbounded source with a watermark,
  * runs incrementally with state cleanup.
  */
object EventWindows {

  private val counter = new AtomicInteger(0)

  /** Run a streaming frame synchronously to a memory table and return
    * it. The stateful-operator partition count is pinned to
    * `statePartitions` for the query (shuffle-partitions conf at query
    * start, restored after): every state partition is a state-store
    * instance with per-trigger open/commit cost, so the count should
    * track key cardinality and executor count — these verification
    * queries aggregate 4–5000 keys, where the session default (32+)
    * only buys store-init overhead. An unbounded deployment sizes it
    * up; it is fixed at the first trigger either way, which is why it
    * is an explicit knob here. */
  private def runToMemory(
      spark: SparkSession,
      frame: DataFrame,
      mode: String,
      statePartitions: Int): DataFrame = {
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = frame.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    spark.table(name)
  }

  /** Tumbling-window aggregate per event_type: row count and value sum.
    * Window = 1 hour aligned to the epoch (matches `date_trunc('hour')`).
    * Sum goes through decimal so it is exact/associative — deterministic
    * under any merge order of streaming state. */
  /** File-stream source over the events table: the sf dir is the stream
    * directory (FileStreamSource requires a directory, not a file) with a
    * glob filter selecting the events parquet. */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir),
      Seq("ts"))
  }

  def hourlyByType(spark: SparkSession, dir: String): DataFrame = {
    val stream = eventsStream(spark, dir)
    // update mode + watermark: window state older than (max event time −
    // 2h) is evicted each trigger — the unbounded-deployment shape
    // (complete mode would ignore the watermark and hold every window
    // forever). The memory sink collects the update log; the row with
    // the highest n_events per key is the LATEST update (the count is
    // strictly increasing across updates), so the struct-max collapse
    // returns each window's final (count, sum) pair — exact for any
    // batch split, not just the single-batch verification run.
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
    runToMemory(spark, agg, "update", statePartitions = 8)
      .groupBy(unix_timestamp(col("w.start")).as("hour_epoch"),
        col("event_type"))
      .agg(max(struct(col("n_events"), col("sum_value"))).as("last"))
      .select(col("hour_epoch"), col("event_type"),
        col("last.n_events").as("n_events"),
        col("last.sum_value").as("sum_value"))
  }

  /** Stateful sessionization via `flatMapGroupsWithState`: split each
    * user's event stream into sessions separated by > `gapMinutes` of
    * event-time silence, emitting (user_id, session start/end epoch,
    * n_events).
    *
    * On this bounded file stream all events arrive in one batch, so the
    * group function sorts its events and emits every session including
    * the final one (state is only needed across batches). On an
    * unbounded stream the open session would stay in `GroupState` with
    * an event-time timeout; the emitted closed-session semantics are
    * identical — which is what the SQL oracle (lag/cumsum windowing in
    * DuckDB) checks.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val stream = eventsStream(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"))
      .as[(Long, Long)]

    def splitSessions(
        userId: Long,
        rows: Iterator[(Long, Long)],
        state: GroupState[Long]): Iterator[(Long, Long, Long, Long)] = {
      val ts = rows.map(_._2).toArray
      java.util.Arrays.sort(ts)
      if (ts.isEmpty) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var start = ts(0); var prev = ts(0); var n = 1L
        var i = 1
        while (i < ts.length) {
          if (ts(i) - prev > gapMicros) {
            out += ((userId, start, prev, n))
            start = ts(i); n = 0L
          }
          prev = ts(i); n += 1
          i += 1
        }
        out += ((userId, start, prev, n))
        out.iterator
      }
    }

    val sessions = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(splitSessions)

    runToMemory(spark,
        sessions.toDF("user_id", "start_us", "end_us", "n_events"),
        "append", statePartitions = 16)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
  }

  /** Streaming model scoring (SURVEY §7.5: streaming J1 against a
    * broadcast model): the embeddings table driven as a file stream,
    * every arriving vector labeled with its nearest centroid via the
    * codegen'd assignment chain — a pure narrow map on the stream, no
    * state — then a running per-cluster count (update mode; the tiny
    * k-row state needs no watermark to stay bounded). This is the
    * deployment shape for scoring an unbounded feed against a fitted
    * model: the model is a plan constant, re-deployed by restarting the
    * query with new centroids. */
  def streamAssignCounts(
      spark: SparkSession,
      dir: String,
      centroids: Array[Array[Float]]): DataFrame = {
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
    val agg = stream
      .select(graft.functions.VectorFunctions
        .assignCol(col("embedding"), centroids).as("cluster"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
    runToMemory(spark, agg, "update", statePartitions = 4)
      .groupBy(col("cluster"))
      .agg(max(col("n")).as("n")) // count is monotone; max = final value
  }

  /** Stream-static enrichment join: the events stream joined to the
    * static customer dimension (Spark broadcasts the static side per
    * micro-batch — no stream state at all for this join type), then a
    * per-nation running aggregate. The deployment shape for enriching
    * an unbounded feed with slowly-changing dimensions. */
  def streamEnrichByNation(spark: SparkSession, dir: String): DataFrame = {
    val customers = graft.sources.Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val stream = eventsStream(spark, dir)
      .join(customers, col("user_id") === col("c_custkey"))
    val agg = stream
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
    runToMemory(spark, agg, "update", statePartitions = 8)
      .groupBy(col("c_nationkey"))
      .agg(max(struct(col("n_events"), col("sum_value"))).as("last"))
      .select(col("c_nationkey"),
        col("last.n_events").as("n_events"),
        col("last.sum_value").as("sum_value"))
  }

  /** Streaming exact dedup at ingest: `dropDuplicates` on the 64-bit
    * text fingerprint over the documents feed — the state store keeps
    * one 8-byte key per distinct document, the streaming analog of the
    * batch exact-dedup shuffle (q09). Emits the surviving distinct
    * count per fingerprint-shard so the result is order-independent
    * (which rows survive is first-arrival nondeterminism; how many is
    * exact). */
  def streamDedupCount(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    // state key = 8-byte fingerprint; the reported shard is a
    // text-derived bucket (length mod 16) so the oracle can recompute
    // it engine-independently (DuckDB has no xxhash64)
    val deduped = stream
      .select(xxhash64(col("text")).as("fp"),
        pmod(length(col("text")), lit(16)).as("shard"))
      .dropDuplicates("fp")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_distinct"))
    runToMemory(spark, deduped, "update", statePartitions = 8)
      .groupBy(col("shard"))
      .agg(max(col("n_distinct")).as("n_distinct"))
  }

  /** Per-user hourly windowed counts with a watermark — in **update**
    * output mode, where the watermark actually governs state: windows
    * older than (max event time − 2h) are finalized and their state
    * evicted each trigger, which is the unbounded-deployment path
    * (complete mode would silently ignore the watermark and retain all
    * window state forever).
    *
    * The memory sink in update mode receives one row per window-key per
    * trigger that changed it; the per-key count is monotonically
    * non-decreasing, so `max` collapses the update log to each window's
    * final value (a single-batch run emits each key exactly once). */
  def hourlyPerUser(spark: SparkSession, dir: String): DataFrame = {
    val stream = eventsStream(spark, dir)
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    runToMemory(spark, agg, "update", statePartitions = 16)
      .groupBy(unix_timestamp(col("w.start")).as("hour_epoch"),
        col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
  }
}
