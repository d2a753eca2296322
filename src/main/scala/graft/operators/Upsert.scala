package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style upsert (SQL MERGE semantics, matched-update +
  * not-matched-insert): apply a batch of change rows to a snapshot,
  * source winning on key collision — the maintenance operation behind
  * every incrementally-refreshed table a pipeline keeps (latest doc
  * version, mutable dimension, checkpointed aggregate).
  *
  * Shape at scale: NOT a full-outer join — Spark cannot broadcast
  * either side of one, so the snapshot would always sort-merge. Instead
  * union-with-priority + one hash aggregation keyed on the merge key:
  * a single shuffle of (key, payload) with map-side partial `min_by`,
  * and AQE coalesces the change side's tiny partitions into the
  * snapshot's. Both inputs must share the schema (`unionByName`), keys
  * non-null.
  */
object Upsert {

  /** Merge `source` change rows into `target`: rows whose `keys` match
    * an existing target row replace it; unmatched source rows are
    * inserts; untouched target rows pass through. Column set and order
    * is `target`'s.
    *
    * Precondition (standard MERGE contract — SQL MERGE errors on a
    * doubly-matched row): `source` must carry at most one row per key.
    * Duplicate source keys are NOT detected (a global check would cost
    * an extra aggregation); the surviving row would be arbitrary. */
  def upsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val cols = target.columns.toSeq
    require(keys.forall(cols.contains),
      s"keys ${keys.filterNot(cols.contains)} missing from target")
    require(!cols.contains("_graft_prio"),
      "column name _graft_prio is reserved by upsert")
    val payload = cols.filterNot(keys.contains)
    val tagged = source.select(cols.map(col): _*)
      .withColumn("_graft_prio", lit(0))
      .unionByName(target.select(cols.map(col): _*)
        .withColumn("_graft_prio", lit(1)))
    tagged
      .groupBy(keys.map(col): _*)
      .agg(
        min_by(struct(payload.map(col): _*), col("_graft_prio"))
          .as("_graft_row"))
      .select(cols.map {
        case k if keys.contains(k) => col(k)
        // getField resolves by exact name — col("_graft_row.a.b")
        // would misparse a payload column literally named "a.b"
        case c => col("_graft_row").getField(c).as(c)
      }: _*)
  }

  /** Diff two snapshots of a keyed table into a change feed:
    * one row per key whose state differs, tagged `insert` (key only
    * in `after`), `delete` (only in `before`), or `update` (in both,
    * payload differs); unchanged keys are omitted. The
    * validation/reconciliation half of the CDC loop ([[upsert]] is
    * the apply half): diff(before, after) applied back onto `before`
    * reproduces `after`.
    *
    * Shape at scale: the same no-full-outer-join device as
    * [[upsert]] — union-with-tag + ONE hash aggregation on the key
    * (max of a one-or-zero-row struct per side), map-side combine,
    * single shuffle of (key, payload).
    *
    * Precondition: keys unique within each snapshot (the [[upsert]]
    * contract; a doubly-keyed snapshot would diff an arbitrary
    * surviving row). Returns (keys…, op) — add payload by joining
    * back on the key. */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val cols = before.columns.toSeq
    require(after.columns.toSeq.sorted == cols.sorted,
      s"snapshots must share a schema: ${cols.sorted} vs " +
        s"${after.columns.toSeq.sorted}")
    require(keys.forall(cols.contains),
      s"keys ${keys.filterNot(cols.contains)} missing from the snapshots")
    require(!cols.contains("_graft_side"),
      "column name _graft_side is reserved by snapshotDiff")
    val payload = cols.filterNot(keys.contains)
    require(payload.nonEmpty,
      "snapshots need at least one non-key column to diff")
    val tagged = before.select(cols.map(col): _*)
      .withColumn("_graft_side", lit("b"))
      .unionByName(after.select(cols.map(col): _*)
        .withColumn("_graft_side", lit("a")))
    tagged.groupBy(keys.map(col): _*)
      .agg(
        max(when(col("_graft_side") === "b",
          struct(payload.map(col): _*))).as("pb"),
        max(when(col("_graft_side") === "a",
          struct(payload.map(col): _*))).as("pa"))
      .withColumn("op",
        when(col("pb").isNull, lit("insert"))
          .when(col("pa").isNull, lit("delete"))
          .when(col("pa") =!= col("pb"), lit("update")))
      .where(col("op").isNotNull)
      .select(keys.map(col) :+ col("op"): _*)
  }

  /** Replay an ordered CDC changelog onto a keyed snapshot — the
    * third leg of the CDC loop ([[upsert]] merges one batch,
    * [[snapshotDiff]] derives a feed, this APPLIES a feed): per key
    * only the HIGHEST-`seqCol` change row counts; an `op` of
    * `"delete"` tombstones the key, anything else upserts the change
    * row's payload. Unchanged target rows pass through; non-delete
    * changes for absent keys insert. Column set and order is
    * `target`'s; `changes` must carry target's columns plus
    * (`opCol`, `seqCol`).
    *
    * Precondition (same contract as [[upsert]]): (key, seq) pairs are
    * unique — a tied max seq would pick an arbitrary winner. One
    * groupBy on the changelog + one full-outer join on the keys;
    * nothing driver-resident, and the changelog side aggregates to
    * one row per touched key before the join. */
  def applyChangeLog(
      target: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "applyChangeLog needs at least one key column")
    val cols = target.columns.toSeq
    require(keys.forall(cols.contains),
      s"keys ${keys.filterNot(cols.contains)} missing from target")
    Seq("_graft_last", "_graft_tgt").foreach(r =>
      require(!cols.contains(r), s"column name $r is reserved"))
    val payload = cols.filterNot(keys.contains)
    val last = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(col(opCol).as("_op") +: payload.map(col): _*),
        col(seqCol)).as("_graft_last"))
    target
      .select(keys.map(col) :+
        struct(payload.map(col): _*).as("_graft_tgt"): _*)
      .join(last, keys, "full_outer")
      // coalesce: a NULL op must read as "not a delete" (upsert), not
      // slip through `=!=`'s three-valued NULL and silently drop the key
      .where(col("_graft_last").isNull ||
        coalesce(col("_graft_last").getField("_op") =!= "delete",
          lit(true)))
      .select(cols.map {
        case k if keys.contains(k) => col(k)
        case c => when(col("_graft_last").isNotNull,
            col("_graft_last").getField(c))
          .otherwise(col("_graft_tgt").getField(c)).as(c)
      }: _*)
  }
}
