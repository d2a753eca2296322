package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skew that the optimizer can't fix on its own.
  *
  * AQE's skew-join splitting (on by default) handles most sort-merge
  * skew at runtime; explicit salting is for the cases it can't touch —
  * a shuffle keyed on a hot key feeding an aggregation, or a
  * broadcast-ineligible dimension with a few pathological keys.
  */
object Joins {

  /** Skew-resistant equi-join of a large, skewed `left` against a
    * `right` too big to broadcast whole: `left` rows get a
    * deterministic salt in [0, saltFactor) (hash of the whole row, so
    * retries salt identically), `right` is replicated saltFactor times,
    * and the join key becomes (key, salt) — one hot key spreads over
    * saltFactor tasks instead of one straggler.
    *
    * Cost: right side shuffles saltFactor×. Use the smallest
    * saltFactor that flattens the stragglers.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedL = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor))
        .cast("int"))
    val replicatedR = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedL.join(replicatedR, Seq(key, "_salt")).drop("_salt")
  }

  /** [[saltedJoin]] that pays the replication price only where it
    * helps: keys whose left-side row count exceeds `hotThreshold` are
    * salted ×`saltFactor`; the long tail joins unsalted (salt 0, one
    * right copy). Output is identical to the plain join; the extra
    * shuffle volume is `(saltFactor − 1) × |right rows on hot keys|`
    * instead of `(saltFactor − 1) × |right|`.
    *
    * The hot-key set is found with an exact count aggregation over the
    * left keys — cheap next to the join it protects (8-byte keys,
    * map-side partial counts) and broadcast to both sides, so it must
    * stay driver-small: pick `hotThreshold` so only genuine stragglers
    * qualify (at 100 TB a few dozen keys; a skew so diffuse that
    * millions of keys are "hot" is not salting's problem). */
  def saltedJoinHotKeys(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int,
      hotThreshold: Long): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(hotThreshold > 0, "hotThreshold must be positive")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("_graft_n"))
      .where(col("_graft_n") > hotThreshold)
      .select(col(key), lit(true).as("_hot"))
    val saltedL = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt",
        when(col("_hot"),
          pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor)))
          .otherwise(lit(0)).cast("int"))
      .drop("_hot")
    val replicatedR = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt",
        explode(when(col("_hot"), sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("_hot")
    saltedL.join(replicatedR, Seq(key, "_salt")).drop("_salt")
  }

  /** Range (interval-containment) join without a nested loop: match
    * each `points` row whose `ptCol` value falls in a `intervals` row's
    * half-open [`loCol`, `hiCol`) — the time-window / IP-block / value-
    * band join shape. Spark plans a raw `p >= lo AND p < hi` predicate
    * as BroadcastNestedLoopJoin (or a Cartesian product when neither
    * side fits in memory): O(|points|·|intervals|) comparisons and a
    * single-task bottleneck at scale.
    *
    * This operator turns it into an equi-join by quantizing the value
    * axis into fixed `binWidth` bins: every interval is exploded onto
    * each bin it overlaps, every point carries its one containing bin,
    * the join key is the bin, and the exact containment predicate
    * filters bin-mates. Each (interval, point) match is found in
    * exactly the point's bin, so the output needs no dedup.
    *
    * Cost model: the interval side replicates ×⌈len/binWidth⌉+1 and a
    * bin with many intervals × many points multiplies — pick binWidth
    * near the typical interval length so replication stays ~2× and
    * bins stay balanced. Both inputs shuffle once on the bin key;
    * everything (sequence/explode/floor) is codegen'd, no UDF.
    *
    * All range columns must be integral (epoch micros, IP as long,
    * cents); callers convert timestamps with `unix_micros`.
    */
  def rangeJoin(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireIntegral(points, Seq(ptCol), "rangeJoin")
    requireIntegral(intervals, Seq(loCol, hiCol), "rangeJoin")
    def bin(c: Column): Column = binCol(c, binWidth)
    val p = points.withColumn("_graft_bin", bin(col(ptCol)))
    // Half-open interval: the last covered bin is the one holding hi−1.
    // Empty/inverted intervals ([lo, hi) with hi <= lo) match nothing
    // and are dropped before `sequence` (whose step sign must match
    // the direction) can choke on them.
    val iv = intervals
      .where(col(loCol) < col(hiCol))
      .withColumn("_graft_bin",
        explode(sequence(
          bin(col(loCol)),
          bin(col(hiCol) - 1),
          lit(1L))))
    p.join(iv,
        p("_graft_bin") === iv("_graft_bin") &&
          p(ptCol) >= iv(loCol) && p(ptCol) < iv(hiCol))
      .drop("_graft_bin")
  }

  /** Interval-overlap join (`lLo < rHi && rLo < lHi`, both half-open)
    * on the same binning device as [[rangeJoin]] — with the twist that
    * two intervals can share MANY bins, which would either duplicate
    * every overlapping pair once per shared bin or force a `distinct()`
    * re-shuffle of the whole candidate set. Neither happens: a pair is
    * kept only in its CANONICAL shared bin — the bin of
    * `greatest(lLo, rLo)`, which for an overlapping pair is provably
    * the first bin both sides cover — so each pair emerges exactly
    * once from the join itself.
    *
    * Cost model matches [[rangeJoin]]: each side replicates
    * ×⌈len/binWidth⌉+1 and a dense bin multiplies; pick binWidth near
    * the typical interval length.
    */
  def intervalJoin(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireIntegral(left, Seq(lLo, lHi), "intervalJoin")
    requireIntegral(right, Seq(rLo, rHi), "intervalJoin")
    def bin(c: Column): Column = binCol(c, binWidth)
    def explodeBins(df: DataFrame, lo: String, hi: String, out: String) =
      df.where(col(lo) < col(hi))
        .withColumn(out,
          explode(sequence(bin(col(lo)), bin(col(hi) - 1), lit(1L))))
    val l = explodeBins(left, lLo, lHi, "_graft_bin_l")
    val r = explodeBins(right, rLo, rHi, "_graft_bin_r")
    l.join(r,
        l("_graft_bin_l") === r("_graft_bin_r") &&
          l(lLo) < r(rHi) && r(rLo) < l(lHi) &&
          l("_graft_bin_l") === bin(greatest(l(lLo), r(rLo))))
      .drop("_graft_bin_l", "_graft_bin_r")
  }

  /** Exact integer binning: Spark's `/` coerces long/long to DOUBLE,
    * which above 2^53 collapses neighboring values into one bin
    * (irregular bins — still correct, since any MONOTONE binning used
    * consistently on both sides preserves containment, but the skew is
    * pointless). `IntegralDivide` is true 64-bit integral division;
    * truncating (not flooring) division is fine for the same reason:
    * monotone. */
  private[operators] def binCol(c: Column, binWidth: Long): Column = {
    import org.apache.spark.sql.graftshim.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression(c.cast("long")), expression(lit(binWidth))))
  }

  // ------------------------------------------------- fuzzy string join

  /** FNV-1a over chars skipping up to two positions, splitmix64
    * finalizer — the hash of a deletion VARIANT computed without ever
    * materializing the variant string. Same hash family as the Dedup/
    * Curation kernels (deliberate small copy, same rationale). */
  @inline private def variantHash(s: String, skip1: Int, skip2: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      if (i != skip1 && i != skip2) h = (h ^ s.charAt(i)) * 0x100000001b3L
      i += 1
    }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Distinct 8-byte hashes of every string reachable from `s` by
    * deleting at most `k` characters (k ∈ {1, 2}), `s` itself
    * included. */
  private[operators] def deletionHashes(s: String, k: Int): Array[Long] = {
    val out = new java.util.HashSet[java.lang.Long]()
    out.add(variantHash(s, -1, -1))
    var i = 0
    while (i < s.length) {
      out.add(variantHash(s, i, -1))
      if (k >= 2) {
        var j = i + 1
        while (j < s.length) { out.add(variantHash(s, i, j)); j += 1 }
      }
      i += 1
    }
    val r = new Array[Long](out.size)
    val it = out.iterator(); var n = 0
    while (it.hasNext) { r(n) = it.next(); n += 1 }
    r
  }

  /** Public null-safe entry for the codegen'd expression form
    * ([[graft.functions.GraftDeletionHashes]]): null string → empty
    * neighborhood (no variants, so no candidate pairs — the join
    * semantics a null key should have). */
  def deletionHashesKernel(s: String, k: Int): Array[Long] =
    if (s == null) Array.emptyLongArray else deletionHashes(s, k)

  /** Edit-distance self-join (record-linkage blocking): all pairs
    * with `levenshtein ≤ maxDist`, as `(id_a, id_b, dist)`,
    * `id_a < id_b`.
    *
    * The naive form is an n² cross join with a Levenshtein filter —
    * BNLJ, hopeless at scale. This is the deletion-neighborhood
    * (FastSS) blocking instead: `ed(u, v) ≤ k` implies u and v share
    * a variant after deleting ≤ k chars from each (substitution =
    * the same position deleted from both; insertion = the inserted
    * char deleted from the longer), so candidates come from an
    * ordinary shuffled equi-join on 8-byte variant hashes —
    * replication ×(len+1) for k=1 — and are then verified with the
    * codegen'd `levenshtein`. Hash collisions and deletion-sharing
    * non-matches only ever ADD candidates; the exact verify removes
    * them, so the result is exact. Strings re-attach to the deduped
    * candidate pairs by 8-byte id equi-joins — the variant exchange
    * itself never carries strings.
    */
  def editDistanceSelfJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion neighborhoods are generated for maxDist 1 or 2, " +
        s"got $maxDist")
    val k = maxDist
    val v = df.select(col(idCol).as("id"), col(strCol).as("s"))
    // both self-join sides read the SAME deletion-neighborhood explode
    // — persist it once (CachePool generation-tracked): un-cached, the
    // k-deletion hash kernel ran twice, once per side
    val e = graft.CachePool.swap("joins.editdist.e", v.select(col("id"),
      explode(graft.functions.TextKernelFunctions
        .deletionHashesCol(col("s"), k)).as("vk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pairs = e.as("a")
      .join(e.as("b"),
        col("a.vk") === col("b.vk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    pairs
      .join(v.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
      .join(v.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** The binning (and the half-open `hi − 1` device) is defined on
    * integers only — a fractional coordinate would silently truncate
    * into a bin the other side never generates and drop true matches,
    * so reject non-integral columns loudly. */
  private def requireIntegral(
      df: DataFrame, cols: Seq[String], op: String): Unit =
    cols.foreach { c =>
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      val ok = dt == ByteType || dt == ShortType ||
        dt == IntegerType || dt == LongType
      require(ok,
        s"$op bins integral columns only (epoch micros, cents, ids); " +
          s"'$c' is $dt — quantize fractional coordinates to longs first")
    }
}
