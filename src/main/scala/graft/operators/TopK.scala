package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k per key as a typed `Aggregator` — the scalable
  * grouped order statistic. The window-rank alternative
  * (`row_number() over (partition by key order by ord)` then
  * `rank <= k`) ships EVERY row through the exchange to its key's
  * reducer and sorts the whole group there; this aggregator's state is
  * k-capped, so map-side partial aggregation collapses each
  * (map partition, key) to at most k rows BEFORE the shuffle — the
  * exchange carries ≤ partitions·k rows per key no matter how many
  * rows the key has. It is the same Combiner leverage the reference
  * applies to sums (KCombiner.java:9-18) and
  * [[graft.kmeans.VectorMeanAggregator]] reproduces for means, applied
  * to an order statistic (which `sum`/`min`/`max` can't express and
  * `collect_list` only expresses with unbounded state).
  *
  * Ordering is ascending (ord, id) with the id as tiebreak, matching
  * Spark's sort semantics on doubles (NaN greatest, −0.0 = 0.0), so
  * the result is fully deterministic under any partitioning or merge
  * order — which is what lets an oracle hash-compare hold.
  */
object TopK {
  /** input row: ordering value + payload id */
  final case class In(ord: Double, id: Long)

  /** one result entry (field names surface as struct fields downstream) */
  final case class Neighbor(id: Long, ord: Double)

  /** buffer: parallel arrays sorted ascending by (ord, id); `used`
    * entries are live. Arrays grow once to capacity k on first insert
    * and are then mutated in place (Spark's aggregator contract allows
    * mutating and returning the buffer — zero steady-state allocation
    * on the hot reduce path; a rejected row is a single comparison). */
  final case class Buf(var ords: Array[Double], var ids: Array[Long],
      var used: Int)

  final class SmallestK(k: Int) extends Aggregator[In, Buf, Array[Neighbor]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: Buf =
      Buf(Array.emptyDoubleArray, Array.emptyLongArray, 0)

    // Spark sort semantics for doubles: −0.0 and 0.0 compare equal
    // (fall through to the id tiebreak), NaN sorts greater than
    // everything. Raw </== would let a NaN corrupt the sorted-buffer
    // invariant (NaN compares false both ways) and make the result
    // arrival-order-dependent.
    @inline private def norm(d: Double): Double = if (d == 0.0d) 0.0d else d
    @inline private def before(o1: Double, i1: Long,
        o2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(norm(o1), norm(o2))
      c < 0 || (c == 0 && i1 < i2)
    }

    private def insert(b: Buf, ord: Double, id: Long): Buf = {
      val n = b.used
      if (n == k && !before(ord, id, b.ords(n - 1), b.ids(n - 1))) return b
      if (b.ords.length < k) { // grow to full capacity exactly once
        val no = new Array[Double](k); val ni = new Array[Long](k)
        System.arraycopy(b.ords, 0, no, 0, n)
        System.arraycopy(b.ids, 0, ni, 0, n)
        b.ords = no; b.ids = ni
      }
      var i = 0
      while (i < n && before(b.ords(i), b.ids(i), ord, id)) i += 1
      val m = math.min(n + 1, k)
      val shift = m - i - 1 // when full, the old worst falls off the end
      if (shift > 0) {
        System.arraycopy(b.ords, i, b.ords, i + 1, shift)
        System.arraycopy(b.ids, i, b.ids, i + 1, shift)
      }
      b.ords(i) = ord; b.ids(i) = id; b.used = m
      b
    }

    override def reduce(b: Buf, a: In): Buf = insert(b, a.ord, a.id)

    override def merge(b1: Buf, b2: Buf): Buf = {
      var b = b1; var i = 0
      while (i < b2.used) { b = insert(b, b2.ords(i), b2.ids(i)); i += 1 }
      b
    }

    override def finish(b: Buf): Array[Neighbor] =
      Array.tabulate(b.used)(i => Neighbor(b.ids(i), b.ords(i)))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Neighbor]] =
      ExpressionEncoder[Array[Neighbor]]()
  }

  /** Smallest-k (ord, id) pairs per group, ascending — an array of
    * `(id, ord)` structs ready for `posexplode`. */
  def smallestK(k: Int)(ord: Column, id: Column): Column =
    udaf(new SmallestK(k)).apply(ord, id)
}
