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
  * Ordering is ascending (ord, id) with the id as tiebreak, so the
  * result is fully deterministic under any partitioning or merge
  * order — which is what lets an oracle hash-compare hold.
  */
object TopK {
  /** input row: ordering value + payload id */
  final case class In(ord: Double, id: Long)

  /** one result entry (field names surface as struct fields downstream) */
  final case class Neighbor(id: Long, ord: Double)

  /** buffer: parallel arrays sorted ascending by (ord, id), length ≤ k */
  final case class Buf(ords: Array[Double], ids: Array[Long])

  final class SmallestK(k: Int) extends Aggregator[In, Buf, Array[Neighbor]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyLongArray)

    @inline private def before(o1: Double, i1: Long, o2: Double, i2: Long): Boolean =
      o1 < o2 || (o1 == o2 && i1 < i2)

    private def insert(b: Buf, ord: Double, id: Long): Buf = {
      val n = b.ords.length
      if (n == k && !before(ord, id, b.ords(n - 1), b.ids(n - 1))) return b
      var i = 0
      while (i < n && before(b.ords(i), b.ids(i), ord, id)) i += 1
      val m = math.min(n + 1, k)
      val ords = new Array[Double](m); val ids = new Array[Long](m)
      System.arraycopy(b.ords, 0, ords, 0, i)
      System.arraycopy(b.ids, 0, ids, 0, i)
      ords(i) = ord; ids(i) = id
      val tail = m - i - 1 // when full, the old worst falls off the end
      if (tail > 0) {
        System.arraycopy(b.ords, i, ords, i + 1, tail)
        System.arraycopy(b.ids, i, ids, i + 1, tail)
      }
      Buf(ords, ids)
    }

    override def reduce(b: Buf, a: In): Buf = insert(b, a.ord, a.id)

    override def merge(b1: Buf, b2: Buf): Buf = {
      var b = b1; var i = 0
      while (i < b2.ords.length) { b = insert(b, b2.ords(i), b2.ids(i)); i += 1 }
      b
    }

    override def finish(b: Buf): Array[Neighbor] =
      Array.tabulate(b.ords.length)(i => Neighbor(b.ids(i), b.ords(i)))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Neighbor]] =
      ExpressionEncoder[Array[Neighbor]]()
  }

  /** Smallest-k (ord, id) pairs per group, ascending — an array of
    * `(id, ord)` structs ready for `posexplode`. */
  def smallestK(k: Int)(ord: Column, id: Column): Column =
    udaf(new SmallestK(k)).apply(ord, id)
}
