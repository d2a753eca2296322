package graft.operators

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  private def viaAggregator(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("key")
      .agg(TopK.smallestK(k)(col("ord"), col("id")).as("nb"))
      .select(col("key"), posexplode(col("nb")))
      .select(col("key"), (col("pos") + 1).as("rnk"),
        col("col.id").as("id"), col("col.ord").as("ord"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("key").orderBy(col("ord"), col("id"))
    df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1),
        r.getDouble(2))).sorted.toSeq
  }

  test("smallestK equals window row_number under heavy repartitioning") {
    import spark.implicits._
    val rnd = new Random(11)
    // duplicate ord values force the id tiebreak; 13 partitions force
    // nontrivial partial/final merges
    val df = Seq.fill(2000)((rnd.nextInt(5).toLong,
        rnd.nextInt(40).toLong, rnd.nextInt(25) / 10.0))
      .zipWithIndex.map { case ((key, _, ord), i) => (key, i.toLong, ord) }
      .toDF("key", "id", "ord")
      .repartition(13)
    for (k <- Seq(1, 3, 17))
      assert(viaAggregator(df, k) === viaWindow(df, k), s"k=$k")
  }

  test("groups smaller than k return whole group, ascending") {
    import spark.implicits._
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (2L, 20L, 5.0))
      .toDF("key", "id", "ord")
    val got = viaAggregator(df, 5)
    assert(got === Seq((1L, 1, 11L, 1.0), (1L, 2, 10L, 3.0),
      (2L, 1, 20L, 5.0)))
  }

  test("NaN ords sort last and cannot corrupt the buffer invariant") {
    val agg = new TopK.SmallestK(2)
    // NaN arrives first: raw </== comparisons would wedge it at the
    // head and then reject better values against a NaN sentinel
    val b = Seq(Double.NaN -> 1L, 1.0 -> 2L, 2.0 -> 3L, Double.NaN -> 4L)
      .foldLeft(agg.zero) { case (b, (o, i)) => agg.reduce(b, TopK.In(o, i)) }
    assert(agg.finish(b).map(n => (n.ord, n.id)).toSeq ===
      Seq((1.0, 2L), (2.0, 3L)))
    // fewer real values than k: NaN fills the tail (Spark sorts NaN
    // last), ties between NaNs break by id
    val b2 = Seq(Double.NaN -> 9L, 5.0 -> 1L, Double.NaN -> 3L)
      .foldLeft(agg.zero) { case (b, (o, i)) => agg.reduce(b, TopK.In(o, i)) }
    val f2 = agg.finish(b2)
    assert(f2.map(_.id).toSeq === Seq(1L, 3L))
    assert(f2(1).ord.isNaN)
  }

  test("-0.0 and 0.0 compare equal, falling through to the id tiebreak") {
    val agg = new TopK.SmallestK(2)
    val b = Seq(0.0 -> 7L, -0.0 -> 5L, 1.0 -> 1L)
      .foldLeft(agg.zero) { case (b, (o, i)) => agg.reduce(b, TopK.In(o, i)) }
    assert(agg.finish(b).map(_.id).toSeq === Seq(5L, 7L))
  }

  test("merge keeps exactly the k global smallest across partials") {
    val agg = new TopK.SmallestK(3)
    // merge mutates its first buffer in place (the aggregator
    // contract), so build fresh partials per merge
    def partial(xs: (Double, Long)*): TopK.Buf =
      xs.foldLeft(agg.zero) { case (b, (o, i)) => agg.reduce(b, TopK.In(o, i)) }
    val m = agg.finish(agg.merge(
      partial(1.0 -> 1L, 5.0 -> 5L, 9.0 -> 9L),
      partial(2.0 -> 2L, 3.0 -> 3L, 9.0 -> 8L)))
    assert(m.map(n => (n.ord, n.id)).toSeq === Seq((1.0, 1L), (2.0, 2L),
      (3.0, 3L)))
    // merge order must not matter
    val t = agg.finish(agg.merge(
      partial(2.0 -> 2L, 3.0 -> 3L, 9.0 -> 8L),
      partial(1.0 -> 1L, 5.0 -> 5L, 9.0 -> 9L)))
    assert(t.map(_.id).toSeq === Seq(1L, 2L, 3L))
  }
}
