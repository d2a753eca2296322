package graft.operators

import org.apache.spark.sql.functions.{col, greatest, lit}

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Independent replica of the A-ES key. */
  private def bruteKey(seed: String, id: Long, w: Double): Double = {
    val h = java.lang.Long.parseLong(md5Hex(s"$seed-$id").take(15), 16)
    val u = (h + 1L).toDouble / math.pow(2.0, 60)
    // round ln(u) to 9 dp BEFORE the division, mirroring
    // Sampling.weightedSample (Sampling.scala:46) and the q100 oracle
    BigDecimal(math.log(u))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble / w
  }

  private val rows = Seq( // (id, weight)
    (1L, 10L), (2L, 1L), (3L, 500L), (4L, 50L), (5L, 500L), (6L, 3L))

  test("weightedSample equals the brute-force A-ES ranking") {
    import spark.implicits._
    val df = rows.toDF("doc_id", "w").repartition(3)
    val got = Sampling.weightedSample(df, "doc_id", col("w"), k = 4,
        seed = "1337")
      .collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val exp = rows
      .map { case (id, w) => (id, w.toDouble, bruteKey("1337", id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }
      .take(4)
    assert(got === exp)
  }

  test("weightedSample with k >= n keeps every row, ranked") {
    import spark.implicits._
    val df = rows.toDF("doc_id", "w")
    val got = Sampling.weightedSample(df, "doc_id", col("w"), k = 100,
      seed = "7")
    assert(got.count() === rows.size.toLong)
  }

  test("a heavier weight can only raise a row's key, never lower it") {
    // ln(u) < 0, so dividing by a larger w moves the key toward 0
    val k1 = bruteKey("s", 42L, 1.0)
    val k2 = bruteKey("s", 42L, 100.0)
    assert(k2 > k1)
  }

  test("weightedSample plans the top-k as TakeOrderedAndProject") {
    import spark.implicits._
    val df = rows.toDF("doc_id", "w")
    val plan = Sampling.weightedSample(df, "doc_id",
        greatest(col("w"), lit(1)), 3, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  /** Independent replica of the temperatureMix ordering hash. */
  private def ord32(seed: String, id: Long): Long =
    java.lang.Long.parseLong(md5Hex(s"$seed-$id").take(8), 16)

  test("temperatureMix fills sqrt-proportional quotas in hash order") {
    import spark.implicits._
    // sources sized 9/4/1 -> sqrt weights 3/2/1 -> quotas 3/2/1 at k=6
    val docs = ((1L to 9L).map(i => (i, "A")) ++
      (10L to 13L).map(i => (i, "B")) ++ Seq((14L, "C")))
    val df = docs.toDF("doc_id", "source").repartition(3)
    val got = Sampling.temperatureMix(df, "doc_id", "source", k = 6,
        seed = "42")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val quota = Map("A" -> 3, "B" -> 2, "C" -> 1)
    val exp = docs.groupBy(_._2).toSeq.sortBy(_._1).flatMap {
      case (src, rs) =>
        rs.map { case (id, _) => (src, id, ord32("42", id)) }
          .sortBy { case (_, id, o) => (o, id) }
          .take(quota(src))
    }.sortBy { case (src, id, o) => (src, o, id) }
    assert(got === exp)
  }

  test("temperatureMix flattens the mix vs proportional sampling") {
    import spark.implicits._
    // 100:1 imbalance; alpha=0.5 gives the small source ~9% of the
    // mix instead of ~1%
    val docs = ((1L to 400L).map(i => (i, "big")) ++
      (401L to 404L).map(i => (i, "small")))
    val df = docs.toDF("doc_id", "source")
    val got = Sampling.temperatureMix(df, "doc_id", "source", k = 22,
        seed = "7")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights 20/2 -> quotas round(22*20/22)=20, round(22*2/22)=2
    assert(got === Map("big" -> 20L, "small" -> 2L))
  }

  test("sequentialIds equals the global window form, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("id", "t")
    val ord = md5(concat(lit("9-"), col("id").cast("string")))
    for (reshape <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        identity, _.repartition(13), _.repartition(1), _.coalesce(2))) {
      val got = Sampling.sequentialIds(reshape(df), ord, "sid")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val want = (0 until 500).map(_.toLong)
        .sortBy(i => {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"9-$i".getBytes("UTF-8"))
          d.map("%02x".format(_)).mkString
        })
        .zipWithIndex.map { case (id, r) => id -> r.toLong }.toMap
      assert(got === want)
      // contiguity: exactly 0..n-1
      assert(got.values.toSeq.sorted === (0L until 500L))
    }
  }

  test("negativeSamples: k non-self draws per row, partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 97).map(i => Tuple1(i.toLong * 10)).toDF("doc_id")
    val a = Sampling.negativeSamples(df, "doc_id", k = 5,
        orderSeed = 3L, negSeed = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // exactly k rows per id, never self
    assert(a.size === 97 * 5)
    assert(a.groupBy(_._1).forall(_._2.size == 5))
    a.foreach { case (id, _, neg) => assert(neg !== id) }
    // negatives come from the corpus
    val idSet = (0 until 97).map(_.toLong * 10).toSet
    a.foreach { case (_, _, neg) => assert(idSet.contains(neg)) }
    // bit-identical under repartitioning (seeded-md5 determinism)
    val b = Sampling.negativeSamples(df.repartition(13), "doc_id", k = 5,
        orderSeed = 3L, negSeed = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a === b)
    // draws are reasonably spread (not collapsed onto few partners)
    assert(a.map(_._3).distinct.size > 50)
  }

  test("stratifiedWeightedSample: per-group brute A-ES, bounded k") {
    import spark.implicits._
    val grouped = Seq( // (id, group, weight)
      (1L, "a", 10L), (2L, "a", 1L), (3L, "a", 500L), (4L, "a", 50L),
      (5L, "b", 500L), (6L, "b", 3L), (7L, "b", 7L),
      (8L, "c", 2L)) // group smaller than k keeps all
    val df = grouped.toDF("doc_id", "src", "w").repartition(3)
    val got = Sampling.stratifiedWeightedSample(
        df, "doc_id", "src", col("w"), k = 2, seed = "9")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val exp = grouped.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.map { case (id, _, w) => (g, id, bruteKey("9", id, w.toDouble)) }
        .sortBy { case (_, id, k) => (-k, id) }
        .take(2)
    }.sortBy { case (g, id, k) => (g, -k, id) }
    assert(got === exp)
    // partition-invariant
    val again = Sampling.stratifiedWeightedSample(
        df.repartition(7), "doc_id", "src", col("w"), k = 2, seed = "9")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again === got)
  }
}
