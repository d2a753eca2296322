package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded random-case invariants for the round-8 operators (the
  * PropertySpec device applied beyond the K-Means core): each test
  * replays many generated cases against an independent in-memory
  * replica or a structural invariant. */
class Round8PropertySpec extends SparkSpec {

  test("snapshotDiff ≡ brute replica over random keyed snapshots") {
    import spark.implicits._
    val rnd = new scala.util.Random(43L)
    (0 until 8).foreach { _ =>
      val nb = 5 + rnd.nextInt(60)
      val before = (0 until nb)
        .map(i => (i.toLong, math.floor(rnd.nextDouble() * 1000) / 100))
      // after: drop ~1/4, perturb ~1/3 of the survivors, insert a few
      val after = before.filter(_ => rnd.nextDouble() > 0.25)
        .map { case (k, v) =>
          if (rnd.nextDouble() < 0.33) (k, v + 1.0) else (k, v)
        } ++ (0 until rnd.nextInt(8)).map(j => (1000L + j, 1.0))
      val bm = before.toMap; val am = after.toMap
      val expect = ((bm.keySet ++ am.keySet).flatMap { k =>
        (bm.get(k), am.get(k)) match {
          case (None, Some(_)) => Some(k -> "insert")
          case (Some(_), None) => Some(k -> "delete")
          case (Some(b), Some(a)) if a != b => Some(k -> "update")
          case _ => None
        }
      }).toMap
      val got = Upsert.snapshotDiff(
          before.toDF("k", "v").repartition(3),
          after.toDF("k", "v").repartition(2), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === expect)
      // reflexivity: diff(x, x) is empty
      assert(Upsert.snapshotDiff(before.toDF("k", "v"),
        before.toDF("k", "v"), Seq("k")).count() === 0L)
    }
  }

  test("winsorize: clamped to the band, monotone, count-preserving") {
    import spark.implicits._
    val rnd = new scala.util.Random(19L)
    (0 until 6).foreach { _ =>
      val n = 20 + rnd.nextInt(400)
      val vals = Seq.fill(n)(math.floor(rnd.nextDouble() * 1e6) / 100)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").repartition(1 + rnd.nextInt(6))
      val got = Quantiles.winsorize(df, "v", 0.05, 0.95, "w")
        .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toSeq
      assert(got.size === n)
      val lo = got.map(_._2).min; val hi = got.map(_._2).max
      // every output inside the realized band; order preserved
      got.foreach { case (_, w) => assert(w >= lo && w <= hi) }
      got.sortBy(_._1).map(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a <= b)
        case _ =>
      }
      // interior values pass through untouched
      got.foreach { case (v, w) => if (v > lo && v < hi) assert(w === v) }
    }
  }

  test("semDedup ≡ brute replica on random vectors, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    val cents = Array(Array(1f, 0f, 0f), Array(0f, 1f, 0f),
      Array(0f, 0f, 1f))
    (0 until 4).foreach { _ =>
      val n = 30 + rnd.nextInt(80)
      val rows = (0 until n).map(i =>
        (i.toLong, Array.fill(3)(rnd.nextFloat())))
      def sq(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) =>
          val d = x.toDouble - y.toDouble; d * d }.sum
      def cos(a: Array[Float], b: Array[Float]): Double = {
        def dot(u: Array[Float], v: Array[Float]) =
          u.zip(v).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
        if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
      }
      val cl = rows.map { case (id, e) =>
        id -> cents.indices.minBy(c => (sq(e, cents(c)), c))
      }.toMap
      val emb = rows.toMap
      val t = 0.97
      val expect = rows.map { case (id, e) =>
        id -> rows.exists { case (jd, je) =>
          jd < id && cl(jd) == cl(id) && cos(je, e) > t
        }
      }.toMap
      for (p <- Seq(1, 7)) {
        val got = Dedup.semDedup(
            rows.toDF("vec_id", "embedding").repartition(p), cents, t)
          .collect().map(r => r.getLong(1) -> (r.getInt(2) == 0)).toMap
        assert(got === expect, s"n=$n p=$p")
      }
    }
  }
}
