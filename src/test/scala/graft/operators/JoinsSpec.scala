package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain join result") {
    import spark.implicits._
    // heavy skew: 90% of left rows share key 1
    val left = ((1 to 900).map(i => (1L, s"l$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"x$i"))).toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

    val plain = left.join(right, "k")
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = Joins.saltedJoin(left, right, "k", saltFactor = 8)
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.toSeq === plain.toSeq)
    assert(plain.count(_._1 == 1L) === 900)
  }

  test("saltedJoinHotKeys equals the plain join and replicates only hot keys") {
    import spark.implicits._
    val left = ((1 to 900).map(i => (1L, s"l$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"x$i"))).toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

    val plain = left.join(right, "k")
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = Joins
      .saltedJoinHotKeys(left, right, "k", saltFactor = 8, hotThreshold = 100)
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.toSeq === plain.toSeq)

    // only key 1 exceeds the threshold → the replicated right side is
    // |right| + (saltFactor-1) × |right rows on hot keys| = 50 + 7×1,
    // not the whole-side 50×8 the uniform saltedJoin pays
    val hot = left.groupBy("k").count().where($"count" > 100)
      .select(col("k"), lit(true).as("_hot"))
    val replicated = right.join(broadcast(hot), Seq("k"), "left")
      .withColumn("_salt",
        explode(when($"_hot", sequence(lit(0), lit(7)))
          .otherwise(array(lit(0)))))
    assert(replicated.count() === 50 + 7)
  }

  test("ngramJaccardPairs maxDocFreq drops boilerplate-driven pairs") {
    import spark.implicits._
    // boilerplate shared by 4 docs; genuine near-dup pair shares
    // shingles with doc-frequency 2, which survives the cap of 2
    val boiler = "zzcommonboilerplatezz"
    val docs = Seq(
      (1L, boiler + " unique alpha text one"),
      (2L, boiler + " totally different beta words"),
      (5L, boiler + " entirely other epsilon stuff"),
      (6L, boiler + " and more zeta padding rows"),
      (3L, "near duplicate gamma content here"),
      (4L, "near duplicate gamma content therے")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, n = 6, threshold = 0.2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardPairs(docs, n = 6, threshold = 0.2,
        maxDocFreq = Some(2))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1-2 are only similar through the shared boilerplate; 3-4 are
    // genuinely similar in their capped (unique) shingles
    assert(uncapped.contains((1L, 2L)))
    assert(!capped.contains((1L, 2L)))
    assert(capped.contains((3L, 4L)))
  }

  test("rangeJoin matches the naive theta-join, half-open bounds exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(300)(rnd.nextInt(1000).toLong).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pt_id", "pt")
    val intervals = Seq.fill(40)((rnd.nextInt(950).toLong, rnd.nextInt(120) + 1))
      .zipWithIndex
      .map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
      .toDF("iv_id", "lo", "hi")

    val naive = points.join(intervals,
        $"pt" >= $"lo" && $"pt" < $"hi")
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // binWidth far below, near, and far above typical interval length
    for (w <- Seq(7L, 64L, 500L)) {
      val got = Joins.rangeJoin(points, "pt", intervals, "lo", "hi", w)
        .select("pt_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === naive, s"binWidth=$w")
    }
  }

  test("rangeJoin bins exactly above 2^53 (integral div, no double collapse)") {
    import spark.implicits._
    // nanosecond-epoch-magnitude longs: double conversion has ulp 256
    // here, so FP binning would put boundary-adjacent values into one
    // irregular bin; integral `div` keeps every bin exact
    val base = (1L << 60) // ~1.15e18
    val points = (0L until 64L).map(i => (i, base + i)).toDF("pt_id", "pt")
    val intervals = Seq((0L, base + 2, base + 5), (1L, base + 30, base + 34))
      .toDF("iv_id", "lo", "hi")
    val got = Joins.rangeJoin(points, "pt", intervals, "lo", "hi", 2L)
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((2L, 0L), (3L, 0L), (4L, 0L),
      (30L, 1L), (31L, 1L), (32L, 1L), (33L, 1L)))
    // pin the binning itself: join output alone is invariant under ANY
    // monotone binning (the exact filter recovers it), so assert that
    // values binWidth apart above 2^53 land in DISTINCT bins — the FP
    // `/` collapses them (base and base+2 are the same double here)
    val bins = points
      .select(Joins.binCol(org.apache.spark.sql.functions.col("pt"), 2L))
      .collect().map(_.getLong(0)).distinct
    assert(bins.length === 32, s"expected 32 exact bins, got ${bins.length}")
  }

  test("range/interval joins reject fractional coordinate columns loudly") {
    import spark.implicits._
    val ivD = Seq((1L, 0.0, 2.5)).toDF("id", "lo", "hi")
    val ptL = Seq((1L, 2L)).toDF("id", "pt")
    val ivL = Seq((1L, 0L, 3L)).toDF("id", "lo", "hi")
    val ex1 = intercept[IllegalArgumentException] {
      Joins.rangeJoin(ptL, "pt", ivD, "lo", "hi", 1L)
    }
    assert(ex1.getMessage.contains("integral"))
    val ex2 = intercept[IllegalArgumentException] {
      Joins.intervalJoin(ivD, "lo", "hi", ivL, "lo", "hi", 1L)
    }
    assert(ex2.getMessage.contains("integral"))
  }

  test("intervalJoin equals the naive overlap join, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def mkIntervals(n: Int, prefix: Long) =
      Seq.fill(n)((rnd.nextInt(900).toLong, rnd.nextInt(200) + 1))
        .zipWithIndex
        .map { case ((lo, len), i) => (prefix + i, lo, lo + len) }
    val left = mkIntervals(60, 1000L).toDF("l_id", "l_lo", "l_hi")
    val right = mkIntervals(40, 2000L).toDF("r_id", "r_lo", "r_hi")

    val naive = left.join(right, $"l_lo" < $"r_hi" && $"r_lo" < $"l_hi")
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // widths well below, near, and above typical interval length —
    // many shared bins per pair in the small-width case, where a
    // per-shared-bin emit would duplicate pairs ~30×
    for (w <- Seq(7L, 128L, 1000L)) {
      val got = Joins
        .intervalJoin(left, "l_lo", "l_hi", right, "r_lo", "r_hi", w)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === naive, s"binWidth=$w") // exactly once: sorted seq equality
    }
  }

  test("rangeJoin drops empty and inverted intervals, boundary points land once") {
    import spark.implicits._
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 9L))
      .toDF("pt_id", "pt")
    val intervals = Seq(
      (100L, 10L, 20L),  // matches pt=10 (closed lo) and 19, not 20 (open hi)
      (101L, 30L, 30L),  // empty
      (102L, 50L, 40L))  // inverted
      .toDF("iv_id", "lo", "hi")
    val got = Joins.rangeJoin(points, "pt", intervals, "lo", "hi", 10L)
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (2L, 100L)))
  }

  private def edBrute(rows: Seq[(Long, String)], k: Int) =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      d = {
        // classic DP Levenshtein as an independent oracle
        val m = Array.tabulate(sa.length + 1, sb.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to sa.length; j <- 1 to sb.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
        m(sa.length)(sb.length)
      }
      if d <= k
    } yield (ia, ib, d.toLong)).toSet

  test("editDistanceSelfJoin equals brute force at k=1 and k=2") {
    import spark.implicits._
    // covers substitution, insertion, deletion, equality, and a
    // distance-2 pair that k=1 must exclude and k=2 must find
    val rows = Seq(
      1L -> "kitten", 2L -> "mitten", 3L -> "kittens", 4L -> "kitte",
      5L -> "kitten", 6L -> "mittens", 7L -> "sitting", 8L -> "xyz")
    val df = rows.toDF("id", "s").repartition(3)
    for (k <- Seq(1, 2)) {
      val got = Joins.editDistanceSelfJoin(df, "id", "s", maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got === edBrute(rows, k), s"maxDist=$k")
    }
  }

  test("editDistanceSelfJoin plans no cartesian/BNLJ") {
    import spark.implicits._
    val df = Seq(1L -> "abc", 2L -> "abd").toDF("id", "s")
    val plan = Joins.editDistanceSelfJoin(df, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
