package graft.kmeans

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** Property-based invariants (SURVEY §5.2) of one Lloyd iteration as
  * implemented by [[KMeans.fit]] with maxLoop = 2 (exactly one step),
  * over seeded random cases (points, k, init centroids). */
class PropertySpec extends SparkSpec {

  private case class Case(pts: List[Array[Float]], cents: Array[Array[Float]])

  private def cases(seed: Long, n: Int): Seq[Case] = {
    val rnd = new scala.util.Random(seed)
    def pt() = Array.fill(3)(rnd.nextFloat() * 20f - 10f)
    Seq.fill(n) {
      val np = 4 + rnd.nextInt(37)
      val k = 1 + rnd.nextInt(4)
      Case(List.fill(np)(pt()), Array.fill(k)(pt()))
    }
  }

  test("one iteration: new centroids are the 5-dp-rounded means of " +
    "assigned points, and assignment counts are preserved") {
    import spark.implicits._
    cases(seed = 7L, n = 12).foreach { case Case(pts, cents0) =>
      val k = cents0.length
      val model = KMeans.fit(
        pts.map(Tuple1(_)).toDF("features"),
        KMeansParams(k = k, threshold = -1.0, maxLoop = 2,
          initCentroids = Some(cents0.map(_.clone()))))

      // oracle: sequential assignment + mean
      val sums = Array.fill(k)(new Array[Double](3))
      val cnts = new Array[Long](k)
      pts.foreach { p =>
        val c = argminCentroid(p, cents0)
        addInto(sums(c), p); cnts(c) += 1
      }
      val expect = Array.tabulate(k) { c =>
        if (cnts(c) == 0) cents0(c) else meanRounded5(sums(c), cnts(c))
      }
      assert(cnts.sum === pts.length)
      model.centroids.zip(expect).foreach { case (g, e) =>
        assert(g.toSeq === e.toSeq)
      }
    }
  }

  test("one iteration is invariant under permutation of the input") {
    import spark.implicits._
    cases(seed = 11L, n = 8).foreach { case Case(pts, cents0) =>
      val k = cents0.length
      def run(ps: List[Array[Float]]) = KMeans.fit(
        ps.map(Tuple1(_)).toDF("features"),
        KMeansParams(k = k, threshold = -1.0, maxLoop = 2,
          initCentroids = Some(cents0.map(_.clone())))).centroids
      val a = run(pts)
      val b = run(new scala.util.Random(3).shuffle(pts))
      // 5-dp rounding absorbs the float-sum reorder; tiny residue allowed
      a.zip(b).foreach { case (x, y) =>
        x.zip(y).foreach { case (xc, yc) =>
          assert(math.abs(xc - yc) <= 2e-5f, s"${x.toSeq} vs ${y.toSeq}")
        }
      }
    }
  }

  test("labeling maps every point to its true nearest centroid") {
    import spark.implicits._
    cases(seed = 13L, n = 8).foreach { case Case(pts, cents) =>
      val labeled = KMeansModel(cents, 0, converged = true)
        .transform(pts.map(Tuple1(_)).toDF("features"))
        .collect()
        .map(r => (r.getSeq[Float](0).toArray, r.getInt(1)))
      labeled.foreach { case (p, c) =>
        assert(c === argminCentroid(p, cents))
      }
    }
  }

  test("iterating never increases within-cluster SSE (Lloyd invariant)") {
    import spark.implicits._
    cases(seed = 17L, n = 5).foreach { case Case(pts, cents0) =>
      val k = cents0.length
      def sse(cs: Array[Array[Float]]): Double =
        pts.map(p => sqdist(p, cs(argminCentroid(p, cs)))).sum
      var cents = cents0
      var prev = sse(cents)
      (1 to 3).foreach { _ =>
        cents = KMeans.fit(
          pts.map(Tuple1(_)).toDF("features"),
          KMeansParams(k = k, threshold = -1.0, maxLoop = 2,
            initCentroids = Some(cents.map(_.clone())))).centroids
        val s = sse(cents)
        assert(s <= prev + 1e-4, "SSE increased")
        prev = s
      }
    }
  }
}
