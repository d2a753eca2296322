package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.VectorFunctions.{argminCentroid, sqdist}

class QuantizationSpec extends SparkSpec {

  // dim=4, two subspaces of 2; two tight groups per subspace so the
  // fit converges immediately and codes are unambiguous
  private val vecs: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(0f, 0f, 10f, 10f),
    1L -> Array(0.2f, 0f, 10f, 10.2f),
    2L -> Array(5f, 5f, 0f, 0f),
    3L -> Array(5.2f, 5f, 0.2f, 0f),
    4L -> Array(0f, 0.2f, 0f, 0.2f),
    5L -> Array(5f, 5.2f, 10.2f, 10f))

  private def df = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding").repartition(2)
  }

  private def fit() =
    Quantization.fitPQ(df, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 3)

  test("encodePQ assigns every row its brute-force nearest sub-centroid") {
    val cb = fit()
    val got = Quantization.encodePQ(df, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    vecs.foreach { case (id, v) =>
      val exp = (0 until cb.m).map { j =>
        argminCentroid(
          v.slice(j * cb.subDim, (j + 1) * cb.subDim), cb.books(j))
      }
      assert(got(id) === exp, s"vec $id")
    }
  }

  test("encodePQ at the production shape (m=4, k=16, dim=64) stays " +
      "whole-stage-compiled — the inline-chain form overran 64 KB") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val big = (0L until 32L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f).toSeq)).toDF(
      "vec_id", "embedding").repartition(2) // defeat ConvertToLocalRelation
    val cb = Quantization.fitPQ(big, "vec_id", "embedding",
      dim = 64, m = 4, k = 16, iters = 2)
    val enc = Quantization.encodePQ(big, "vec_id", "embedding", cb)
    val errs = org.apache.spark.sql.graftshim.codegenCompileErrors(enc)
    assert(errs.isEmpty, s"codegen compile failures: $errs")
    assert(enc.queryExecution.executedPlan.toString
      .contains("vec_argmin_sqdist"))
    // picks still brute-force-exact at this shape
    val got = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    big.collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).toArray
      val exp = (0 until cb.m).map { j =>
        argminCentroid(
          v.slice(j * cb.subDim, (j + 1) * cb.subDim), cb.books(j))
      }
      assert(got(id) === exp, s"vec $id")
    }
  }

  test("adcTopK equals a brute-force ADC ranking") {
    val cb = fit()
    val query = Array(0.1f, 0.1f, 9.9f, 10.1f)
    val enc = Quantization.encodePQ(df, "vec_id", "embedding", cb)
    val got = Quantization.adcTopK(enc, cb, query, topK = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = vecs.map { case (id, v) =>
      val codes = (0 until cb.m).map { j =>
        argminCentroid(
          v.slice(j * cb.subDim, (j + 1) * cb.subDim), cb.books(j))
      }
      val d = (0 until cb.m).map { j =>
        sqdist(query.slice(j * cb.subDim, (j + 1) * cb.subDim),
          cb.books(j)(codes(j)))
      }.reduceLeft(_ + _)
      (id, d)
    }.sortBy { case (id, d) => (d, id) }
    assert(got === exp)
  }

  test("encode + ADC stay narrow: no shuffle before the top-k heap") {
    import spark.implicits._
    val cb = fit()
    val flat = vecs.toDF("vec_id", "embedding") // no repartition Exchange
    val enc = Quantization.encodePQ(flat, "vec_id", "embedding", cb)
    val plan = Quantization.adcTopK(enc, cb, Array(0f, 0f, 0f, 0f), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("ivfPqTopK with nprobe = nlist equals a full ADC scan") {
    val cb = fit()
    val query = Array(5.1f, 5f, 0.1f, 0f)
    val index = Similarity.buildIvfIndex(df, nlist = 2, quantizerIters = 3,
      initCentroids = Some(Array(vecs(0)._2, vecs(2)._2)))
    val full = Quantization.adcTopK(
        Quantization.encodePQ(df, "vec_id", "embedding", cb), cb, query, 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = Quantization.ivfPqTopK(index, cb, query, 6, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === full)
    index.unpersist()
  }

  test("ivfPqTopK with nprobe = 1 only returns the nearest cell's rows") {
    val cb = fit()
    val query = Array(5.1f, 5f, 0.1f, 0f)
    val index = Similarity.buildIvfIndex(df, nlist = 2, quantizerIters = 3,
      initCentroids = Some(Array(vecs(0)._2, vecs(2)._2)))
    val probedCell = index.centroids.zipWithIndex
      .minBy { case (c, i) => (sqdist(query, c), i) }._2
    val members = index.assigned.where(col("cell") === probedCell)
      .collect().map(_.getLong(0)).toSet
    val got = Quantization.ivfPqTopK(index, cb, query, 6, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got.subsetOf(members))
    index.unpersist()
  }

  test("persisted PQ index roundtrips and probes identically") {
    val cb = fit()
    val query = Array(0.1f, 0.1f, 9.9f, 10.1f)
    val index = Similarity.buildIvfIndex(df, nlist = 2, quantizerIters = 3,
      initCentroids = Some(Array(vecs(0)._2, vecs(2)._2)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqidx_spec").toString
    try {
      Quantization.writePqIndex(df, "vec_id", "embedding", cb, dir,
        coarse = Some(index))
      val re = Quantization.readPqIndex(spark, dir, "vec_id")
      // codebooks byte-identical through the parquet roundtrip
      assert(re.cb.m === cb.m && re.cb.subDim === cb.subDim)
      (0 until cb.m).foreach { j =>
        (0 until cb.k).foreach { c =>
          assert(re.cb.books(j)(c).toSeq === cb.books(j)(c).toSeq, s"($j,$c)")
        }
      }
      // ADC over the persisted codes == ADC over a fresh encode
      val fresh = Quantization.adcTopK(
          Quantization.encodePQ(df, "vec_id", "embedding", cb), cb, query, 6)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val probed = re.adcProbe(query, 6)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(probed === fresh)
      // IVF-PQ over the persisted cell codes == the build-side probe,
      // and the scan prunes to the probed cells' partitions
      val ivfFresh = Quantization.ivfPqTopK(index, cb, query, 6, nprobe = 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val ivfProbe = re.ivfPqProbe(query, 6, nprobe = 1)
      assert(ivfProbe.collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq === ivfFresh)
      val scan = ivfProbe.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters"), scan)
    } finally {
      index.unpersist()
      graft.TempCleanup.register(dir)
      ()
    }
  }

  test("fitPQ rejects a subspace count that does not divide dim") {
    intercept[IllegalArgumentException] {
      Quantization.fitPQ(df, "vec_id", "embedding",
        dim = 4, m = 3, k = 2, iters = 1)
    }
  }

  test("int8QuantizeReport matches the scalar replica; zero vector is clean") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.127f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: scale 0, rmse 0
      (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f)))
    val got = Quantization.int8QuantizeReport(
        vecs.toDF("vec_id", "embedding").repartition(3),
        "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    def replica(xs: Array[Float]): (Double, Double) = {
      val scale = xs.map(x => math.abs(x.toDouble)).max / 127.0
      if (scale == 0.0) (0.0, 0.0)
      else {
        val terms = xs.map { xf =>
          val x = xf.toDouble
          // half-AWAY rounding (the engine's), not math.rint's half-even
          val q = BigDecimal(x / scale)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
          val dd = (x - q * scale) / scale
          BigDecimal(dd * dd).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        (scale, math.sqrt(terms.sum.toDouble / xs.length))
      }
    }
    val exp = vecs.map { case (id, xs) =>
      val (s, r) = replica(xs); (id, s, r)
    }
    assert(got.toSeq === exp)
    // codes for vec 1 reconstruct within half a step of the input
    val s1 = replica(vecs.head._2)._1
    vecs.head._2.foreach { xf =>
      val q = BigDecimal(xf.toDouble / s1)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(q) <= 127.0)
      assert(math.abs(q * s1 - xf.toDouble) <= s1 / 2 + 1e-15)
    }
  }
}
