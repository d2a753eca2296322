package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorFunctionsScalaSpec extends AnyFunSuite {

  test("euclidean matches hand computation (3-4-5)") {
    assert(euclidean(Array(0f, 0f), Array(3f, 4f)) === 5.0)
  }

  test("euclidean of identical vectors is 0") {
    assert(euclidean(Array(1.5f, -2f, 7f), Array(1.5f, -2f, 7f)) === 0.0)
  }

  test("dot product") {
    assert(dot(Array(1f, 2f, 3f), Array(4f, 5f, 6f)) === 32.0)
  }

  test("cosine of parallel vectors is 1, zero-norm guard yields 0") {
    assert(math.abs(cosine(Array(1f, 2f), Array(2f, 4f)) - 1.0) < 1e-12)
    assert(cosine(Array(0f, 0f), Array(1f, 1f)) === 0.0)
  }

  test("argmin ties break to the LOWEST index (reference KMapper.java:39)") {
    // point equidistant from centroids 0 and 1
    val cents = Array(Array(0f, 0f), Array(2f, 0f), Array(10f, 10f))
    assert(argminCentroid(Array(1f, 0f), cents) === 0)
    // nearest is index 2
    assert(argminCentroid(Array(9f, 9f), cents) === 2)
  }

  test("meanRounded5 rounds half-up at 5 dp (PointWritable.calcAverage)") {
    // 0.123456 * 2 / 2 = 0.123456 -> 0.12346
    val m = meanRounded5(Array(0.246912), 2L)
    assert(m(0) === 0.12346f)
    // exact halves round up: 0.000005 -> 0.00001 (Math.round half-up)
    val h = meanRounded5(Array(0.00001), 2L)
    assert(h(0) === 0.00001f || h(0) === 0.0f) // float repr of .000005 decides
    val neg = meanRounded5(Array(-2.0), 4L)
    assert(neg(0) === -0.5f)
  }

  test("addInto accumulates element-wise") {
    val acc = Array(1.0, 2.0)
    addInto(acc, Array(0.5f, 0.5f))
    assert(acc.toSeq === Seq(1.5, 2.5))
  }
}

class VectorFunctionsColumnSpec extends SparkSpec {

  test("Column forms agree with Scala forms on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(
      (Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      dotCol(col("a"), col("b")).as("dot"),
      euclideanCol(col("a"), col("b")).as("euc"),
      cosineCol(col("a"), col("b")).as("cos")).collect()
    rows.zip(got).foreach { case ((a, b), r) =>
      assert(math.abs(r.getDouble(0) - dot(a, b)) < 1e-9)
      assert(math.abs(r.getDouble(1) - euclidean(a, b)) < 1e-9)
      assert(math.abs(r.getDouble(2) - cosine(a, b)) < 1e-9)
    }
  }

  test("argminSqDistCol NaN/null edges match argminCentroid: all-NaN " +
    "row yields 0 (a valid index, never -1); null array yields null") {
    import spark.implicits._
    val cents = Array(Array(0f, 0f), Array(1f, 1f))
    val df = Seq(
      (1L, Array(Float.NaN, Float.NaN)), // all distances NaN → 0
      (2L, Array(0.9f, 0.9f)),           // sanity: nearest is 1
      (3L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    // both codegen and interpreted paths must agree
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val got = df.select(col("id"),
            argminSqDistCol(col("v"), cents).as("c"))
          .orderBy("id").collect()
        assert(got(0).getInt(1) === 0, codegen)
        assert(got(0).getInt(1) ===
          argminCentroid(Array(Float.NaN, Float.NaN), cents))
        assert(got(1).getInt(1) === 1, codegen)
        assert(got(2).isNullAt(1), codegen)
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
