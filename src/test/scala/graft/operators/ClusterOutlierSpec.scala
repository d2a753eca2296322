package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions.{argminCentroid, sqdist}

class ClusterOutlierSpec extends SparkSpec {

  private val cents = Array(Array(0f, 0f), Array(10f, 10f))
  private val vecs: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(0f, 1f),
    1L -> Array(2f, 0f),
    2L -> Array(0.5f, 0.5f),
    3L -> Array(3f, 3f), // farthest of cluster 0
    4L -> Array(10f, 9f),
    5L -> Array(7f, 8f), // farthest of cluster 1
    6L -> Array(10.5f, 10f))

  private def df = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding").repartition(3)
  }

  test("clusterOutliers equals the brute-force farthest members") {
    val got = Similarity.clusterOutliers(df, cents, topPerCluster = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val exp = vecs
      .map { case (id, v) =>
        val c = argminCentroid(v, cents)
        val d = BigDecimal(math.sqrt(cents.indices.map(i =>
            sqdist(v, cents(i))).min))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        (c, id, d)
      }
      .groupBy(_._1).toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy { case (_, id, d) => (-d, id) }.take(2)
      }
      .sortBy { case (c, id, d) => (c, -d, id) }
    assert(got === exp)
  }

  test("clusterOutliers aggregates with the bounded TopK, not a window") {
    val plan = Similarity.clusterOutliers(df, cents, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
