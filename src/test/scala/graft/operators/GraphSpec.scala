package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  /** Independent in-memory replica of the same fixpoint: 12-dp-rounded
    * contributions summed exactly (BigDecimal), 9-dp-rounded damped
    * update. */
  private def brute(
      edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes = e.map(_._1).distinct.sorted
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val sums = e
        .map { case (s, t) =>
          t -> BigDecimal(r(s) / out(s).toDouble)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map { v =>
        v -> BigDecimal(
            (1.0 - d) / n + d * sums.getOrElse(v, BigDecimal(0)).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r
  }

  // undirected square with one diagonal, fed as both directions
  private val undirected = Seq(
    1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L)
  private val edges = undirected ++ undirected.map(_.swap)

  test("pageRank matches an independent in-memory fixpoint") {
    import spark.implicits._
    val got = Graph.pageRank(
        edges.toDF("src", "dst").repartition(3), "src", "dst", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === brute(edges, 8, 0.85))
  }

  test("pageRank ranks the higher-degree nodes of the diagonal first") {
    import spark.implicits._
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 8)
      .collect().map(_.getLong(0)).toSeq
    // 1 and 3 have degree 3; 2 and 4 degree 2
    assert(got.take(2).toSet === Set(1L, 3L))
  }

  test("pageRank mass stays ~1 and is partitioning-invariant") {
    import spark.implicits._
    val a = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val b = Graph.pageRank(
        edges.toDF("src", "dst").repartition(7), "src", "dst", 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(a === b)
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-6)
  }
}
