package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  /** Independent in-memory replica of the same fixpoint: 12-dp-rounded
    * contributions summed exactly (BigDecimal), 9-dp-rounded damped
    * update; with `dangling` the sink mass (12-dp DECIMAL sum over one
    * double division by N) joins the damped term. */
  private def brute(
      edges: Seq[(Long, Long)], iters: Int, d: Double,
      dangling: Boolean = false): Map[Long, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val nodes =
      (if (dangling) e.flatMap(p => Seq(p._1, p._2)) else e.map(_._1))
        .distinct.sorted
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dmn =
        if (!dangling) 0.0
        else nodes.filterNot(out.contains)
          .map(v => BigDecimal(r(v))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / n
      val sums = e
        .map { case (s, t) =>
          t -> BigDecimal(r(s) / out(s).toDouble)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map { v =>
        val s = sums.getOrElse(v, BigDecimal(0)).toDouble
        val inner = if (dangling) s + dmn else s
        v -> BigDecimal((1.0 - d) / n + d * inner)
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

  // directed triangle with a sink: node 3 has in-edges, no out-edge
  private val directed = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L)

  test("pageRank fails loudly on a sink node without the correction") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(directed.toDF("src", "dst"), "src", "dst", iters = 3)
    }
    assert(ex.getMessage.contains("rank mass"), ex.getMessage)
  }

  test("danglingCorrection matches the replica and conserves mass") {
    import spark.implicits._
    val got = Graph.pageRank(directed.toDF("src", "dst").repartition(3),
        "src", "dst", iters = 6, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === brute(directed, 6, 0.85, dangling = true))
    // the sink's mass is recycled, not leaked
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    // and the sink itself holds rank (it receives from 1 and 2)
    assert(got(3L) > got(2L))
  }

  test("danglingCorrection on a sink-free graph equals the cheap path") {
    import spark.implicits._
    val plain = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val corrected = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        4, danglingCorrection = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(plain === corrected)
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
