package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("randomProjection equals a scalar left-to-right fold replica") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val signs = Similarity.rademacherSigns(2027L, 8, 64)
    val exp = emb.orderBy("vec_id")
      .select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        val x = r.getSeq[Float](1)
        r.getLong(0) -> signs.map { s =>
          var acc = 0.0d
          var j = 0
          while (j < x.length) { acc += x(j).toDouble * s(j).toDouble; j += 1 }
          acc
        }.toSeq
      }.toSeq
    val got = Similarity.randomProjection(emb, "vec_id", "embedding",
        outDim = 8, dim = 64, seed = 2027L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
    assert(got === exp)
  }

  test("signs are ±1 only and deterministic in (seed, p, j)") {
    val a = Similarity.rademacherSigns(7L, 4, 16)
    val b = Similarity.rademacherSigns(7L, 4, 16)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1.0f || v == -1.0f))
    val c = Similarity.rademacherSigns(8L, 4, 16)
    assert(a.map(_.toSeq).toSeq !== c.map(_.toSeq).toSeq)
  }

  test("projection roughly preserves squared norms (JL sanity)") {
    // E[||Px||²] = outDim/dim… for ±1 entries E[(Σ s_j x_j)²] = ||x||²,
    // so Σ_p proj_p² ≈ outDim·||x||²; check the corpus-mean ratio is
    // within a loose band (probabilistic bound, fixed seed → fixed run)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val proj = Similarity.randomProjection(emb, "vec_id", "embedding",
      outDim = 16, dim = 64, seed = 11L)
    val stats = proj.join(emb, "vec_id")
      .select(
        aggregate(col("proj"), lit(0.0d), (a, v) => a + v * v).as("pn"),
        aggregate(col("embedding"), lit(0.0d),
          (a, v) => a + v.cast("double") * v.cast("double")).as("xn"))
      .agg(avg(col("pn") / col("xn")).as("ratio"))
      .head().getDouble(0)
    assert(stats > 16.0 * 0.7 && stats < 16.0 * 1.3, s"ratio $stats")
  }

  test("randomProjection is a pure map: no exchange, no UDF") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val plan = Similarity.randomProjection(emb, "vec_id", "embedding",
        outDim = 8, dim = 64, seed = 2027L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // the trailing orderBy is the only exchange-bearing step; the
    // projection itself must not shuffle
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
