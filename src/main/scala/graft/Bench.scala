package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds on
  * SPARK_GRAFT_SF_DIR (driver default sf0.1).
  *
  * Measurement protocol (BASELINE.md): a full untimed warmup pass at
  * sf0.001 first — paying per-JVM one-time costs (whole-stage codegen
  * compilation per query shape, Spark 4's ~40s collation/ICU static
  * init, parquet footer caching) outside the timed region, exactly as a
  * long-running cluster would have them amortized — then each query
  * timed once at the target SF, forced end-to-end via the noop sink
  * (`count()` would let Catalyst prune projections and undercount work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata has parquet TIMESTAMP(NANOS) columns (see sources.Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup at the smallest SF: codegen + ICU + reader init, untimed
    names.foreach(force(_, "/root/testdata/sf0.001"))
    val results = names.map(n => n -> force(n, sfDir))
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
