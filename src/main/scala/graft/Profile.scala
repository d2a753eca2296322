package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    args.headOption match {
      case Some("entry") => entrySmoke()
      case Some("queries") => profileQueries(args.drop(1))
      case _ => microbench(args.headOption.getOrElse("/root/testdata/sf0.01"))
    }
  }

  private def session(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Time selected SparkEntry queries N times each at a given sf dir.
    * usage: runMain graft.Profile queries <sfDir> <reps> q01_agg_sum ... */
  def profileQueries(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $n: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }

  def microbench(dir: String): Unit = {
    val spark = session(8)
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    time("docs count")(docs.count())
    time("docs count again")(docs.count())
    time("regexp_replace")(
      docs.select(length(regexp_replace(col("text"), "[^0-9]", "")).as("h"))
        .agg(sum("h")).head())
    time("shingles")(
      docs.select(graft.operators.Dedup.shingles(col("text"), 8).as("sh"))
        .agg(sum(size(col("sh")))).head())
    spark.stop()
  }

  /** Smoke-run of SparkEntry.entry, the driver's t1 check (rows > 0). */
  def entrySmoke(): Unit = {
    val spark = session(8)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry] rows=${rows.length}")
    rows.take(3).foreach(r => println(s"[entry] $r"))
    spark.stop()
  }
}
