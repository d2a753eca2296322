package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("entry")) { entrySmoke(); return }
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($r)")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    time("docs count")(docs.count())
    time("docs count again")(docs.count())
    time("xxhash agg")(
      docs.select((xxhash64(col("text")) % 1000).as("h")).agg(sum("h")).head())
    time("length agg")(
      docs.select(length(col("text")).as("h")).agg(sum("h")).head())
    time("split size")(
      docs.select(size(split(trim(col("text")), "\\s+")).as("h")).agg(sum("h")).head())
    time("regexp_replace")(
      docs.select(length(regexp_replace(col("text"), "[^0-9]", "")).as("h"))
        .agg(sum("h")).head())
    time("regexp_extract_all")(
      docs.select(size(regexp_extract_all(lower(col("text")), lit("\\bthe\\b"), lit(0))).as("h"))
        .agg(sum("h")).head())
    time("regexp_extract_all x2")(
      docs.select(size(regexp_extract_all(lower(col("text")), lit("\\bthe\\b"), lit(0))).as("h"))
        .agg(sum("h")).head())
    time("groupBy lang + regexp")(
      graft.operators.TextAnalysis.wordOccurrences(col("text"), "the") match {
        case c => docs.groupBy("lang").agg(sum(c)).collect().length
      })
    time("shingles 500 docs")(
      docs.select(graft.operators.Dedup.shingles(col("text"), 8).as("sh"))
        .agg(sum(size(col("sh")))).head())
    spark.stop()
  }

  /** Smoke-run of SparkEntry.entry, the driver's t1 check (rows > 0). */
  def entrySmoke(): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry] rows=${rows.length}")
    rows.take(3).foreach(r => println(s"[entry] $r"))
    spark.stop()
  }
}
