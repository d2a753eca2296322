package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet star-schema loader for the driver testdata layout
  * (`/root/testdata/sf{N}/{table}.parquet`, see TESTDATA.md).
  *
  * Some testdata timestamp columns are parquet TIMESTAMP(NANOS), which
  * Spark has no native type for — sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (Verify/Bench/tests do),
  * and this loader converts those long nanos back to proper timestamps
  * (micro truncation, matching how DuckDB reads the same files). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** columns that are timestamps in the logical schema */
  private val tsCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"),
    "events" -> Seq("ts"))

  /** Normalize timestamp columns to TimestampType (LTZ, session tz UTC):
    *   - parquet TIMESTAMP(NANOS) surfaces as LongType under the
    *     nanosAsLong conf → micros truncation, matching DuckDB;
    *   - parquet timestamp[ms] (no tz) surfaces as TIMESTAMP_NTZ → cast
    *     to LTZ (same wall clock under UTC session tz).
    * Usable on batch and streaming frames. */
  def normalizeTs(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (!d.schema.fieldNames.contains(c)) d
      else d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, col(c).cast("timestamp"))
        case _ => d
      }
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(
      spark.read.parquet(s"$dir/$name.parquet"),
      tsCols.getOrElse(name, Nil))
}

/** S1+S2 (SURVEY §2.1): distributed text scan + CSV parse into a typed
  * point dataset. The reference splits/parses in three duplicated places
  * with no validation (Main.java:52-57, :157; KMapper.java:31); this is
  * the single shared code path with schema validation the reference lacks
  * (a ragged or non-numeric row crashes a Hadoop task mid-job;
  * here `validate` surfaces a clean error up front).
  */
object PointReader {

  /** @return DataFrame with one `features: array<float>` column. */
  def read(
      spark: SparkSession,
      path: String,
      validate: Boolean = true): DataFrame = {
    val parsed = spark.read
      .text(path)
      .where(length(trim(col("value"))) > 0)
      .select(
        transform(split(trim(col("value")), ","), t => trim(t).cast("float"))
          .as("features"))
    if (validate) {
      // one distributed pass: arity uniform + every token parsed
      val bad = parsed
        .select(size(col("features")).as("dim"),
          exists(col("features"), _.isNull).as("hasNull"))
        .agg(
          countDistinct(col("dim")).as("arities"),
          max(col("hasNull").cast("int")).as("anyNull"))
        .head()
      require(bad.getLong(0) <= 1, "ragged input: rows have differing arity")
      require(bad.getInt(1) == 0, "non-numeric field in input")
    }
    parsed
  }
}

/** SURVEY §3.3: labeled-output sink — the artifact the reference
  * computes but never persists (labels live only in driver memory,
  * Main.java:345-355, and are dropped after the DBI print). At scale
  * this is THE product of a clustering run, so it gets a real
  * distributed sink:
  *
  *   - `parquet` (default): written partitioned by `cluster`, so every
  *     per-segment consumer prunes to its own cluster's files;
  *   - `csv`: the reference's line format with the label appended
  *     (`c1,c2,...,cluster`), distributed text write.
  */
object LabeledWriter {
  def write(
      labeled: DataFrame,
      path: String,
      format: String = "parquet",
      featuresCol: String = "features",
      clusterCol: String = "cluster"): Unit = format match {
    case "parquet" =>
      labeled.write.partitionBy(clusterCol).mode("overwrite").parquet(path)
    case "csv" =>
      labeled
        .select(concat_ws(",",
          concat(transform(col(featuresCol), _.cast("string")),
            array(col(clusterCol).cast("string")))).as("value"))
        .write.mode("overwrite").text(path)
    case other =>
      throw new IllegalArgumentException(s"unknown labeled format '$other'")
  }
}

/** Small-files repair: rewrite a parquet directory into files of
  * roughly `targetBytes` each. A streaming ingest or over-parallel
  * write leaves a 100 TB table as millions of KB-sized files whose
  * per-file open/footer/driver-listing cost dominates every later
  * scan; periodic compaction restores scan efficiency. The file count
  * is ceil(compressed bytes / targetBytes); a round-robin
  * `repartition(n)` (not `coalesce`) keeps output files evenly sized
  * regardless of input partition skew, at the price of one shuffle —
  * which is the point of a compaction job.
  */
object Compaction {
  /** Compact `inPath` (parquet) into `outPath`; returns the file
    * count written. */
  def compactParquet(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(inPath), spark.sparkContext.hadoopConfiguration)
    // recursive: partitioned layouts keep their data in subdirectories
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(inPath), true)
    var totalBytes = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        totalBytes += st.getLen
    }
    require(totalBytes > 0,
      s"no parquet data files under $inPath — refusing to compact " +
        "(a wrong path would silently rewrite nothing)")
    val nFiles = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }
}

/** S7 (SURVEY §2.1): final-centroid sink in the reference's exact line
  * format — one `c1,c2,...` comma-joined float line per centroid
  * (`writeFinalResult`, Main.java:222-236; float rendering per
  * `PointWritable.toString`, PointWritable.java:76-86 — Scala Float
  * toString matches Java's). k rows → plain driver-side write. */
object CentroidWriter {
  def format(centroids: Array[Array[Float]]): String =
    centroids.map(_.mkString(",")).mkString("\n") + "\n"

  def write(centroids: Array[Array[Float]], path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, format(centroids))
  }
}
