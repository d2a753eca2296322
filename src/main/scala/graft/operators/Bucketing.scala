package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-table co-location: pay the join shuffle ONCE at write time
  * so every later join or aggregation on the bucket key is
  * shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling a fact table
  * for each of a pipeline's joins and never shuffling it at all: both
  * sides are written `bucketBy(n, key)`, and a sort-merge join of two
  * tables bucketed by the join key into the same bucket count reads
  * bucket i against bucket i directly — no Exchange on either side,
  * and a downstream groupBy on the key reuses the same distribution
  * (both asserted on the physical plan in BucketingSpec). Spark's
  * bucket hash is the same Murmur3 hash `repartition` uses, so the
  * pre-write repartition below aligns writer tasks with buckets:
  * exactly one file per bucket, which also lets the reader use the
  * per-bucket sort order instead of re-sorting.
  */
object Bucketing {

  /** Write `df` as a parquet table named `table` at the explicit
    * `path`, bucketed into `buckets` buckets by `key` and sorted by it
    * within each bucket; returns the re-read table. Overwrites any
    * previous contents, so re-runs are idempotent. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
    spark.table(table)
  }
}
