package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Compaction contract: a directory of many small parquet files is
  * rewritten into ceil(bytes/target) evenly-sized files with content
  * unchanged. */
class CompactionSpec extends SparkSpec {

  test("compaction merges small files to the computed count, content intact") {
    val src = Tables(spark, "/root/testdata/sf0.001", "documents")
    val base = Files.createTempDirectory("graft_compact_").toString
    // simulate an over-parallel ingest: 64 files for a tiny table
    src.repartition(64).write.parquet(s"$base/small")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String) = fs
      .listStatus(new org.apache.hadoop.fs.Path(p))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val smallFiles = parquetFiles(s"$base/small")
    assert(smallFiles.length == 64)

    val totalBytes = smallFiles.map(_.getLen).sum
    val target = totalBytes / 4 // → 4 or 5 output files
    val expected = ((totalBytes + target - 1) / target).toInt
    val n = Compaction.compactParquet(
      spark, s"$base/small", s"$base/compacted", target)
    assert(n == expected, s"returned $n, expected $expected")
    assert(parquetFiles(s"$base/compacted").length == n)

    // content identity: same rows, nothing dropped or duplicated
    val before = src.collect().map(_.toString).sorted
    val after = spark.read.parquet(s"$base/compacted")
      .collect().map(_.toString).sorted
    assert(after.sameElements(before))
  }

  test("targetBytes larger than the table compacts to a single file") {
    val src = Tables(spark, "/root/testdata/sf0.001", "nation")
    val base = Files.createTempDirectory("graft_compact1_").toString
    src.repartition(8).write.parquet(s"$base/small")
    val n = Compaction.compactParquet(
      spark, s"$base/small", s"$base/one", Long.MaxValue)
    assert(n == 1)
  }
}
