package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class ArtifactsSpec extends SparkSpec {

  private def touch(dir: String, name: String): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.write(java.nio.file.Paths.get(dir, name), "x".getBytes)
  }

  test("publishVersion repoints latest, keeps a window, prunes beyond it") {
    val base = Files.createTempDirectory("graft_art_").toString
    assert(Artifacts.latestVersion(spark, base).isEmpty)
    assert(intercept[IllegalArgumentException](
      Artifacts.latestDir(spark, base))
      .getMessage.contains("no published artifact"))

    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    assert(Artifacts.latestDir(spark, base) === s"$base/v1")
    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    assert(Artifacts.latestDir(spark, base) === s"$base/v2")
    // keepVersions=2: the PREVIOUS version stays live for readers that
    // resolved it before the pointer moved
    assert(Files.exists(java.nio.file.Paths.get(s"$base/v1")))
    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    assert(Artifacts.latestDir(spark, base) === s"$base/v3")
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/v1")))
    assert(Files.exists(java.nio.file.Paths.get(s"$base/v2")))
  }

  test("readers never resolve an incomplete version; pointer loss falls back") {
    val base = Files.createTempDirectory("graft_art2_").toString
    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    // a crashed publish leaves a bare version dir with no _PUBLISHED
    // sentinel — it must be invisible to readers
    touch(s"$base/v9", "partial")
    assert(Artifacts.latestDir(spark, base) === s"$base/v1")
    // crash between pointer delete and rename: no pointer at all —
    // the sentinel scan still resolves the newest COMPLETE version
    Files.delete(java.nio.file.Paths.get(base, "_latest"))
    assert(Artifacts.latestDir(spark, base) === s"$base/v1")
    // and the next publish recovers past the orphan
    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    assert(Artifacts.latestDir(spark, base) === s"$base/v2")
  }

  test("next publish overwrites the orphan of a crashed publish") {
    val base = Files.createTempDirectory("graft_art3_").toString
    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    // simulate a publish that crashed mid-write: a bare v2 with junk
    // and no _PUBLISHED sentinel
    touch(s"$base/v2", "halfwritten")
    assert(Artifacts.latestDir(spark, base) === s"$base/v1")
    // the next publish claims v2, deleting the junk first
    Artifacts.publishVersion(spark, base)(v => touch(v, "fresh"))
    assert(Artifacts.latestDir(spark, base) === s"$base/v2")
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/v2", "halfwritten")))
    assert(Files.exists(java.nio.file.Paths.get(s"$base/v2", "fresh")))
  }

  test("describe lists versions with published/is_latest flags") {
    val base = Files.createTempDirectory("graft_art4_").toString
    assert(Artifacts.describe(spark, base).count() === 0)
    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    Artifacts.publishVersion(spark, base)(v => touch(v, "data"))
    touch(s"$base/v7", "partial") // crashed-publish orphan
    val rows = Artifacts.describe(spark, base)
      .orderBy("version")
      .collect()
      .map(r => (r.getAs[Int]("version"), r.getAs[Boolean]("published"),
        r.getAs[Boolean]("is_latest")))
    assert(rows.toSeq === Seq((1, true, false), (2, true, true),
      (7, false, false)))
    // files/bytes are positive for real versions
    val v2 = Artifacts.describe(spark, base)
      .where("version = 2").head()
    assert(v2.getAs[Long]("files") > 0 && v2.getAs[Long]("bytes") > 0)
    // a stray overflow-length digit dir is ignored, not fatal
    touch(s"$base/v99999999999", "junk")
    assert(Artifacts.describe(spark, base).count() === 3)
    assert(Artifacts.latestDir(spark, base) === s"$base/v2")
  }

  test("publishedVersions returns complete versions ascending") {
    val base = Files.createTempDirectory("graft_art5_").toString
    assert(Artifacts.publishedVersions(spark, base) === Seq.empty)
    Artifacts.publishVersion(spark, base, keepVersions = 3)(v => touch(v, "d"))
    Artifacts.publishVersion(spark, base, keepVersions = 3)(v => touch(v, "d"))
    touch(s"$base/v9", "partial")
    assert(Artifacts.publishedVersions(spark, base) === Seq(1, 2))
  }
}
