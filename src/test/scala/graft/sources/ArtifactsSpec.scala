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
}
