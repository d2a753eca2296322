package graft.cli

import graft.SparkSpec

/** End-to-end CLI run (reference flag surface, SURVEY §3.1):
  * in-file → clustering → result file + stdout observables. */
class CliSpec extends SparkSpec {

  test("full run writes the reference-format result file and converges") {
    val dir = java.nio.file.Files.createTempDirectory("cli").toFile
    val in = new java.io.File(dir, "points.txt")
    java.nio.file.Files.writeString(in.toPath,
      "0.0,0.0\n0.0,2.0\n10.0,0.0\n10.0,2.0\n")
    val initF = new java.io.File(dir, "init.csv")
    java.nio.file.Files.writeString(initF.toPath, "0.0,0.0\n10.0,2.0\n")
    val out = new java.io.File(dir, "out")

    // spark session already exists (SparkSpec) — cli reuses it via getOrCreate
    Main.main(Array(
      "-Din", in.getAbsolutePath, "-Dout", out.getAbsolutePath,
      "-Dk", "2", "-Dthresh", "0.001", "-Dmaxloop", "20",
      "-Dresult", "result.txt", "--init", initF.getAbsolutePath))

    val result = java.nio.file.Files.readString(
      new java.io.File(out, "result.txt").toPath)
    // pair means, reference line format (c1,c2 per line)
    assert(result === "0.0,1.0\n10.0,1.0\n")
  }

  test("flag parser handles -D and -- forms") {
    val m = Main.parse(Array("-Din", "/x", "-Dk", "7", "--seed", "9"))
    assert(m === Map("in" -> "/x", "k" -> "7", "seed" -> "9"))
  }

  test("dangling flag raises a usage error instead of AIOOBE") {
    val e = intercept[IllegalArgumentException] {
      Main.parse(Array("-Din", "/x", "-Dk"))
    }
    assert(e.getMessage.contains("-Dk"))
    assert(e.getMessage.contains("usage:"))
  }

  test("--labels writes the labeled dataset (csv reference line format)") {
    val dir = java.nio.file.Files.createTempDirectory("cli-lbl").toFile
    val in = new java.io.File(dir, "points.txt")
    java.nio.file.Files.writeString(in.toPath,
      "0.0,0.0\n0.0,2.0\n10.0,0.0\n10.0,2.0\n")
    val initF = new java.io.File(dir, "init.csv")
    java.nio.file.Files.writeString(initF.toPath, "0.0,0.0\n10.0,2.0\n")
    val out = new java.io.File(dir, "out")
    val lbl = new java.io.File(dir, "labels")

    Main.main(Array(
      "-Din", in.getAbsolutePath, "-Dout", out.getAbsolutePath,
      "-Dk", "2", "-Dthresh", "0.001", "-Dmaxloop", "20",
      "--init", initF.getAbsolutePath,
      "--labels", lbl.getAbsolutePath, "--labels-format", "csv"))

    val lines = lbl.listFiles().filter(_.getName.startsWith("part-"))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath).toArray)
      .map(_.toString).toSet
    assert(lines === Set("0.0,0.0,0", "0.0,2.0,0", "10.0,0.0,1", "10.0,2.0,1"))
  }

  test("--engine mllib runs the MLlib adapter through the same CLI") {
    val dir = java.nio.file.Files.createTempDirectory("cli-ml").toFile
    val in = new java.io.File(dir, "points.txt")
    java.nio.file.Files.writeString(in.toPath,
      "0.0,0.0\n0.0,2.0\n10.0,0.0\n10.0,2.0\n")
    val initF = new java.io.File(dir, "init.csv")
    java.nio.file.Files.writeString(initF.toPath, "0.0,0.0\n10.0,2.0\n")
    val out = new java.io.File(dir, "out")

    Main.main(Array(
      "-Din", in.getAbsolutePath, "-Dout", out.getAbsolutePath,
      "-Dk", "2", "-Dthresh", "0.001", "-Dmaxloop", "20",
      "-Dresult", "result.txt", "--init", initF.getAbsolutePath,
      "--engine", "mllib"))

    val result = java.nio.file.Files.readString(
      new java.io.File(out, "result.txt").toPath)
    // MLlib (f64, unrounded) lands on the same pair means here
    assert(result.linesIterator.toSet === Set("0.0,1.0", "10.0,1.0"))
  }
}
