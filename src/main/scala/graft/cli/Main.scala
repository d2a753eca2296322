package graft.cli

import org.apache.spark.sql.SparkSession

import graft.kmeans.{Dbi, KMeans, KMeansParams}
import graft.sources.{CentroidWriter, PointReader}

/** CLI with flag parity to the reference driver
  * (`Code/KmeanMapReduce/src/Main.java:256-275`):
  *
  * {{{
  * runMain graft.cli.Main -Din <file> [-Dlines n] -Dout <dir>
  *   [-Dresult f] [-Dk 3] [-Dthresh 0.001] [-Dmaxloop 50]
  *   [-DNumReduceTask 1] [--seed 42] [--init <csv file>]
  * }}}
  *
  * Reference semantics preserved: defaults k=3 thresh=0.001 maxloop=50
  * result=result.txt (Main.java:261-266); at most maxloop−1 iterations
  * (the check precedes the job, Main.java:303-305); final centroids
  * written one comma-joined line each to `<out>/<result>`
  * (writeFinalResult, Main.java:222-236); loop count, wall ms and DBI
  * printed like Main.java:362-364. `-Dlines` is accepted and ignored
  * (Spark counts rows itself); `-DNumReduceTask` maps to
  * `spark.sql.shuffle.partitions`. New, for the determinism the
  * reference lacks (unseeded Random, Main.java:135): `--seed`, and
  * `--init` to inject initial centroids from a CSV file.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val opts =
      try parse(args)
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); sys.exit(2)
      }
    val in = opts.getOrElse("in",
      { System.err.println(usage); sys.exit(2) })
    val out = opts.getOrElse("out",
      { System.err.println(usage); sys.exit(2) })
    val result = opts.getOrElse("result", "result.txt")
    val k = opts.getOrElse("k", "3").toInt
    val thresh = opts.getOrElse("thresh", "0.001").toDouble
    val maxloop = opts.getOrElse("maxloop", "50").toInt
    val reducers = opts.getOrElse("NumReduceTask", "1").toInt
    val seed = opts.getOrElse("seed", "42").toLong

    val preExisting = SparkSession.getDefaultSession
      .orElse(SparkSession.getActiveSession)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-kmeans")
      .config("spark.sql.shuffle.partitions",
        math.max(reducers, 1).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engine = opts.getOrElse("engine", "native")
    val t0 = System.currentTimeMillis()
    val points = PointReader.read(spark, in)
    val init = opts.get("init").map { f =>
      scala.io.Source.fromFile(f).getLines().filter(_.trim.nonEmpty)
        .map(_.split(",").map(_.trim.toFloat)).toArray
    }
    // `--engine mllib` runs the sanctioned MLlib engine through the
    // exact same CLI (SURVEY §7.1 PR 4) — the cross-check oracle path.
    val model = engine match {
      // maxloop ≤ 1 means the reference runs 0 iterations and returns
      // the init centroids (the convergence check precedes the job,
      // Main.java:303-305); MLlib clamps to ≥ 1 iteration, so route the
      // degenerate case through the native init-only path instead of
      // letting the engines diverge.
      case "mllib" if maxloop <= 1 =>
        KMeans.fit(points,
          KMeansParams(k = k, threshold = thresh, maxLoop = maxloop,
            seed = seed, initCentroids = init))
      case "mllib" =>
        val cents = graft.mllib.MLlibKMeansAdapter.fit(points, k = k,
          maxIter = maxloop - 1, tol = thresh, seed = seed,
          initCentroids = init)
        // iterations/converged are PLACEHOLDERS for this engine: the
        // mllib API does not expose its actual trajectory, so the model
        // records the request (maxloop−1) rather than what MLlib ran.
        graft.kmeans.KMeansModel(cents, maxloop - 1, converged = true)
      case "native" =>
        KMeans.fit(points,
          KMeansParams(k = k, threshold = thresh, maxLoop = maxloop,
            seed = seed, initCentroids = init))
      case other =>
        System.err.println(s"unknown engine '$other'\n$usage"); sys.exit(2)
    }

    CentroidWriter.write(model.centroids,
      java.nio.file.Paths.get(out, result).toString)

    val labeled = model.transform(points)
    // --labels <dir>: persist the labeled dataset (SURVEY §3.3 — the
    // reference computes labels but never writes them)
    opts.get("labels").foreach { dir =>
      graft.sources.LabeledWriter.write(labeled, dir,
        format = opts.getOrElse("labels-format", "parquet"))
    }
    val dbi = Dbi.compute(labeled, model.centroids)

    // same observables as the reference driver (Main.java:362-364)
    println(s"Number of loop: ${model.iterations}")
    println(s"Time: ${System.currentTimeMillis() - t0}")
    println(s"DBI: $dbi")
    // don't tear down a session we merely joined (embedded/test use)
    if (preExisting.isEmpty) spark.stop()
  }

  private[cli] def parse(args: Array[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("-D") || a.startsWith("--")) {
        if (i + 1 >= args.length)
          throw new IllegalArgumentException(
            s"flag $a expects a value\n$usage")
        m += a.drop(2) -> args(i + 1); i += 2
      } else i += 1
    }
    m.toMap
  }

  private val usage =
    "usage: -Din <file> -Dout <dir> [-Dlines n] [-Dresult f] [-Dk 3] " +
      "[-Dthresh 0.001] [-Dmaxloop 50] [-DNumReduceTask 1] " +
      "[--seed 42] [--init <csv>] [--engine native|mllib] " +
      "[--labels <dir>] [--labels-format parquet|csv]"
}
