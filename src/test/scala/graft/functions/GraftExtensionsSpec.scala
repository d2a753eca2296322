package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("vector kernels are callable from pure SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |vec_sqdist(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS s""".stripMargin)
      .head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 8.0)
  }

  test("SQL and Column API plan the identical expression") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(0.5f, -1.0f)))
      .toDF("a", "b").cache()
    val viaSql = df.selectExpr("vec_dot(a, b) AS d")
    val viaCol = df.select(VectorFunctions.dotCol(
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b")).as("d"))
    // identical modulo the per-plan alias exprIds (#NN)
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.expressions.mkString
        .replaceAll("#\\d+", "#")
    assert(shape(viaSql) === shape(viaCol))
    assert(viaSql.head().getDouble(0) === viaCol.head().getDouble(0))
    df.unpersist()
  }

  test("text kernels are callable from pure SQL and match the operator kernels") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_simhash('hello world hello') AS fp,
        |graft_shingles('abcd', 3) AS sh,
        |graft_minhash_bands('abcdef', 3, 4, 2) AS mb,
        |graft_simhash(CAST(NULL AS STRING)) AS fp_null,
        |graft_shingles(CAST(NULL AS STRING), 3) AS sh_null""".stripMargin)
      .head()
    assert(row.getLong(0) ===
      graft.operators.Dedup.simhashFn("hello world hello"))
    assert(row.getSeq[Long](1) ===
      graft.operators.Dedup.shingleHashSet("abcd", 3).toSeq)
    assert(row.getSeq[Long](2) ===
      graft.operators.Dedup.minhashBandHashes("abcdef", 3, 4, 2).toSeq)
    // null semantics mirror the ScalaUDF form: kernel sees null,
    // result is total (never null)
    assert(row.getLong(3) === graft.operators.Dedup.simhashFn(null))
    assert(row.getSeq[Long](4).isEmpty)
  }

  test("SQL and Column API plan the identical text-kernel expression; no ScalaUDF") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq("the quick brown fox", "jumps over the lazy dog")
      .toDF("text").cache()
    val viaSql = df.selectExpr("graft_simhash(text) AS fp",
      "graft_shingles(text, 5) AS sh", "graft_minhash_bands(text, 5, 4, 2) AS mb")
    val viaCol = df.select(
      TextKernelFunctions.simhashCol(
        org.apache.spark.sql.functions.col("text")).as("fp"),
      TextKernelFunctions.shinglesCol(
        org.apache.spark.sql.functions.col("text"), 5).as("sh"),
      TextKernelFunctions.minhashBandsCol(
        org.apache.spark.sql.functions.col("text"), 5, 4, 2).as("mb"))
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.expressions.mkString
        .replaceAll("#\\d+", "#")
    assert(shape(viaSql) === shape(viaCol))
    assert(!viaCol.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(viaSql.collect().toSeq === viaCol.collect().toSeq)
    // and the dedup operators themselves now plan these expressions,
    // not UDFs: the banded index path must be UDF-free
    val banded = graft.operators.Dedup.minhashCandidates(
      df.withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id()),
      n = 5, bands = 4, rowsPerBand = 2)
    assert(!banded.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    df.unpersist()
  }

  test("graft_nfc from SQL: composes to NFC, null-preserving") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      // U+0301 combining acute (Scala lexer-level \\u escape — Spark's
      // own chr() wraps mod 256): 'e' + accent must compose
      """SELECT graft_nfc('e\u0301x') AS composed,
        |graft_nfc('plain') AS plain,
        |graft_nfc(CAST(NULL AS STRING)) AS n""".stripMargin)
      .head()
    assert(row.getString(0) === "\u00e9x") // e-acute as ONE codepoint
    assert(row.getString(0).length === 2)   // 3 if NFC had not composed
    assert(row.getString(1) === "plain")
    assert(row.isNullAt(2)) // null-preserving, unlike the total kernels
  }

  test("wrong arity fails with the arity message, not an analyzer crash") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0F))").head()
    }
    assert(e.getMessage.contains("exactly 2 arguments"))
  }
}
