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

  test("wrong arity fails with the arity message, not an analyzer crash") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0F))").head()
    }
    assert(e.getMessage.contains("exactly 2 arguments"))
  }
}
