package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's codegen'd vector kernels.
  *
  * The Column API reaches [[VecDot]]/[[VecSqDist]] through
  * [[VectorFunctions]]; pure-SQL users (`spark.sql`, JDBC, SQL files)
  * need the functions in the session's FunctionRegistry. This is the
  * standard `SparkSessionExtensions` plug-in — on a cluster:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * or at build time `SparkSession.builder.withExtensions(new
  * GraftExtensions)`. For a session that already exists (tests,
  * notebooks), [[GraftExtensions.register]] applies the same
  * injections to the live registry. Either way the SQL functions are
  * the SAME whole-stage-codegen'd expressions the Column API uses —
  * not UDF wrappers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def binary(
      name: String,
      clazz: Class[_],
      make: (Expression, Expression) => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == 2,
        s"$name expects exactly 2 arguments, got ${args.length}")
      make(args(0), args(1))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      builder)
  }

  /** (identifier, info, builder) triples in `injectFunction` shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary("vec_dot", classOf[VecDot], VecDot.apply),
    binary("vec_sqdist", classOf[VecSqDist], VecSqDist.apply))

  /** Register on a live session (the builder-time extension path only
    * reaches sessions created after it is configured). Idempotent —
    * re-registration replaces the same entries. */
  def register(spark: SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftshim.applyFunctionInjections(spark, ext)
  }
}
