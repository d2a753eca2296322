package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression↔Column converters — the
  * standard extension-library pattern for plugging custom Catalyst
  * expressions (graft.functions.VecDot / VecSqDist) into the public
  * Column algebra on Spark 4's classic session.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a `SparkSessionExtensions`' function injections to an
    * already-running session's `private[sql]` registry — the hook
    * [[graft.functions.GraftExtensions]] uses for live sessions
    * (builder-time `withExtensions` / `spark.sql.extensions` only
    * reach sessions created after configuration). */
  def applyFunctionInjections(
      spark: SparkSession, ext: SparkSessionExtensions): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)

  /** Unload every cached state-store provider (and close its files).
    *
    * Stopped streaming queries leave their providers — holding full
    * in-memory copies of the state maps — in the executor's global
    * registry until the background maintenance task gets around to
    * them (default sweep: 60 s). In a JVM that runs many short
    * verification streams back-to-back, those carcasses pile up and
    * the periodic maintenance snapshot pass burns cores mid-benchmark.
    * Only safe when no streaming query is running (a live query would
    * transparently reload from its checkpoint, at a latency cost). */
  def unloadAllStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()

  /** Force-compile every whole-stage-codegen subtree of `df`'s
    * executed plan, returning the compile-error messages (empty =
    * everything stays compiled). Production Spark falls back to
    * interpreted evaluation SILENTLY when janino rejects a stage
    * (e.g. a >64 KB method) — specs use this to pin that a hot
    * stage's generated code actually compiles. */
  def codegenCompileErrors(df: Dataset[_]): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    plan.collect { case w: execution.WholeStageCodegenExec =>
      val (_, code) = w.doCodeGen()
      try {
        catalyst.expressions.codegen.CodeGenerator.compile(code)
        None
      } catch { case e: Exception =>
        Some(Option(e.getMessage).getOrElse(e.toString).take(300))
      }
    }.flatten
  }
}
