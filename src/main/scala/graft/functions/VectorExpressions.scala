package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector kernels over `array<float|double>` columns.
  *
  * The `zip_with`/`aggregate` higher-order-function formulation of dot
  * product and squared distance is evaluated interpreted, one lambda
  * call per element, and allocates an intermediate array per row —
  * measured ~100× slower than compiled code on 64-dim embeddings.
  * These expressions generate the tight Java loop whole-stage codegen
  * splices inline (preference (b) of the extension hierarchy: a custom
  * `Expression` with `doGenCode` beats a UDF, which beats interpreted
  * HOFs).
  *
  * Semantics (shared by eval and codegen, bit-identical to the HOF
  * form on non-null data: same index order, double accumulation):
  *   - null array on either side → null result;
  *   - length mismatch → IllegalArgumentException (the reference would
  *     silently mis-distance, SURVEY §1.3 — we fail loudly);
  *   - null elements contribute 0 to the accumulation.
  */
abstract class VecBinaryFold extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** java source for one accumulation step given element expressions */
  protected def stepJava(av: String, bv: String): String

  /** scala accumulation step */
  protected def stepScala(a: Double, b: Double): Double

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dim mismatch ${n} vs ${bb.numElements()}")
    val at = elemType(left); val bt = elemType(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!aa.isNullAt(i) && !bb.isNullAt(i)) {
        val av = if (at == FloatType) aa.getFloat(i).toDouble else aa.getDouble(i)
        val bv = if (bt == FloatType) bb.getFloat(i).toDouble else bb.getDouble(i)
        s += stepScala(av, bv)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
      val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dim mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $av = (double) $a.$aGet($i);
         |    double $bv = (double) $b.$bGet($i);
         |    $s += ${stepJava(av, bv)};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σᵢ aᵢ·bᵢ in double — the ANN/similarity kernel. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryFold {
  override def prettyName: String = "vec_dot"
  override protected def stepJava(av: String, bv: String): String = s"$av * $bv"
  override protected def stepScala(a: Double, b: Double): Double = a * b
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ (aᵢ−bᵢ)² in double — the clustering distance kernel
  * (`PointWritable.calcDistance` without the sqrt,
  * Code/KmeanMapReduce/src/PointWritable.java:95-104). */
case class VecSqDist(left: Expression, right: Expression) extends VecBinaryFold {
  override def prettyName: String = "vec_sqdist"
  override protected def stepJava(av: String, bv: String): String =
    s"($av - $bv) * ($av - $bv)"
  override protected def stepScala(a: Double, b: Double): Double = (a - b) * (a - b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDist =
    copy(left = newLeft, right = newRight)
}
