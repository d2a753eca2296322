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

/** Earliest-wins argmin of squared distance against a LITERAL float
  * codebook: `argmin_c Σᵢ (vᵢ − codebook(c)(i))²`, strict `<` running
  * min (ties → lowest index — KMapper.java:39 semantics, identical to
  * the [[graft.functions.VectorFunctions.assignCol]] CASE chain and
  * the `argminCentroid` Scala kernel: same per-centroid left-to-right
  * double fold, null elements contribute 0, dim mismatch throws).
  *
  * Why an expression and not a chain of [[VecSqDist]] comparisons:
  * the chain inlines each distance's generated code O(k²) times into
  * ONE whole-stage method (expressions over codegen locals cannot be
  * split into sub-methods), which overran janino's 64 KB limit when
  * the PQ encoder put m+1 chains in one projection — the build
  * silently fell back to interpreted eval. Here the codebook rides
  * along as a single `references[]` object and the generated code is
  * a fixed ~20-line double loop regardless of k·dim. */
case class VecArgminSqDist(
    child: Expression,
    codebook: Seq[Seq[Float]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(codebook.nonEmpty, "vec_argmin_sqdist: empty codebook")

  override def prettyName: String = "vec_argmin_sqdist"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  private def elemGet: String =
    if (child.dataType.asInstanceOf[ArrayType].elementType == FloatType)
      "getFloat" else "getDouble"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.sql}")
  }

  @transient private lazy val cb: Array[Array[Float]] =
    codebook.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val vv = v.asInstanceOf[ArrayData]
    val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = vv.numElements()
    if (n != cb(0).length)
      throw new IllegalArgumentException(
        s"$prettyName: dim mismatch $n vs ${cb(0).length}")
    def distTo(cent: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!vv.isNullAt(i)) {
          val av = if (isFloat) vv.getFloat(i).toDouble else vv.getDouble(i)
          val bv = cent(i).toDouble
          s += (av - bv) * (av - bv)
        }
        i += 1
      }
      s
    }
    // Seeded from centroid 0 like [[VectorFunctions.argminCentroid]]
    // (not best=-1/+∞): an all-NaN distance row then yields 0, a valid
    // index, instead of -1 leaking into PQ codes or cluster labels.
    // (A NULL input array still yields NULL via nullSafeEval.)
    var best = 0
    var bestD = distTo(cb(0))
    var c = 1
    while (c < cb.length) {
      val s = distTo(cb(c))
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("graftCodebook", cb, "float[][]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      // Seeded from centroid 0 (argminCentroid parity): all-NaN rows
      // yield index 0, never -1 — see nullSafeEval.
      s"""
         |int $n = $v.numElements();
         |if ($n != $cbRef[0].length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dim mismatch " + $n + " vs " + $cbRef[0].length);
         |}
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $cbRef.length; $c++) {
         |  float[] $cent = $cbRef[$c];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) {
         |      double $av = (double) $v.$elemGet($i);
         |      double $bv = (double) $cent[$i];
         |      $s += ($av - $bv) * ($av - $bv);
         |    }
         |  }
         |  if ($c == 0 || $s < $bestD) { $bestD = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): VecArgminSqDist = copy(child = newChild)
}
