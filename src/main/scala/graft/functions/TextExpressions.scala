package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Dedup

/** Native Catalyst forms of the per-row text kernels — dedup
  * ([[graft.operators.Dedup.simhashFn]] / `shingleHashSet` /
  * `minhashBandHashes`), curation
  * ([[graft.operators.Curation.repetitionKernel]] /
  * `wordGramHashSet`), and fuzzy-join blocking
  * ([[graft.operators.Joins]] deletion neighborhoods) — the SAME
  * compiled single-pass kernels the operators run, exposed as
  * whole-stage-codegen'd expressions instead of `ScalaUDF`s, so
  * (a) the hot scans stay inside one codegen span (no UDF
  * serialization boundary, no Row↔Scala conversion per document),
  * and (b) pure-SQL users reach them through [[GraftExtensions]]
  * (`graft_simhash` / `graft_shingles` / `graft_minhash_bands` /
  * `graft_repetition` / `graft_word_grams` /
  * `graft_deletion_hashes`).
  *
  * Null semantics mirror the ScalaUDF form bit-for-bit (the operators
  * swapped to these must not change a single oracle hash): a null text
  * reaches the kernel as `null` — SimHash of null is the all-zero
  * fingerprint, shingles/bands of null are the empty array — so the
  * result is never null and `nullable` is false. A null gram size
  * behaves as the UDF's primitive default (0), for the same reason.
  */
private[functions] trait KernelCall { self: Expression =>

  override def nullable: Boolean = false

  /** `String` (possibly null) out of a UTF8String child slot. */
  protected final def str(v: Any): String =
    if (v == null) null else v.asInstanceOf[UTF8String].toString

  /** Java source for "child value or null as a String". */
  protected final def strJava(child: ExprCode): String =
    s"(${child.isNull} ? null : ${child.value}.toString())"

  protected final def intOrZero(v: Any): Int =
    if (v == null) 0 else v.asInstanceOf[Int]

  /** Java source for "child int value or 0 when null" — keeps the
    * codegen path bit-identical to [[intOrZero]] in `eval` (a null
    * int slot is default-initialized to -1 by Spark, not 0). */
  protected final def intJava(child: ExprCode): String =
    s"(${child.isNull} ? 0 : ${child.value})"
}

/** 64-bit SimHash fingerprint of whitespace tokens — SQL name
  * `graft_simhash`. */
case class GraftSimhash(child: Expression)
    extends UnaryExpression with KernelCall {

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): Any =
    Dedup.simhashFn(str(child.eval(input)))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} =
          graft.operators.Dedup.simhashFn(${strJava(c)});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftSimhash = copy(child = newChild)
}

/** Sorted distinct character-n-gram hashes — SQL name
  * `graft_shingles(text, n)`. */
case class GraftShingles(left: Expression, right: Expression)
    extends BinaryExpression with KernelCall {

  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def eval(input: InternalRow): Any =
    new GenericArrayData(Dedup.shingleHashSet(
      str(left.eval(input)), intOrZero(right.eval(input))))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = left.genCode(ctx)
    val n = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${t.code}
        ${n.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.operators.Dedup.shingleHashSet(
              ${strJava(t)}, ${intJava(n)}));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftShingles =
    copy(left = newLeft, right = newRight)
}

/** MinHash LSH band hashes — SQL name
  * `graft_minhash_bands(text, n, bands, rows_per_band)`. */
case class GraftMinhashBands(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with KernelCall {

  override def prettyName: String = "graft_minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
        Seq(second, third, fourth).forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int, int, int) arguments, got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def eval(input: InternalRow): Any =
    new GenericArrayData(Dedup.minhashBandHashes(
      str(first.eval(input)), intOrZero(second.eval(input)),
      intOrZero(third.eval(input)), intOrZero(fourth.eval(input))))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = first.genCode(ctx)
    val n = second.genCode(ctx)
    val b = third.genCode(ctx)
    val r = fourth.genCode(ctx)
    ev.copy(
      code = code"""
        ${t.code}
        ${n.code}
        ${b.code}
        ${r.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.operators.Dedup.minhashBandHashes(
              ${strJava(t)}, ${intJava(n)}, ${intJava(b)}, ${intJava(r)}));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): GraftMinhashBands =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Per-doc repetition stats `[n_tokens, n_distinct, top_bigram_n]` —
  * SQL name `graft_repetition`. Array-of-3 rather than a struct: the
  * kernel result slots into one `GenericArrayData` (no struct writer),
  * and the consumer unpacks by ordinal. */
case class GraftRepetition(child: Expression)
    extends UnaryExpression with KernelCall {

  override def prettyName: String = "graft_repetition"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): Any =
    new GenericArrayData(
      graft.operators.Curation.repetitionKernelArr(str(child.eval(input))))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.operators.Curation.repetitionKernelArr(${strJava(c)}));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GraftRepetition = copy(child = newChild)
}

/** Distinct word-`n`-gram hashes — SQL name
  * `graft_word_grams(text, n)` (the decontamination kernel). */
case class GraftWordGrams(left: Expression, right: Expression)
    extends BinaryExpression with KernelCall {

  override def prettyName: String = "graft_word_grams"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def eval(input: InternalRow): Any =
    new GenericArrayData(graft.operators.Curation.wordGramHashSet(
      str(left.eval(input)), intOrZero(right.eval(input))))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = left.genCode(ctx)
    val n = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${t.code}
        ${n.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.operators.Curation.wordGramHashSet(
              ${strJava(t)}, ${intJava(n)}));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftWordGrams =
    copy(left = newLeft, right = newRight)
}

/** Distinct deletion-neighborhood variant hashes (FastSS blocking) —
  * SQL name `graft_deletion_hashes(text, k)`. Null text → empty
  * neighborhood (no candidate pairs), matching null-key join
  * semantics. */
case class GraftDeletionHashes(left: Expression, right: Expression)
    extends BinaryExpression with KernelCall {

  override def prettyName: String = "graft_deletion_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def eval(input: InternalRow): Any =
    new GenericArrayData(graft.operators.Joins.deletionHashesKernel(
      str(left.eval(input)), intOrZero(right.eval(input))))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = left.genCode(ctx)
    val k = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${t.code}
        ${k.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.operators.Joins.deletionHashesKernel(
              ${strJava(t)}, ${intJava(k)}));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftDeletionHashes =
    copy(left = newLeft, right = newRight)
}

/** Code-point character n-grams — SQL name
  * `graft_char_ngrams(text, n)`, the codegen'd one-pass twin of
  * `transform(sequence(1, length(text)−n+1), i -> substr(text, i, n))`
  * (which is O(len²) per row: every `substr` rescans the string to
  * its position). Null-preserving like the chain it replaces (null
  * text → null array; text shorter than n → empty array). Kernel:
  * [[graft.operators.TextAnalysis.charNgramsKernel]]. */
case class GraftCharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_char_ngrams"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int) arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(t: Any, n: Any): Any =
    graft.operators.TextAnalysis.charNgramsKernel(
      t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.operators.TextAnalysis" +
        s".charNgramsKernel($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftCharNgrams =
    copy(left = newLeft, right = newRight)
}

/** All unordered pairs of an array's elements, packed
  * (lo << 32 | hi) — SQL name `graft_pair_longs`. The grouped-
  * adjacency pair generator behind the wedge/co-occurrence operators
  * (adamic-adar, bipartite projection): emits exactly C(n, 2) packed
  * pairs per row (equal elements skipped — the strict `u < w` filter
  * of the self-join form it replaces, which probed n² rows and
  * filtered half away). Callers gate on ids in [0, 2^31) so the pack
  * is bijective. Null-preserving; null elements never occur in the
  * grouped feeds (collect_list drops them, matching the null-losing
  * comparisons of the join form). */
case class GraftPairLongs(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_pair_longs"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    graft.operators.Graph.pairLongsKernel(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.Graph.pairLongsKernel($c);")

  override protected def withNewChildInternal(
      newChild: Expression): GraftPairLongs = copy(child = newChild)
}

/** Intersection of two SORTED distinct long arrays by linear merge —
  * SQL name `graft_sorted_intersect`. The triangle-close kernel:
  * `array_intersect` builds a hash set per ROW (one allocation + |a|
  * inserts + |b| probes per oriented edge); over sorted adjacency
  * this is a branchy two-pointer walk with no allocation beyond the
  * result. Same SET of elements (callers' consumers are
  * order-invariant counts); inputs must be ascending and distinct —
  * the adjacency builder sorts once per group. Null-preserving. */
case class GraftSortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_sorted_intersect"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.operators.Graph.sortedIntersectKernel(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.operators.Graph.sortedIntersectKernel($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftSortedIntersect =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC composition — SQL name `graft_nfc`. The one
  * normalization step Spark has no built-in for (é as one codepoint,
  * not e + combining acute — byte-identical text for downstream
  * hashing and dedup regardless of how the source encoded it).
  * Unlike the [[KernelCall]] kernels this is null-preserving
  * (null text → null, like every Spark string builtin): it replaces
  * the last `ScalaUDF` in the engine
  * ([[graft.operators.TextAnalysis.normalizeText]]'s `nfc`), which
  * had the same null contract, so oracle hashes are unchanged while
  * the normalize scan stays inside ONE whole-stage-codegen span.
  * Oracle twin: DuckDB `nfc_normalize`. */
case class GraftNfc(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_nfc"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.operators.TextAnalysis.nfcNormalize(
      v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.operators.TextAnalysis.nfcNormalize($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): GraftNfc = copy(child = newChild)
}

/** Column-API entry points for the text-kernel expressions — the
  * typed twins of the `graft_*` SQL functions, used by the Dedup/
  * Curation/Joins operators themselves (one expression, two
  * surfaces). */
object TextKernelFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit
  import org.apache.spark.sql.graftshim.{column, expression}

  def simhashCol(text: Column): Column =
    column(GraftSimhash(expression(text)))

  def shinglesCol(text: Column, n: Int): Column =
    column(GraftShingles(expression(text), expression(lit(n))))

  def minhashBandsCol(
      text: Column, n: Int, bands: Int, rowsPerBand: Int): Column =
    column(GraftMinhashBands(expression(text), expression(lit(n)),
      expression(lit(bands)), expression(lit(rowsPerBand))))

  def repetitionCol(text: Column): Column =
    column(GraftRepetition(expression(text)))

  def wordGramsCol(text: Column, n: Int): Column =
    column(GraftWordGrams(expression(text), expression(lit(n))))

  def deletionHashesCol(text: Column, k: Int): Column =
    column(GraftDeletionHashes(expression(text), expression(lit(k))))

  def nfcCol(text: Column): Column =
    column(GraftNfc(expression(text)))
}
