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

  private def nary(
      name: String,
      clazz: Class[_],
      arity: Int,
      make: Seq[Expression] => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == arity,
        s"$name expects exactly $arity arguments, got ${args.length}")
      make(args)
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      builder)
  }

  private def binary(
      name: String,
      clazz: Class[_],
      make: (Expression, Expression) => Expression) =
    nary(name, clazz, 2, args => make(args(0), args(1)))

  /** (identifier, info, builder) triples in `injectFunction` shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary("vec_dot", classOf[VecDot], VecDot.apply),
    binary("vec_sqdist", classOf[VecSqDist], VecSqDist.apply),
    // the dedup text kernels — same compiled kernels the operators
    // run, reachable from pure SQL (arguments: see TextExpressions)
    nary("graft_simhash", classOf[GraftSimhash], 1,
      args => GraftSimhash(args(0))),
    nary("graft_shingles", classOf[GraftShingles], 2,
      args => GraftShingles(args(0), args(1))),
    nary("graft_minhash_bands", classOf[GraftMinhashBands], 4,
      args => GraftMinhashBands(args(0), args(1), args(2), args(3))),
    // the curation / fuzzy-join kernels (round-11 graduates)
    nary("graft_repetition", classOf[GraftRepetition], 1,
      args => GraftRepetition(args(0))),
    binary("graft_word_grams", classOf[GraftWordGrams],
      GraftWordGrams.apply),
    binary("graft_deletion_hashes", classOf[GraftDeletionHashes],
      GraftDeletionHashes.apply),
    nary("graft_nfc", classOf[GraftNfc], 1, args => GraftNfc(args(0))),
    binary("graft_char_ngrams", classOf[GraftCharNgrams],
      GraftCharNgrams.apply),
    nary("graft_pair_longs", classOf[GraftPairLongs], 1,
      args => GraftPairLongs(args(0))))

  /** Column-level probe of a serialized Spark sketch-format Bloom
    * filter: Catalyst's own `BloomFilterMightContain` over the bytes as
    * a foldable literal — the filter deserializes ONCE (lazy, inside
    * the expression) and the probe stays in whole-stage codegen; the
    * broadcast-UDF form this replaces evaluated through the
    * interpreted ScalaUDF bridge. `value` must be a LONG column (the
    * xxhash64 fingerprint convention everywhere in this engine). */
  def bloomMightContain(
      sketchBytes: Array[Byte],
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(sketchBytes),
        org.apache.spark.sql.graftshim.expression(value)))

  /** Register on a live session (the builder-time extension path only
    * reaches sessions created after it is configured). Idempotent —
    * re-registration replaces the same entries. */
  def register(spark: SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.graftshim.applyFunctionInjections(spark, ext)
  }
}
