package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Runtime function registration into an EXISTING session (sessionState is
  * private[sql], hence this bridge). GraftExtensions covers the
  * config-driven path (spark.sql.extensions) for new sessions; this covers
  * sessions already running.
  *
  * Besides the native codegen'd FloatArrayDot, the engine's composite text
  * operators are exposed to SQL by building their Column expression trees
  * from the call's child expressions. No UDF anywhere — each is a
  * composition of built-in expressions; note the token/lang/quality/hamming
  * ones contain higher-order functions (ArrayFilter/ArrayAggregate), which
  * evaluate interpreted (CodegenFallback), same as their Column-API forms.
  */
object GraftFunctions {

  private def asCol(e: Expression) = ExpressionUtils.column(e)
  // ExpressionUtils.expression only WRAPS the ColumnNode; from a function
  // builder the analyzer never unwraps it, so convert eagerly — the
  // converted tree's remaining UnresolvedFunctions are ordinary built-ins
  // the analyzer resolves in later passes.
  private def asExpr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  private def fn(name: String, arity: Int, clazz: Class[_])(build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name takes $arity argument(s)")
        build(children)
      })

  /** (identifier, info, builder) triples shared by both registration paths
    * (GraftExtensions for new sessions, [[register]] for running ones). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("float_array_dot", 2, classOf[FloatArrayDot])(cs => FloatArrayDot(cs.head, cs(1))),
    fn("graft_fingerprint", 1, graft.functions.TextFunctions.getClass)(cs =>
      asExpr(graft.functions.TextFunctions.fingerprint(asCol(cs.head)))),
    fn("graft_quality_score", 1, graft.functions.TextFunctions.getClass)(cs =>
      asExpr(graft.functions.TextFunctions.qualityScore(asCol(cs.head)))),
    fn("graft_lang_id", 1, graft.functions.TextFunctions.getClass)(cs =>
      asExpr(graft.functions.TextFunctions.langId(asCol(cs.head)))),
    fn("graft_token_count", 1, graft.functions.TextFunctions.getClass)(cs =>
      asExpr(graft.functions.TextFunctions.tokenCount(asCol(cs.head)))),
    fn("graft_hamming_bits", 2, graft.operators.Dedup.getClass)(cs =>
      asExpr(graft.operators.Dedup.hammingBits(asCol(cs.head), asCol(cs(1))))),
    // graft_hash_bucket(key, salt, nBuckets): the Splits.hashBucket
    // contract — value-identical to the Scala form so SQL users share
    // the same deterministic split/sample/quota hash space
    fn("graft_hash_bucket", 3, graft.operators.Splits.getClass)(cs => {
      import org.apache.spark.sql.functions._
      val key = asCol(cs.head); val salt = asCol(cs(1)); val n = asCol(cs(2))
      // match Splits.hashBucket's require(nBuckets > 0) and a non-null
      // salt at the SQL surface: the non-ANSI modulo would otherwise
      // return NULL for every row (nBuckets = 0, or a null salt nulling
      // the hash), silently dropping all rows in a WHERE — fail loudly
      // like the Scala contract instead.
      val nOk = when(n.isNull.or(n <= lit(0)),
        raise_error(concat(lit("graft_hash_bucket: nBuckets must be positive, got "),
          coalesce(n.cast("string"), lit("NULL"))))).otherwise(n)
      val saltOk = when(salt.isNull,
        raise_error(lit("graft_hash_bucket: salt must not be null"))).otherwise(salt)
      asExpr(conv(substring(md5(concat(saltOk, lit(":"), key.cast("string"))), 1, 15), 16, 10)
        .cast("long") % nOk)
    }),
    fn("graft_strip_markup", 1, graft.operators.Clean.getClass)(cs =>
      asExpr(graft.operators.Clean.stripMarkup(asCol(cs.head)))),
    fn("graft_link_density", 1, graft.operators.Clean.getClass)(cs =>
      asExpr(graft.operators.Clean.linkDensity(asCol(cs.head)))),
    fn("graft_host", 1, graft.operators.Urls.getClass)(cs =>
      asExpr(graft.operators.Urls.extractHost(asCol(cs.head)))),
    fn("graft_domain", 1, graft.operators.Urls.getClass)(cs =>
      asExpr(graft.operators.Urls.normalizedDomain(asCol(cs.head)))),
    fn("graft_nfc", 1, classOf[NfcNormalize])(cs => NfcNormalize(cs.head)),
    fn("graft_strip_accents", 1, classOf[StripAccents])(cs => StripAccents(cs.head)),
    fn("graft_deflate_size", 1, classOf[DeflateSize])(cs => DeflateSize(cs.head)),
    fn("graft_url_canonical", 1, graft.operators.Urls.getClass)(cs =>
      asExpr(graft.operators.Urls.canonicalizeUrl(asCol(cs.head)))))

  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    // running-session twin of GraftExtensions' injectOptimizerRule
    if (!spark.experimental.extraOptimizations.contains(BandedLevenshtein)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedLevenshtein
    }
  }
}
