package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProduct, MinHashSig, NGrams, SignLshBucket, SimHash64}

/** Registers graft's native Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(ngrams(tokens, 2)) ...")` works the same as
  * the Column API — the idiomatic packaging for a Spark-native library
  * (`spark.sql.extensions=graft.GraftExtensions` on any cluster, zero code).
  *
  * Functions: `ngrams(ARRAY<STRING>, n)`, `minhash_sig(ARRAY<STRING>, k)`,
  * `simhash64(ARRAY<STRING>)`, `dot_product(ARRAY<FLOAT|DOUBLE>,
  * ARRAY<FLOAT|DOUBLE>)`, `sign_lsh_bucket(ARRAY<FLOAT|DOUBLE>, nBits)`,
  * `bitset_intersect_count(ARRAY<BIGINT>, ARRAY<BIGINT>)`,
  * `ngram_stats(ARRAY<STRING>, n)`, `bitset_from_positions(ARRAY<INT>,
  * nBits)`, `jaro_winkler_similarity(STRING, STRING)`,
  * `hilbert2(BIGINT, BIGINT, order)`, `hilbert2_decode(BIGINT, order)`,
  * `token_entropy(ARRAY<STRING>)`, `doc_fingerprint64(STRING, shingleLen,
  * maxSamples)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.ThresholdLevenshteinRewrite)
  }
}

object GraftExtensions {

  /** Second argument of ngrams/minhash_sig must be a foldable INT (it shapes
    * the expression itself, like Spark's own `array_repeat` count). */
  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn requires a literal INT, got ${other.sql}")
  }

  /** Explicit arity check: extra args must not be silently ignored (a
    * three-arg dot_product computing the two-arg answer is wrong-looking-
    * right), missing args must not surface as IndexOutOfBounds. */
  private def arity(fn: String, n: Int, args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")
    args
  }

  /** Lossless widen to BIGINT for strict-typed expressions (SQL integer
    * literals arrive as INT). Non-integral types pass through so the
    * expression's own type check reports them. */
  private def asLong(e: Expression): Expression = e.dataType match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType | IntegerType =>
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.LongType)
    case _ => e
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(arity("simhash64", 1, args).head)),
    (FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "ngrams"),
      (args: Seq[Expression]) => { arity("ngrams", 2, args)
        NGrams(args(0), litInt(args(1), "ngrams")) }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => { arity("minhash_sig", 2, args)
        MinHashSig(args(0), litInt(args(1), "minhash_sig")) }),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => { arity("dot_product", 2, args)
        DotProduct(args(0), args(1)) }),
    (FunctionIdentifier("sign_lsh_bucket"),
      new ExpressionInfo(classOf[SignLshBucket].getName, "sign_lsh_bucket"),
      (args: Seq[Expression]) => { arity("sign_lsh_bucket", 2, args)
        SignLshBucket(args(0), litInt(args(1), "sign_lsh_bucket")) }),
    (FunctionIdentifier("ngram_stats"),
      new ExpressionInfo(classOf[graft.functions.NgramStats].getName, "ngram_stats"),
      (args: Seq[Expression]) => { arity("ngram_stats", 2, args)
        graft.functions.NgramStats(args(0), litInt(args(1), "ngram_stats")) }),
    (FunctionIdentifier("bitset_intersect_count"),
      new ExpressionInfo(classOf[graft.functions.BitsetIntersectCount].getName,
        "bitset_intersect_count"),
      (args: Seq[Expression]) => { arity("bitset_intersect_count", 2, args)
        graft.functions.BitsetIntersectCount(args(0), args(1)) }),
    (FunctionIdentifier("bitset_from_positions"),
      new ExpressionInfo(classOf[graft.functions.BitsetFromPositions].getName,
        "bitset_from_positions"),
      (args: Seq[Expression]) => { arity("bitset_from_positions", 2, args)
        graft.functions.BitsetFromPositions(args(0),
          litInt(args(1), "bitset_from_positions")) }),
    (FunctionIdentifier("jaro_winkler_similarity"),
      new ExpressionInfo(classOf[graft.functions.JaroWinklerSimilarity].getName,
        "jaro_winkler_similarity"),
      (args: Seq[Expression]) => { arity("jaro_winkler_similarity", 2, args)
        graft.functions.JaroWinklerSimilarity(args(0), args(1)) }),
    (FunctionIdentifier("hilbert2"),
      new ExpressionInfo(classOf[graft.functions.HilbertIndex2].getName,
        "hilbert2"),
      (args: Seq[Expression]) => { arity("hilbert2", 3, args)
        // the expression wants strict BIGINT; SQL integer literals arrive
        // as INT, so cast here (lossless widening) instead of failing
        graft.functions.HilbertIndex2(asLong(args(0)), asLong(args(1)),
          litInt(args(2), "hilbert2")) }),
    (FunctionIdentifier("hilbert2_decode"),
      new ExpressionInfo(classOf[graft.functions.HilbertDecode2].getName,
        "hilbert2_decode"),
      (args: Seq[Expression]) => { arity("hilbert2_decode", 2, args)
        graft.functions.HilbertDecode2(asLong(args(0)),
          litInt(args(1), "hilbert2_decode")) }),
    (FunctionIdentifier("token_entropy"),
      new ExpressionInfo(classOf[graft.functions.TokenEntropy].getName,
        "token_entropy"),
      (args: Seq[Expression]) =>
        graft.functions.TokenEntropy(arity("token_entropy", 1, args).head)),
    (FunctionIdentifier("doc_fingerprint64"),
      new ExpressionInfo(classOf[graft.functions.DocFingerprint64].getName,
        "doc_fingerprint64"),
      (args: Seq[Expression]) => { arity("doc_fingerprint64", 3, args)
        graft.functions.DocFingerprint64(args(0),
          litInt(args(1), "doc_fingerprint64"),
          litInt(args(2), "doc_fingerprint64")) }))

  /** Imperative registration on an existing session (same builders as the
    * config-driven path; the optimizer rule goes through the experimental
    * hook — idempotent, registered once). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.ThresholdLevenshteinRewrite))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.ThresholdLevenshteinRewrite)
  }
}
