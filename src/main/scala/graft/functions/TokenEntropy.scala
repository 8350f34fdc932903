package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token-distribution entropy: `ARRAY<STRING>` tokens →
  * `STRUCT<n_tokens, n_types, entropy_micros>` where `entropy_micros` is the
  * Shannon entropy of the doc's own unigram distribution in integer
  * MICRO-nats: `Σ_types round(−p·ln(p) · 1e6)` with `p = count/n_tokens`.
  *
  * Low entropy = a few token types dominate (keyword stuffing, log spew,
  * boilerplate) — the token-distribution quality signal that complements the
  * positional repetition stats of [[NgramStats]] (which see order, not
  * concentration). `exp(entropy)` is the doc's "effective vocabulary".
  *
  * Integer micro-nats are the engine-crossing float contract taken to its
  * endpoint: each TYPE's contribution is rounded to the nearest micro-nat
  * (exactly `round(−p·ln(p)·1e6, 0)` of the same IEEE doubles any SQL engine
  * computes), and the per-doc value is an exact integer SUM — reproducible
  * regardless of hash-map iteration order here or aggregation order in the
  * DuckDB oracle, with no DECIMAL plumbing in the expression tree.
  *
  * A per-doc explode→groupBy(doc, token) formulation shuffles the corpus's
  * token stream to count within each doc; this computes the same stats in one
  * scan-local JVM loop per row, inside whole-stage codegen — the same trade
  * as [[NgramStats]]. Empty docs: (0, 0, 0).
  */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("entropy_micros", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_entropy requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenEntropy.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)

  override def prettyName: String = "token_entropy"
}

object TokenEntropy {

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val m = arr.numElements()
    if (m == 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Long](m * 2)
    var i = 0
    while (i < m) {
      val key = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      counts.put(key, counts.getOrDefault(key, 0L) + 1L)
      i += 1
    }
    var micros = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / m.toDouble
      // identical IEEE shape to the oracle's round(-(c/m)*ln(c/m)*1e6, 0):
      // negate, multiply by ln, scale — then round half-up (p ≤ 1 ⇒ term ≥ 0)
      micros += Math.round(-p * Math.log(p) * 1000000.0)
    }
    new GenericInternalRow(Array[Any](m.toLong, counts.size.toLong, micros))
  }

  /** Column-API entry point. */
  def tokenEntropy(tokens: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      TokenEntropy(org.apache.spark.sql.GraftExpressionBridge.toExpression(tokens)))
}
