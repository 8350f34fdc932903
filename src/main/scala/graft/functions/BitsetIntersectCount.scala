package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native popcount(a AND b) over two long-array bitsets — value-identical to
  * the Column formulation
  * `aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseAND(y))), 0, _+_)`
  * (both iterate word-by-word; integer popcount sums are order-independent,
  * so equality is exact, not approximate).
  *
  * Why native (SURVEY §7.5 escalation rule): set-intersection cardinality is
  * the innermost loop of the small-vocabulary n-gram Jaccard path
  * ([[graft.extensions.Dedup.ngramJaccardPairs]]) — it runs once per candidate
  * PAIR of a block self-join, and the zip_with/aggregate tree is interpreted
  * with a per-pair intermediate array allocation. The generated code is a
  * branchless `Long.bitCount` loop over ≤ vocab/64 words.
  *
  * Null handling mirrors [[DotProduct]]: null ELEMENTS count as 0 (callers
  * build masks from `array_repeat`/`transform`, which never produce null
  * words; tolerating them keeps the loop total), null ARRAYS yield null via
  * `BinaryExpression.nullSafeEval`. Arrays of unequal length intersect over
  * the common prefix (min length) — a mask pair from the same dictionary is
  * always equal-length.
  */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitset_intersect_count requires ARRAY<BIGINT>, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    BitsetIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitsetIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitsetIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bitset_intersect_count"
}

object BitsetIntersectCount {

  /** Shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      }
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def bitsetIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      BitsetIntersectCount(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(a),
        org.apache.spark.sql.GraftExpressionBridge.toExpression(b)))
}
