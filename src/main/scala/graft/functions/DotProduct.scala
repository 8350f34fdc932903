package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Σ aᵢ·bᵢ over two numeric arrays, accumulated in double in index
  * order — value-identical to the Column formulation
  * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)), 0.0, _+_)`
  * (same left-fold order ⇒ bit-identical doubles; float→double widening is
  * exact).
  *
  * Why native (SURVEY §7.5 escalation rule): the aggregate/zip_with tree is
  * interpreted (HOFs don't codegen) and allocates an intermediate array per
  * row-pair; on similarity paths the dot product runs once per CANDIDATE PAIR
  * — the innermost loop of brute-force/LSH/IVF search. Null elements count as
  * 0 (the Column form propagates null products into a null sum; callers feed
  * non-null embeddings — this keeps the loop branch-light and total).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<FLOAT|DOUBLE>, got ${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private lazy val leftFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.compute($a, $b, $leftFloat, $rightFloat)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {

  /** Shared by interpreted eval and generated code. Iterates min(|a|,|b|)
    * (zip_with would null-pad the longer side → null products → callers never
    * rely on padding; embeddings are equal-length).
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      DotProduct(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(a),
        org.apache.spark.sql.GraftExpressionBridge.toExpression(b)))
}
