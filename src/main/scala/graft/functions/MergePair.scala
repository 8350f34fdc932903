package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy adjacent-pair merge — the BPE training step: every
  * left-to-right occurrence of the adjacent symbols `(a, b)` in the input
  * array collapses to the single symbol `a+b`; merged positions don't
  * overlap (`[a,a,a]` with pair `(a,a)` → `[aa,a]`, the reference BPE
  * behavior).
  *
  * Sequential-greedy semantics are exactly what Column HOFs can't express
  * (each position's decision depends on whether the PREVIOUS position
  * merged), hence the native expression: one tight JVM loop, codegen'd, run
  * once per vocabulary word per training round.
  */
case class MergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"merge_pair requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MergePair.compute(input.asInstanceOf[ArrayData],
      UTF8String.fromString(a), UTF8String.fromString(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mergeA", UTF8String.fromString(a))
    val bRef = ctx.addReferenceObj("mergeB", UTF8String.fromString(b))
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MergePair.compute($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)

  override def prettyName: String = "merge_pair"
}

object MergePair {

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val m = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](m)
    var i = 0
    while (i < m) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (i + 1 < m && cur != null && !arr.isNullAt(i + 1) &&
          cur.equals(a) && arr.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Column-API entry point. */
  def mergePair(arr: Column, a: String, b: String): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      MergePair(org.apache.spark.sql.GraftExpressionBridge.toExpression(arr),
        a, b))
}
