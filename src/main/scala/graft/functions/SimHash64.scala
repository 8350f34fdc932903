package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an `ARRAY<STRING>` of shingles.
  *
  * Why a custom Catalyst expression (SURVEY §7.5's only escalation trigger —
  * "built-ins can't express it efficiently"): the Column-API formulation needs
  * one seeded hash PER BIT because higher-order-function lambdas cannot do
  * variable-amount bit shifts — 64 hash invocations and a 64-wide array
  * rebuild per shingle. Natively, each shingle is hashed ONCE (XXH64 over its
  * UTF-8 bytes, the same kernel Spark's `xxhash64` uses) and all 64 bit
  * counters update in a tight JVM loop: ~64× fewer hash calls, zero
  * per-shingle allocations.
  *
  * Bit i of the result is set iff Σ_shingles (bit i of xxhash64(shingle) ? +1
  * : −1) > 0. Null input → null; null array elements are skipped.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hash(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Shared by interpreted eval and generated code. */
  def hash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUTF8String(s, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry point (Spark 4's classic bridge converts Column ↔
    * catalyst Expression).
    */
  def simhash64(shingles: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      SimHash64(org.apache.spark.sql.GraftExpressionBridge.toExpression(shingles)))
}
