package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram multiplicity stats for repetition filtering:
  * `ARRAY<STRING>` tokens → `STRUCT<total, distinct, top>` over the doc's
  * sliding n-gram windows (total = window count, distinct = distinct n-grams,
  * top = the highest multiplicity of any single n-gram).
  *
  * Fuels Gopher-style repetition signals (Rae et al. 2021 §A1.1: "fraction of
  * characters in the most common n-gram", "fraction of duplicate n-grams") —
  * `top/total` and `1 − distinct/total` — which a training-data pipeline runs
  * over every document. A per-doc explode→groupBy formulation shuffles the
  * CORPUS's n-grams to count within each doc; this computes the same stats in
  * one scan-local JVM loop per row, inside whole-stage codegen. Docs shorter
  * than n have no full window: (0, 0, 0).
  */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("distinct", LongType, nullable = false),
    StructField("top", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_stats requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)

  override def prettyName: String = "ngram_stats"
}

object NgramStats {

  private val Sep = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): InternalRow = {
    val m = arr.numElements()
    val windows = m - (n - 1)
    if (windows <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Long](windows * 2)
    var top = 0L
    val parts = new Array[UTF8String](n)
    var s = 0
    while (s < windows) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(s + j)) null else arr.getUTF8String(s + j)
        j += 1
      }
      val key = UTF8String.concatWs(Sep, parts: _*) // null parts skipped
      val c = counts.getOrDefault(key, 0L) + 1L
      counts.put(key, c)
      if (c > top) top = c
      s += 1
    }
    new GenericInternalRow(Array[Any](windows.toLong, counts.size.toLong, top))
  }

  /** Column-API entry point. */
  def ngramStats(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      NgramStats(org.apache.spark.sql.GraftExpressionBridge.toExpression(tokens), n))
}
