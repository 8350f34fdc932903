package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-`n`-gram shingling: `ARRAY<STRING>` tokens →
  * `ARRAY<STRING>` of space-joined n-grams, first-occurrence order, distinct.
  *
  * Semantically identical to the Column formulation
  * `array_distinct(transform(sequence(1, greatest(size(t)-(n-1),1)),
  * i => concat_ws(" ", slice(t, i, n))))` — including the "fewer tokens than
  * n ⇒ one shingle of everything" edge and concat_ws's null-skipping — but in
  * one tight JVM loop. The HOF tree is interpreted (higher-order lambdas don't
  * codegen) and measured ~4× the cost of the entire downstream LSH join;
  * shingling is on the hot path of every near-dup operator, so it gets the
  * native treatment (SURVEY §7.5 escalation rule).
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngrams requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)

  override def prettyName: String = "ngrams"
}

object NGrams {

  private val Sep = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    // mirror greatest(size-(n-1), 1): always at least one (possibly short) window
    val nWindows = math.max(m - (n - 1), 1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    val win = new java.util.ArrayList[UTF8String](n)
    var s = 0
    while (s < nWindows) {
      win.clear()
      var j = s
      val end = math.min(s + n, m)
      while (j < end) {
        if (!arr.isNullAt(j)) win.add(arr.getUTF8String(j)) // concat_ws skips nulls
        j += 1
      }
      out.add(UTF8String.concatWs(Sep, win.toArray(new Array[UTF8String](win.size())): _*))
      s += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Column-API entry point. */
  def ngrams(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      NGrams(org.apache.spark.sql.GraftExpressionBridge.toExpression(tokens), n))
}

/** Native sliding word-`n`-gram WINDOWS: like [[NGrams]] but keeps every
  * full window WITH multiplicity and in position order — the stream a
  * Markov/bigram language model counts (where [[NGrams]]'s distinct,
  * short-window-padded output is the SET a shingle sketch wants). Docs with
  * fewer than `n` tokens yield an empty array: there is no full window to
  * score.
  *
  * Column-HOF equivalent (interpreted, hence the native treatment — same
  * measured trade as [[NGrams]]):
  * `when(size(t) >= n, transform(sequence(1, size(t)-(n-1)),
  * i => concat_ws(" ", slice(t, i, n)))).otherwise(array())`.
  */
case class NgramWindows(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_windows requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramWindows.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramWindows.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramWindows =
    copy(child = newChild)

  override def prettyName: String = "ngram_windows"
}

object NgramWindows {

  private val Sep = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val nWindows = m - (n - 1)
    if (nWindows <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](nWindows)
    val parts = new Array[UTF8String](n)
    var s = 0
    while (s < nWindows) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(s + j)) null else arr.getUTF8String(s + j)
        j += 1
      }
      out(s) = UTF8String.concatWs(Sep, parts: _*) // null parts skipped
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def ngramWindows(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      NgramWindows(org.apache.spark.sql.GraftExpressionBridge.toExpression(tokens), n))
}
