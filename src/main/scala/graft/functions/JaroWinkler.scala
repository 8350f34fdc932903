package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity (Winkler 1990) — the standard
  * record-linkage scorer for short identity-ish strings (names, titles,
  * slugs): Jaro's match/transposition ratio, boosted by up to 4 chars of
  * common prefix when the base similarity exceeds 0.7.
  *
  * Semantics are pinned to the reference oracle implementation (DuckDB
  * `jaro_winkler_similarity`, itself the textbook definition), verified
  * case-by-case in the spec:
  *   - match window = max(|a|,|b|)/2 − 1 (floored at 0);
  *   - transpositions = half the out-of-order matched pairs;
  *   - prefix boost `l·0.1·(1−jaro)` with l ≤ 4, applied only when
  *     jaro > 0.7 (the classic boost threshold);
  *   - either side empty (including BOTH empty) → 0.0.
  *
  * Operates on UTF-8 BYTES, not code points — identical results for ASCII
  * (the corpus case) and for any equal-normalization comparison, one less
  * decode pass per pair. Why native (SURVEY §7.5 escalation rule): like
  * [[DotProduct]], this runs once per CANDIDATE PAIR in the inner loop of
  * blocked fuzzy matching; a Scala UDF there breaks whole-stage codegen and
  * pays boxing per pair.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires STRING inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSimilarity.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerSimilarity.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerSimilarity {

  /** Shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes()
    val lb = b.numBytes()
    if (la == 0 || lb == 0) return 0.0
    // match window; the (i, j) scan marks each b-byte at most once
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val ca = a.getByte(i)
      var j = math.max(0, i - window)
      val jEnd = math.min(lb, i + window + 1)
      var found = false
      while (!found && j < jEnd) {
        if (!mb(j) && b.getByte(j) == ca) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched bytes compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - half) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a.getByte(l) == b.getByte(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column wrapper: `jaro_winkler(a, b)` as a codegen'd double. */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      JaroWinklerSimilarity(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(a),
        org.apache.spark.sql.GraftExpressionBridge.toExpression(b)))
}
