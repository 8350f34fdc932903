package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** 2-D Hilbert curve index — the locality-first alternative to
  * [[graft.ops.Layout]]'s Z-order for multi-dimensional file clustering:
  * both map (x, y) cells to a 1-D sort key whose ranges stay spatially
  * compact, but the Hilbert walk never takes Z-order's long diagonal jumps
  * (consecutive keys are ALWAYS grid neighbors — HilbertSpec pins the
  * unit-step property), which at 100 TB means a min/max-zoned range scan
  * touches measurably fewer files for the same 2-D predicate box
  * (Delta/Iceberg both offer Hilbert above Z-order for exactly this
  * reason).
  *
  * Algorithm: the textbook iterative xy2d/d2xy (Hilbert 1891 via the
  * quadrant-rotation formulation): walk bit planes from the top, accumulate
  * quadrant offsets `s²·((3·rx) XOR ry)`, rotate/reflect the lower plane.
  * A bit loop with per-plane swaps has no closed bit-trick form (unlike
  * Z-order's magic masks), so this is a native expression pair rather than
  * a Column formula — interpreted eval and generated code share the same
  * static loops.
  *
  * `order` = bits per dimension (the grid is 2^order × 2^order); keys fit
  * a signed long up to order 31. Out-of-range or negative inputs yield
  * NULL (the [[graft.ops.Layout.zorder2]] contract).
  */
case class HilbertIndex2(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert2 requires BIGINT inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Object r = graft.functions.HilbertCurve.xy2d($a, $b, $order);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (Long) r; }
       """.stripMargin)
    out
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert2"
}

/** Exact inverse of [[HilbertIndex2]]: key → [x, y]. NULL key (an
  * out-of-range encode) decodes to NULL, mirroring
  * [[graft.ops.Layout.zorderDecode]].
  */
case class HilbertDecode2(child: Expression, order: Int)
    extends UnaryExpression {
  require(order >= 1 && order <= 31, s"order must be in [1,31], got $order")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert2_decode requires a BIGINT key, got ${child.dataType.catalogString}")

  override def nullSafeEval(d: Any): Any =
    HilbertCurve.d2xy(d.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d =>
      s"""
         |Object r = graft.functions.HilbertCurve.d2xy($d, $order);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HilbertDecode2 =
    copy(child = newChild)

  override def prettyName: String = "hilbert2_decode"
}

object HilbertCurve {

  /** (x, y) → curve position on the 2^order grid; null when out of range.
    * Shared by interpreted eval and generated code.
    */
  def xy2d(x0: Long, y0: Long, order: Int): Object = {
    val n = 1L << order
    if (x0 < 0 || y0 < 0 || x0 >= n || y0 >= n) return null
    // verbatim textbook loop (rotation operates on UNMASKED coordinates;
    // negative intermediates are part of the algorithm's contract and
    // two's-complement & extracts the same bits as in the reference C)
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    java.lang.Long.valueOf(d)
  }

  /** Curve position → [x, y]; null when `d` is outside [0, 4^order). */
  def d2xy(d0: Long, order: Int): Object = {
    if (order > 31) return null
    val cells = 1L << (2 * order)
    if (d0 < 0 || d0 >= cells) return null
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    val n = 1L << order
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    new GenericArrayData(Array[Any](x, y))
  }

  /** Column wrappers. */
  def hilbert2(x: Column, y: Column, order: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      HilbertIndex2(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(x),
        org.apache.spark.sql.GraftExpressionBridge.toExpression(y), order))

  def hilbert2Decode(d: Column, order: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      HilbertDecode2(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(d), order))
}
