package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF probe: the `nProbe` nearest k-means cells for a vector, ranked
  * by `‖c‖² − 2·v·c` (≡ L2 order — the `‖v‖²` term is constant per row) with
  * ties to the lower cell id.
  *
  * Value-identical to the Column formulation
  * `slice(transform(array_sort(zip_with(zip_with(centroidsLit, normsLit,
  * (c, n2) => n2 - 2.0*dot(v, c)), sequence(0, k-1), (d, i) => struct(d, i))),
  * s => s("cell")), 1, n)`: same DotProduct left fold per cell, same
  * `SQLOrderingUtil`-style double comparison (`==` short-circuits −0.0/0.0,
  * NaN sorts last), same (dist, cell) tie order.
  *
  * Why native (SURVEY §7.5 escalation rule): that HOF tree was the last
  * interpreted hot-path expression in the engine — it re-materializes a
  * k-wide struct array and sorts it per CORPUS ROW during cell assignment.
  * Here the centroid matrix rides along as a codegen reference object (a few
  * KB inside the plan, no join) and each row costs k fused dot products plus
  * an insertion argsort of k ints.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nProbe >= 1 && nProbe <= centroids.length,
    s"nProbe must be in [1, ${centroids.length}], got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
    }

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  // same fold as the Column form's typedLit(c.map(x => x*x).sum)
  @transient private lazy val norms: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum).toArray
  private lazy val childFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], matrix, norms, nProbe, childFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cmatrix", matrix, "double[][]")
    val n2 = ctx.addReferenceObj("cnorms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCells.compute($c, $m, $n2, $nProbe, $childFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

object NearestCells {

  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData, centroids: Array[Array[Double]], norms: Array[Double],
      n: Int, isFloat: Boolean): ArrayData = {
    val k = centroids.length
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val m = math.min(v.numElements(), cent.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        // same null-as-0 / min-length semantics as DotProduct.compute
        if (!v.isNullAt(i)) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          acc += x * cent(i)
        }
        i += 1
      }
      dist(c) = norms(c) - 2.0 * acc
      c += 1
    }
    // insertion argsort by (dist, cell) — k is the centroid count (small);
    // `==` first mirrors SQLOrderingUtil.compareDoubles (−0.0 == 0.0), then
    // Double.compare puts NaN last like Spark's sort
    val idx = new Array[Int](k)
    var i = 0
    while (i < k) { idx(i) = i; i += 1 }
    var a = 1
    while (a < k) {
      val t = idx(a)
      var b = a - 1
      while (b >= 0 && after(dist, idx(b), t)) {
        idx(b + 1) = idx(b)
        b -= 1
      }
      idx(b + 1) = t
      a += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(idx, n))
  }

  private def after(dist: Array[Double], i: Int, j: Int): Boolean =
    if (dist(i) == dist(j)) i > j
    else java.lang.Double.compare(dist(i), dist(j)) > 0

  /** Column-API entry point. */
  def nearestCells(v: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      NearestCells(org.apache.spark.sql.GraftExpressionBridge.toExpression(v),
        centroids, nProbe))
}
