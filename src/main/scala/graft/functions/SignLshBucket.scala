package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sign-LSH bucket key: the sign-bit string of `nBits` hyperplane
  * projections, hyperplane components in {-1,+1} derived from
  * `xxhash64(plane, j)` — value-identical to the Column formulation in
  * [[graft.extensions.Similarity.lshBucket]] (hash chain re-derived as
  * `hashInt(j, hashInt(plane, 42))`, projections accumulated in index order).
  *
  * The hyperplane signs depend only on (plane, dimension index) — not on the
  * vector — so they are computed once per (nBits, dim) per executor and
  * memoized; per row the projection is dim×nBits fused multiply-adds instead
  * of dim×nBits interpreted hash expressions. This is the candidate-
  * generation hot path of ANN search.
  */
case class SignLshBucket(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_lsh_bucket requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
    }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    SignLshBucket.compute(input.asInstanceOf[ArrayData], nBits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshBucket.compute($c, $nBits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_bucket"
}

object SignLshBucket {

  // (nBits, dim) → row-major [plane][dim] sign matrix; executor-lifetime cache
  private val signCache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def signs(nBits: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((nBits, dim), { case (b, d) =>
      val m = new Array[Double](b * d)
      var plane = 0
      while (plane < b) {
        val planeHash = XXH64.hashInt(plane, 42L)
        var j = 0
        while (j < d) {
          // Column form: xxhash64(lit(plane), j) = hashInt(j, hashInt(plane, 42))
          m(plane * d + j) = if (XXH64.hashInt(j, planeHash) > 0) 1.0 else -1.0
          j += 1
        }
        plane += 1
      }
      m
    })

  /** Shared by interpreted eval and generated code. Null elements contribute
    * 0 (the Column form's zip_with would null the whole projection; vectors
    * are non-null in practice — totality wins, as in DotProduct).
    */
  def compute(v: ArrayData, nBits: Int, isFloat: Boolean): UTF8String = {
    val dim = v.numElements()
    val m = signs(nBits, dim)
    val out = new Array[Byte](nBits)
    var plane = 0
    while (plane < nBits) {
      var acc = 0.0
      val base = plane * dim
      var j = 0
      while (j < dim) {
        if (!v.isNullAt(j)) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          acc += x * m(base + j)
        }
        j += 1
      }
      out(plane) = if (acc >= 0) '1'.toByte else '0'.toByte
      plane += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-API entry point. */
  def signLshBucket(v: Column, nBits: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      SignLshBucket(org.apache.spark.sql.GraftExpressionBridge.toExpression(v), nBits))
}
