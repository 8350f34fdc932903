package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: `ARRAY<STRING>` shingles → `ARRAY<LONG>` of `k`
  * per-seed minima.
  *
  * Value-identical to the Column formulation
  * `aggregate(sh, array_repeat(maxLong, k), (acc, s) => zip_with(acc,
  * sequence(0, k-1), (m, seed) => least(m, xxhash64(s, seed))))`: Spark's
  * `xxhash64(s, seed)` chains its children — `XXH64.hashLong(seed,
  * XXH64.hashUTF8String(s, 42))` — so each shingle needs ONE string hash and
  * `k` constant-time long-hash mixes, not `k` string passes. The aggregate/
  * zip_with tree additionally allocates a fresh k-wide array per shingle and
  * runs interpreted (HOFs don't codegen); this loop allocates one signature
  * array per row. Same numbers, ~10× less work per shingle at k=32.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"signature width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  /** Shared by interpreted eval and generated code. Null shingles fold the
    * same value the Column form does: Spark's `xxhash64` is non-nullable — a
    * null string child leaves the running hash at the seed (42), then the int
    * seed is mixed in, so `xxhash64(null, seed) = hashInt(seed, 42)` and
    * `least(m, ...)` folds that constant into each minimum. (Unreachable via
    * `Dedup.shingles` — NGrams output has containsNull=false — but
    * user-supplied ARRAY<STRING> with nulls now matches exactly.) */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var seed = 0
      while (seed < k) {
        // the Column form's seeds come from sequence() as INTs, so Spark's
        // xxhash64 chain mixes them with hashInt (not hashLong)
        val h = XXH64.hashInt(seed, base)
        if (h < sig(seed)) sig(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Column-API entry point. */
  def minhashSig(shingles: Column, k: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      MinHashSig(org.apache.spark.sql.GraftExpressionBridge.toExpression(shingles), k))
}
