package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native bitset construction from a dictionary-position array — value-
  * identical to the Column formulation
  * {{{
  *   transform(sequence(0, nWords-1), w =>
  *     aggregate(filter(ps, p => floor(p/64) = w), 0L,
  *       (acc, p) => acc | shiftleft(1L, p % 64)))
  * }}}
  * (OR is commutative/idempotent, so accumulation order can't matter; both
  * forms set exactly bit `p mod 64` of word `p div 64`).
  *
  * Why native (SURVEY §7.5 escalation rule): this is the mask-build step of
  * the small-vocabulary n-gram Jaccard path
  * ([[graft.extensions.Dedup.ngramJaccardPairs]]). It runs once per DOC (not
  * per pair), but the HOF tree above is interpreted and O(nWords × |ps|) —
  * it re-scans the whole position array for every word — where the generated
  * code is one O(|ps|) pass with an allocation-free bit set per position.
  * Positions outside `[0, 64·nWords)` are ignored (the dictionary bounds
  * positions below 64·nWords by construction, since nWords = ⌈vocab/64⌉);
  * null elements are skipped ([[DotProduct]] convention), a null array
  * yields null.
  */
case class BitsetFromPositions(child: Expression, nWords: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _)
        if nWords > 0 && nWords <= BitsetFromPositions.MaxWords =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bitset_from_positions requires ARRAY<INT|BIGINT> and nWords in " +
        s"[1, ${BitsetFromPositions.MaxWords}], got " +
        s"${child.dataType.catalogString} / nWords=$nWords")
  }

  // lazy: dataType must not be touched while the child is still unresolved
  // (copy/withNewChildInternal runs during analysis)
  private lazy val elemIsLong = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    BitsetFromPositions.compute(input.asInstanceOf[ArrayData], nWords, elemIsLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BitsetFromPositions.compute($c, $nWords, $elemIsLong)")

  override protected def withNewChildInternal(newChild: Expression): BitsetFromPositions =
    copy(child = newChild)

  override def prettyName: String = "bitset_from_positions"
}

object BitsetFromPositions {

  /** Upper bound on the per-row allocation: `compute` allocates 8·nWords
    * bytes for EVERY row, and the SQL-registered form accepts any INT
    * literal, so an unbounded nWords lets a single careless
    * `bitset_from_positions(ps, 100000000)` OOM executors. The internal
    * caller ([[graft.extensions.Dedup.ngramJaccardPairs]]) never exceeds
    * ⌈maxDictVocab/64⌉ = 64 words; 16384 words (128 KiB/row, 2^20 bits)
    * leaves two orders of magnitude of headroom while keeping the worst
    * case executor-safe. */
  val MaxWords: Int = 16384

  /** Shared by interpreted eval and generated code. */
  def compute(ps: ArrayData, nWords: Int, elemIsLong: Boolean): ArrayData = {
    val words = new Array[Long](nWords)
    val n = ps.numElements()
    var i = 0
    while (i < n) {
      if (!ps.isNullAt(i)) {
        val p = if (elemIsLong) ps.getLong(i) else ps.getInt(i).toLong
        if (p >= 0L && p < 64L * nWords) {
          words((p >> 6).toInt) |= 1L << (p & 63L).toInt
        }
      }
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Column-API entry point. */
  def bitsetFromPositions(ps: Column, nWords: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      BitsetFromPositions(
        org.apache.spark.sql.GraftExpressionBridge.toExpression(ps), nWords))
}
