package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document DEFLATE statistics: `STRING` → `STRUCT<n_bytes,
  * n_deflate>` — the UTF-8 byte length and the deflate(level 6, zlib
  * wrapping) size of the text. `n_deflate / n_bytes` is the compression-ratio
  * quality signal (RefinedWeb §3.1's repetition proxy): highly compressible
  * text is templated/repetitive (log spew, keyword stuffing, generated
  * boilerplate), nearly incompressible text is noise/binary-in-text — both
  * tails are what a curation gate drops.
  *
  * The codec is pinned (level 6, zlib header, JDK Deflater) so the value is
  * a deterministic pure function of the bytes across executors and runs. No
  * SQL engine exposes deflate, so queries over this signal are ROWS-ONLY by
  * contract, with an invariant-twin query asserting codec soundness bounds
  * (the x25/x26 pattern).
  *
  * Scan-local and codegen'd like every native function here: one JVM call
  * per row, no shuffle, no UDF/encoder boxing. Cost is O(bytes) with a
  * ~32 KB LZ77 window — the same order as the regexp passes the quality
  * rules already run.
  */
case class DeflateStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_deflate", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"deflate_stats requires STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    DeflateStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateStats =
    copy(child = newChild)

  override def prettyName: String = "deflate_stats"
}

object DeflateStats {

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      new GenericInternalRow(Array[Any](bytes.length.toLong, total))
    } finally d.end()
  }

  /** Column-API entry point. */
  def deflateStats(text: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      DeflateStats(org.apache.spark.sql.GraftExpressionBridge.toExpression(text)))
}
