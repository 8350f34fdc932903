package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native strided min-shingle document fingerprint: min over window positions
  * (stride chosen so ≤ `maxSamples` windows hash) of the first 48 bits of
  * sha256 of the `shingleLen`-char substring — value-identical to the Column
  * formulation in [[graft.extensions.TextAnalysis.docFingerprint]]
  * (`array_min(transform(sequence(1, n, stride), i => conv(substr(sha2(...))
  * ...)))`), which runs as an interpreted HOF materializing a position array
  * and a hex round-trip per window. One tight loop, one digest per window,
  * zero intermediate allocation.
  */
case class DocFingerprint64(child: Expression, shingleLen: Int, maxSamples: Int)
    extends UnaryExpression {
  require(shingleLen >= 1 && maxSamples >= 1)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"doc_fingerprint64 requires STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    DocFingerprint64.compute(input.asInstanceOf[UTF8String], shingleLen, maxSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DocFingerprint64.compute($c, $shingleLen, $maxSamples)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint64 =
    copy(child = newChild)

  override def prettyName: String = "doc_fingerprint64"
}

object DocFingerprint64 {

  /** Shared by interpreted eval and generated code. Mirrors the Column form
    * exactly: positions are 1-based CHARACTER offsets 1, 1+s, … ≤ n with
    * n = max(numChars − (len−1), 1) and s = ceil(n / maxSamples); each window
    * is the substring's UTF-8 bytes; the 48-bit value is the digest's first
    * 6 bytes as an unsigned big-endian integer (what conv(hex12, 16, 10)
    * yields).
    */
  def compute(text: UTF8String, shingleLen: Int, maxSamples: Int): Long = {
    val chars = text.numChars()
    val n = math.max(chars - (shingleLen - 1), 1)
    val stride = ((n + maxSamples - 1) / maxSamples).toLong.max(1L)
    // One char→byte index per document, then each sampled window is a direct
    // (offset, length) slice — vs substringSQL's walk-from-byte-0 per
    // position, O(n × samples) bytes touched on long documents.
    val bytes = text.getBytes
    val offs = Utf8CharIndex.offsetsOrNullIfAscii(bytes, chars)
    val md = MessageDigest.getInstance("SHA-256")
    val dig = new Array[Byte](32)
    var best = Long.MaxValue
    var pos = 1L
    while (pos <= n) {
      val p0 = (pos - 1).toInt
      val startChar = math.min(p0, chars)
      val endChar = math.min(p0 + shingleLen, chars)
      val s = if (offs == null) startChar else offs(startChar)
      val e = if (offs == null) endChar else offs(endChar)
      md.update(bytes, s, e - s)
      md.digest(dig, 0, 32)
      var v = 0L
      var i = 0
      while (i < 6) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      if (v < best) best = v
      pos += stride
    }
    best
  }

  /** Column-API entry point. */
  def docFingerprint64(text: Column, shingleLen: Int, maxSamples: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      DocFingerprint64(org.apache.spark.sql.GraftExpressionBridge.toExpression(text),
        shingleLen, maxSamples))
}
