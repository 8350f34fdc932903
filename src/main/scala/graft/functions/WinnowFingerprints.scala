package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS scheme): hash every `k`-char shingle (first 48 bits of sha256,
  * the engine-reproducible choice [[DocFingerprint64]] established), then
  * keep the minimum of every `w`-wide window of consecutive shingle hashes.
  * Guarantees every shared substring of length ≥ `k + w − 1` contributes at
  * least one common fingerprint — the local-sampling property plain
  * min-sampling lacks — which makes the output directly joinable for
  * plagiarism-style overlap detection.
  *
  * Output: the DISTINCT selected hash values, sorted ascending
  * (`ARRAY<LONG>`, each in [0, 2^48)). Because only values (not positions)
  * are emitted, window-minimum tie-breaking cannot affect the result.
  *
  * Value-identical to the interpreted Column form
  * `array_sort(array_distinct(transform(sequence(1, n−w+1), s ->
  * array_min(slice(vals, s, w)))))` over
  * `vals = transform(sequence(1, n), p -> conv(substr(sha2(substr(text, p,
  * k), 256), 1, 12), 16, 10))` — which materializes a position array, a
  * doc-sized hash array, and a hex round-trip per shingle, all interpreted.
  * This loop is one pass with a monotone deque: one digest per shingle,
  * O(n) total minima work, one output allocation.
  *
  * `maxGrams` bounds per-row work on megabyte documents (the
  * [[DocFingerprint64]] concern): only the first `maxGrams` shingle
  * positions participate. Docs shorter than `k` chars yield an empty array.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, maxGrams: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle length must be >= 1, got $k")
  require(w >= 1, s"window width must be >= 1, got $w")
  require(maxGrams >= 1 && maxGrams <= 65536,
    s"maxGrams must be in [1, 65536], got $maxGrams")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints requires STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w, maxGrams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprints.compute($c, $k, $w, $maxGrams)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {

  /** Shared by interpreted eval and generated code. Positions are 1-based
    * CHARACTER offsets; n = min(numChars − k + 1, maxGrams) shingles (none
    * when numChars < k); windows are the n − min(w, n) + 1 FULL w-wide
    * spans (a doc with fewer than `w` shingles gets one window covering
    * them all).
    */
  def compute(text: UTF8String, k: Int, w: Int, maxGrams: Int): ArrayData = {
    val chars = text.numChars()
    val n = math.min(chars - (k - 1), maxGrams)
    if (n < 1) return new GenericArrayData(Array.emptyLongArray)
    // One char→byte index per document; each shingle is then a direct
    // (offset, length) slice of the byte array — vs substringSQL's
    // walk-from-byte-0 per position, which made long docs O(n²).
    val bytes = text.getBytes
    val offs = Utf8CharIndex.offsetsOrNullIfAscii(bytes, chars)
    val md = MessageDigest.getInstance("SHA-256")
    val dig = new Array[Byte](32)
    val vals = new Array[Long](n)
    var p = 0
    while (p < n) {
      val s = if (offs == null) p else offs(p)
      val endChar = math.min(p + k, chars)
      val e = if (offs == null) endChar else offs(endChar)
      md.update(bytes, s, e - s)
      md.digest(dig, 0, 32)
      var v = 0L
      var i = 0
      while (i < 6) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      vals(p) = v
      p += 1
    }
    val ww = math.min(w, n)
    // monotone deque of positions; front is the current window's minimum.
    // Minima are collected into a primitive array (adjacent-dup skipped —
    // the same minimum usually survives many consecutive windows), then
    // sorted + deduped: no boxed TreeSet churn on the hot path.
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    val mins = new Array[Long](n - ww + 1)
    var m = 0
    var i = 0
    while (i < n) {
      while (tail > head && vals(deque(tail - 1)) > vals(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - ww) head += 1
      if (i >= ww - 1) {
        val v = vals(deque(head))
        if (m == 0 || mins(m - 1) != v) { mins(m) = v; m += 1 }
      }
      i += 1
    }
    java.util.Arrays.sort(mins, 0, m)
    var outN = 0
    var j = 0
    while (j < m) {
      if (outN == 0 || mins(outN - 1) != mins(j)) { mins(outN) = mins(j); outN += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, outN))
  }

  /** Column-API entry point. */
  def winnowFingerprints(text: Column, k: Int, w: Int, maxGrams: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(
      WinnowFingerprints(org.apache.spark.sql.GraftExpressionBridge.toExpression(text),
        k, w, maxGrams))
}
