package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Shared scan support for the shingle-hashing native expressions
  * ([[DocFingerprint64]], [[WinnowFingerprints]]).
  *
  * `UTF8String.substringSQL(pos, len)` locates a CHARACTER offset by walking
  * the UTF-8 lead bytes from byte 0 — calling it once per shingle position
  * makes a doc-length-n scan cost O(n²) bytes touched per document, which is
  * exactly the heap/CPU pressure the sf3 probe surfaced on x10/x84 (38×/53×
  * for 30× data). Building the char→byte offset index ONCE per document
  * restores O(n): each shingle is then a direct `(offset, length)` slice of
  * the document's byte array, fed to the digest without materializing a
  * substring object per position.
  */
private[functions] object Utf8CharIndex {

  /** Byte offset of each character position `0..numChars` (length
    * `numChars + 1`, last entry = total byte length), or `null` when the
    * string is pure ASCII and offsets are the identity — the common corpus
    * case, which then allocates nothing beyond the byte array itself.
    */
  def offsetsOrNullIfAscii(bytes: Array[Byte], numChars: Int): Array[Int] = {
    if (bytes.length == numChars) return null
    val offs = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(numChars) = bytes.length
    offs
  }
}
