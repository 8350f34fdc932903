package graft.extensions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.ExtensionQueries

/** Regression suite for the brute-force fixture cache key (round-13
  * advisory): the corpus fingerprint must be sensitive to the exact edits
  * a pure bit_xor key is blind to — duplicated rows (XOR self-cancels) —
  * and must fail loudly, not NPE, on an empty corpus.
  */
class FingerprintSpec extends AnyFunSuite with SparkTestSession {

  private def corpus(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val base = Seq(
    1L -> Seq(0.1f, 0.2f), 2L -> Seq(0.3f, 0.4f), 3L -> Seq(0.5f, 0.6f))

  test("duplicating a row changes the fingerprint (XOR alone self-cancels)") {
    val fp0 = ExtensionQueries.corpusFingerprint(corpus(base))
    // an exact duplicate pair XORs to zero contribution — the old key was
    // IDENTICAL here, silently serving stale ground truth
    val fpDup = ExtensionQueries.corpusFingerprint(corpus(base ++ Seq(base.head, base.head)))
    assert(fp0 !== fpDup)
    // and the degenerate single-duplicate case too
    val fpDup1 = ExtensionQueries.corpusFingerprint(corpus(base :+ base.head))
    assert(fp0 !== fpDup1)
  }

  test("content and order sensitivity") {
    val fp0 = ExtensionQueries.corpusFingerprint(corpus(base))
    val changed = base.updated(1, 2L -> Seq(0.3f, 0.41f))
    assert(fp0 !== ExtensionQueries.corpusFingerprint(corpus(changed)))
    // order-insensitive by design (parquet read order is not deterministic):
    // a permuted corpus is the SAME corpus
    assert(fp0 === ExtensionQueries.corpusFingerprint(corpus(base.reverse)))
  }

  test("empty corpus fails with the actual cause, not an NPE") {
    val e = intercept[IllegalArgumentException] {
      ExtensionQueries.corpusFingerprint(corpus(Seq.empty))
    }
    assert(e.getMessage.contains("EMPTY"))
  }
}
