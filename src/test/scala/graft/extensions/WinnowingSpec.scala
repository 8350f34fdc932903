package graft.extensions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class WinnowingSpec extends AnyFunSuite with SparkTestSession {

  /** Interpreted Column replay of the native one-pass selection. */
  private def winnowSqlReplay(k: Int, w: Int, maxGrams: Int): Column = {
    val n = s"least(length(text) - ${k - 1}, $maxGrams)"
    expr(
      s"""array_sort(array_distinct(transform(
            sequence(1, greatest($n - least($w, $n) + 1, 1)),
            s -> array_min(slice(
              transform(sequence(1, $n),
                p -> cast(conv(substr(sha2(substr(text, p, $k), 256), 1, 12), 16, 10) as bigint)),
              s, $w)))))""")
  }

  test("native selection matches the interpreted replay on corpus text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(150).filter(length(col("text")) >= 8)
    val mismatches = docs
      .select(TextAnalysis.winnowFingerprints(col("text")).as("native"),
        winnowSqlReplay(8, 4, 2048).as("replay"))
      .filter(col("native") =!= col("replay"))
      .count()
    assert(mismatches == 0)
  }

  test("shared runs of >= k+w-1 chars are guaranteed a shared fingerprint") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog near the river bank"
    val a = s"unique prefix alpha $passage unique suffix omega"
    val b = s"completely different beta text here $passage and another tail"
    val c = "no overlap with anything else in this corpus at all whatsoever"
    val out = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
      .select(col("id"), TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((out(1L) & out(2L)).nonEmpty, "copied passage must share a fingerprint")
    assert((out(1L) & out(3L)).isEmpty || (out(1L) & out(3L)).size < out(1L).size)
    // output is sorted ascending and distinct
    val raw = Seq(Tuple1(a)).toDF("text")
      .select(TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .head().getSeq[Long](0)
    assert(raw == raw.sorted && raw.distinct == raw)
  }

  test("edge cases: short docs, fewer shingles than the window") {
    import spark.implicits._
    val out = Seq((1L, ""), (2L, "abcdefg"), (3L, "abcdefgh"), (4L, "abcdefghij"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)   // < k chars → no shingles
    assert(out(3L).size == 1)                    // exactly one shingle
    assert(out(4L).size == 1)                    // 3 shingles < w → one window
  }

  test("winnowProfile: copied passages surface as n_shared, unique docs at 0") {
    import spark.implicits._
    val passage = "shared boilerplate sentence that appears verbatim in two documents"
    val df = Seq(
      (1L, s"first document body $passage trailing words one"),
      (2L, s"second body entirely other words $passage closing remarks"),
      // no 8-char substring in common with docs 1/2 (even "document" would
      // legitimately surface as a shared shingle — winnowing is that exact)
      (3L, "qwerty zxcvbn asdfgh poiuyt lkjhgf mnbvcx tyuiop ghjklz qazwsx"))
      .toDF("id", "text")
    val out = TextAnalysis.winnowProfile(df, col("id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_fp"), r.getAs[Long]("n_shared"), r.getAs[String]("fp_digest"))))
      .toMap
    assert(out(1L)._2 > 0 && out(2L)._2 > 0, "copied passage must be shared")
    assert(out(3L)._2 == 0, "unique doc must have zero shared fingerprints")
    out.values.foreach { case (nFp, nShared, dig) =>
      assert(nShared <= nFp && dig.length == 64)
    }
    // digest is a function of content only: same text → same digest
    val again = TextAnalysis.winnowProfile(df, col("id"), col("text"))
      .filter(col("id") === 1L).head().getAs[String]("fp_digest")
    assert(again == out(1L)._3)
  }
}
