package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for LanguageModel.unigramSeedVocab / unigramViterbiProfile
  * (x146/x147): hand-traced inventory counts and scores, the Viterbi lattice
  * on known pieces, the score-tie → fewer-pieces rule, and the long-word /
  * unsegmentable-word contract edges.
  */
class UnigramTokenizerSpec extends AnyFunSuite with SparkTestSession {

  private def corpus = {
    import spark.implicits._
    Seq((1L, "abab abab cd"), (2L, "abab cd cd")).toDF("doc_id", "text")
  }

  test("seed vocabulary: counts, budget, and ln scores — hand-traced") {
    val v = LanguageModel.unigramSeedVocab(corpus, col("text"),
        vocabSize = 6, maxPieceLen = 4, minCount = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    // chars a,b,c,d always kept; budget 2 multi: ab (cnt 6), then the cnt-3
    // group breaks asc -> aba. cd (cnt 3) loses to aba alphabetically.
    assert(v.keySet == Set("a", "b", "c", "d", "ab", "aba"))
    assert(v("ab").getLong(2) == 6L && !v("ab").getBoolean(4))
    assert(v("a").getLong(2) == 6L && v("a").getBoolean(4))
    // total kept = 6+6+3+3+6+3 = 27; ln(6/27) -> -1504077, ln(3/27) -> -2197225
    assert(v("ab").getLong(3) == -1504077L)
    assert(v("aba").getLong(3) == -2197225L)
    assert(v("c").getLong(3) == -2197225L)
    assert(v("ab").getLong(1) == 2L)
  }

  test("viterbi profile on the seed pieces — hand-traced totals") {
    val pieces = LanguageModel.unigramSeedVocab(corpus, col("text"),
      vocabSize = 6, maxPieceLen = 4, minCount = 2L)
    val out = LanguageModel.unigramViterbiProfile(corpus, col("doc_id"),
        col("text"), pieces)
      .collect().map(r => r.getLong(0) -> r).toMap
    // abab -> ab|ab (2 pieces, -3008154); cd -> c|d (2 pieces, -4394450)
    val d1 = out(1L)
    assert(d1.getLong(1) == 3L && d1.getLong(2) == 0L && d1.getLong(3) == 0L)
    assert(d1.getLong(4) == 6L)
    assert(d1.getLong(5) == 2L * -3008154L + -4394450L)
    assert(out(2L).getLong(5) == -3008154L + 2L * -4394450L)
  }

  test("score tie breaks to FEWER pieces") {
    import spark.implicits._
    val pieces = Seq(("x", -100L), ("y", -100L), ("xy", -200L))
      .toDF("piece", "score_micro")
    val out = LanguageModel.unigramViterbiProfile(
        Seq((1L, "xy")).toDF("doc_id", "text"), col("doc_id"), col("text"),
        pieces)
      .collect()(0)
    assert(out.getLong(4) == 1L && out.getLong(5) == -200L)
  }

  test("long words and uncoverable words are counted, never dropped") {
    import spark.implicits._
    val pieces = Seq(("a", -10L), ("b", -20L), ("c", -30L), ("d", -40L))
      .toDF("piece", "score_micro")
    val out = LanguageModel.unigramViterbiProfile(
        Seq((1L, "abcd ab zq"), (2L, "")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), pieces, maxWordLen = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(1) == 3L)             // all words counted
    assert(d1.getLong(2) == 1L)             // abcd exceeds maxWordLen=3
    assert(d1.getLong(3) == 1L)             // zq: z,q not in the piece table
    assert(d1.getLong(4) == 2L)             // only ab segmented
    assert(d1.getLong(5) == -30L)
    val d2 = out(2L)
    assert(d2.getLong(1) == 0L && d2.isNullAt(4) && d2.isNullAt(5))
  }
}
