package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for LanguageModel.unigramTrain (x148): one hand-traced EM
  * round (usage from the all-optimal-paths membership test, the multi-piece
  * prune, the char floor, the re-score), and the fixed point the second
  * round reaches on this corpus.
  */
class UnigramTrainSpec extends AnyFunSuite with SparkTestSession {

  private def corpus = {
    import spark.implicits._
    Seq((1L, "abab abab cd"), (2L, "abab cd cd")).toDF("doc_id", "text")
  }

  private def trained = LanguageModel.unigramTrain(corpus, col("text"),
    vocabSize = 6, maxPieceLen = 4, minCount = 2L, rounds = 2)

  test("round 1 — usage, prune, char floor, re-score: hand-traced") {
    val r1 = trained.filter(col("round") === 1L)
      .collect().map(r => r.getString(1) -> r).toMap
    // abab's unique optimum is ab|ab; cd's is c|d. Usage: ab=2·3, c=d=3.
    // aba never sits on an optimal path -> pruned. a,b floored to 1.
    assert(r1.keySet == Set("a", "b", "c", "d", "ab"))
    assert(r1("ab").getLong(3) == 6L)
    assert(r1("c").getLong(3) == 3L && r1("d").getLong(3) == 3L)
    assert(r1("a").getLong(3) == 1L && r1("b").getLong(3) == 1L)
    // total 14: ln(6/14), ln(3/14), ln(1/14)
    assert(r1("ab").getLong(4) == -847298L)
    assert(r1("c").getLong(4) == -1540445L)
    assert(r1("a").getLong(4) == -2639057L)
    assert(r1("a").getBoolean(5) && !r1("ab").getBoolean(5))
  }

  test("round 2 is a fixed point on this corpus") {
    val rows = trained.filter(col("round") >= 1L)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val r1 = rows.collect { case ((1L, p), v) => p -> v }
    val r2 = rows.collect { case ((2L, p), v) => p -> v }
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("round 0 is exactly the seed vocabulary") {
    val seed = LanguageModel.unigramSeedVocab(corpus, col("text"),
        vocabSize = 6, maxPieceLen = 4, minCount = 2L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val r0 = trained.filter(col("round") === 0L)
      .collect().map(r => r.getString(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(r0 == seed)
  }
}
