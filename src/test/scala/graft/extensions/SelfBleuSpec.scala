package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for LanguageModel.selfBleu (x143): multi-reference clipped
  * counts via the top1/n_top/top2 trick, closest-reference length with the
  * shorter-tie, the integer diverse verdict, and the degenerate-length edges
  * — all hand-traced on a 3-document corpus.
  */
class SelfBleuSpec extends AnyFunSuite with SparkTestSession {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a b a c"),
      (2L, "a b a b"),
      (3L, "x y")
    ).toDF("doc_id", "text")
  }

  test("clipped n-gram components and geo2 — hand-traced") {
    val out = LanguageModel.selfBleu(corpus, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))

    // d1 unigrams a:2 b:1 c:1 vs max-other a:2 b:2 c:0 -> clipped 2+1+0 = 3/4
    // d1 bigrams "a b":1 "b a":1 "a c":1 vs 2,1,0 -> clipped 1+1+0 = 2/3
    val d1 = out(1L)
    assert(d1.getLong(1) == 4L && d1.getLong(2) == 4L)        // c_len, r_len
    assert(d1.getLong(3) == 3L && d1.getLong(4) == 4L)        // p1
    assert(d1.getLong(5) == 2L && d1.getLong(6) == 3L)        // p2
    // geo2 = sqrt((3*2)/(4*3)) = sqrt(.5) -> 707107; 0.707 > 0.3 -> not diverse
    assert(d1.getLong(7) == 707107L)
    assert(!d1.getBoolean(8) && !d1.getBoolean(9))            // len_pen, diverse

    // d2: unigram b own=2 IS the top with n_top=1 -> clips at runner-up 1
    val d2 = out(2L)
    assert(d2.getLong(3) == 3L && d2.getLong(4) == 4L)
    assert(d2.getLong(5) == 2L && d2.getLong(6) == 3L)

    // d3 shares no gram: p1 0/2, p2 0/1, geo2 0, diverse, len-penalized (2 < 4)
    val d3 = out(3L)
    assert(d3.getLong(3) == 0L && d3.getLong(4) == 2L)
    assert(d3.getLong(5) == 0L && d3.getLong(6) == 1L)
    assert(d3.getLong(7) == 0L && d3.getBoolean(8) && d3.getBoolean(9))
  }

  test("closest reference length ties break to the SHORTER reference") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b"), (3L, "a b c d")) // lens 3,2,4
      .toDF("doc_id", "text")
    val out = LanguageModel.selfBleu(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 2L)   // |2-3| == |4-3| -> shorter wins
    assert(out(2L) == 3L)
    assert(out(3L) == 3L)
  }

  test("diverse verdict is STRICT at the threshold: geo2 == t excluded") {
    import spark.implicits._
    // two identical docs: p1 = p2 = 1, geo2 = 1000000. At threshold 1000‰
    // the cross-multiplication sits at exact equality — strict < must say
    // NOT diverse (the x101 boundary lesson on this operator's verdict).
    val df = Seq((1L, "a b a"), (2L, "a b a")).toDF("doc_id", "text")
    val out = LanguageModel.selfBleu(df, col("doc_id"), col("text"),
      diverseThresholdPermille = 1000).collect()
    assert(out.forall(r => r.getLong(7) == 1000000L && !r.getBoolean(9)))
  }

  test("single-token and empty documents are diverse by convention") {
    import spark.implicits._
    val df = Seq((1L, "z"), (2L, "  "), (3L, "z z")).toDF("doc_id", "text")
    val out = LanguageModel.selfBleu(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(6) == 0L && out(1L).getBoolean(9)) // no bigram
    assert(out(2L).getLong(4) == 0L && out(2L).getBoolean(9)) // no token
    // d3 has bigram "z z" but no other doc carries it -> p2 0/1, diverse
    assert(out(3L).getLong(5) == 0L && out(3L).getBoolean(9))
    assert(out(1L).getLong(7) == 0L)
  }
}
