package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for Classify.nbTrain / nbClassify (x149/x150): hand-traced
  * Laplace-smoothed model rows, the sparse-model scoring identity (matched /
  * label-unseen / out-of-vocabulary / token-less), margins, and tie-breaks.
  */
class ClassifySpec extends AnyFunSuite with SparkTestSession {

  private def train = {
    import spark.implicits._
    Seq((1L, "en", "the cat"), (2L, "en", "the dog"), (3L, "de", "der hund"))
      .toDF("doc_id", "lang", "text")
  }

  test("model rows: priors, smoothed terms, unseen — hand-traced") {
    val m = Classify.nbTrain(train, col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)).getOrElse("")) -> r).toMap
    // V=5, en tot=4, de tot=2, nDocs=3
    assert(m(("prior", "en", "")).getLong(4) == -405465L)   // ln(2/3)
    assert(m(("prior", "de", "")).getLong(4) == -1098612L)  // ln(1/3)
    assert(m(("term", "en", "the")).getLong(4) == -1098612L) // ln(3/9)
    assert(m(("term", "en", "cat")).getLong(4) == -1504077L) // ln(2/9)
    assert(m(("term", "de", "der")).getLong(4) == -1252763L) // ln(2/7)
    assert(m(("unseen", "en", "")).getLong(4) == -2197225L)  // ln(1/9)
    assert(m(("unseen", "de", "")).getLong(4) == -1945910L)  // ln(1/7)
    assert(m(("term", "en", "the")).getLong(3) == 2L)
    assert(m.size == 2 + 5 + 2)  // 2 priors + 5 term rows + 2 unseen
  }

  test("scoring: matched, OOV, token-less — hand-traced scores and margins") {
    import spark.implicits._
    val model = Classify.nbTrain(train, col("lang"), col("text"))
    val out = Classify.nbClassify(
        Seq((10L, "the cat"), (11L, "zzz"), (12L, ""), (13L, "der hund"))
          .toDF("doc_id", "text"), col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = out(10L) // en: -405465-1098612-1504077; de: -1098612+2·(-1945910)
    assert(a.getString(2) == "en" && a.getLong(3) == -3008154L)
    assert(a.getString(4) == "de" && a.getLong(5) == 1982278L)
    val b = out(11L) // OOV token scores unseen under BOTH labels
    assert(b.getString(2) == "en" && b.getLong(3) == -2602690L)
    assert(b.getLong(5) == 441832L)
    val c = out(12L) // no tokens: priors only
    assert(c.getLong(1) == 0L && c.getString(2) == "en")
    assert(c.getLong(3) == -405465L && c.getLong(5) == 693147L)
    val d = out(13L)
    assert(d.getString(2) == "de" && d.getLong(3) == -3604138L)
  }

  test("exact score tie breaks to the smallest label; single label -> null runner") {
    import spark.implicits._
    val sym = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("doc_id", "lang", "text")
    val t = Classify.nbClassify(Seq((9L, "x")).toDF("doc_id", "text"),
      col("doc_id"), col("text"),
      Classify.nbTrain(sym, col("lang"), col("text"))).collect()(0)
    assert(t.getString(2) == "a" && t.getLong(5) == 0L)
    val solo = Classify.nbClassify(Seq((9L, "x")).toDF("doc_id", "text"),
      col("doc_id"), col("text"),
      Classify.nbTrain(sym.filter(col("lang") === "a"), col("lang"),
        col("text"))).collect()(0)
    assert(solo.getString(2) == "a" && solo.isNullAt(4) && solo.isNullAt(5))
  }

  test("r18: marginReliability's global window input is the band enum, " +
      "bounded by the margin domain — never corpus rows") {
    // 10k input rows, margins spread over [0, 1e6) micro, bandMicro 250k →
    // the cumulative Window.orderBy runs over ≤ 5 post-aggregate band rows
    // no matter how large the corpus is (the r17 VERDICT #6 pin: the one
    // global window in Classify is safe BECAUSE its input cardinality is a
    // function of the margin VALUE DOMAIN, not of the row count).
    val df = spark.range(10000).selectExpr(
      "id % 2 = 0 as t", "true as p", "(id * 37) % 1000000 as m")
    val out = Classify.marginReliability(df, col("t"), col("p"), col("m"),
      bandMicro = 250000L)
    assert(out.count() <= 5, "band enum exceeded the domain bound")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.indexOf("Window") >= 0 &&
      plan.indexOf("Window") < plan.indexOf("HashAggregate"),
      "the cumulative window must sit ABOVE the band aggregate")
  }
}
