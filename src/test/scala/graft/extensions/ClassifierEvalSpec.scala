package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for Classify.classifierEval (x151): a hand-traced 3-class
  * confusion matrix, the NULL conventions (no-prediction precision,
  * no-truth recall, unlabeled rows), and macro-F1 from integer counts.
  */
class ClassifierEvalSpec extends AnyFunSuite with SparkTestSession {

  test("3-class confusion, P/R/F1, accuracy, macro-F1 — hand-traced") {
    import spark.implicits._
    val df = Seq[(String, String)](
      ("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"),
      ("c", "a"), (null, "a")).toDF("t", "p")
    val out = Classify.classifierEval(df, col("t"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c"))
    val a = out("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ==
      ((3L, 2L, 2L, 1L)))
    assert(a.getLong(5) == 500000L && a.getLong(6) == 666667L)
    assert(a.getLong(7) == 571429L)                    // 4/7 from counts
    val c = out("c")
    assert(c.isNullAt(5) && c.getLong(6) == 0L && c.getLong(7) == 0L)
    // every row repeats the corpus stats
    assert(a.getLong(8) == 1L)                         // one NULL-truth row
    assert(a.getLong(9) == 500000L)                    // 3/6 accuracy
    assert(a.getLong(10) == 357143L)                   // (571429+500000+0)/3
    assert(out("b").getLong(10) == 357143L)
  }

  test("a predicted-only class gets support 0 and NULL recall") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "d")).toDF("t", "p")
    val out = Classify.classifierEval(df, col("t"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    val d = out("d")
    assert(d.getLong(1) == 0L && d.getLong(3) == 1L && d.getLong(4) == 0L)
    assert(d.getLong(5) == 0L && d.isNullAt(6) && d.getLong(7) == 0L)
  }

  test("marginReliability: bands, per-band + cumulative accuracy — hand-traced") {
    import spark.implicits._
    val df = Seq[(String, String, java.lang.Long)](
      ("a", "a", 5L), ("a", "b", 7L),                 // band 0: 1/2
      ("b", "b", 15L),                                // band 1: 1/1
      ("c", "c", 25L), ("c", "b", 29L),               // band 2: 1/2
      (null, "a", 50L), ("a", null, 50L), ("a", "a", null)) // all excluded
      .toDF("t", "p", "m")
    val out = Classify.marginReliability(df, col("t"), col("p"), col("m"),
        bandMicro = 10L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    // (band, lo, n, n_correct, acc, mean, cum_n, cum_correct, cum_acc)
    val b0 = out(0L)
    assert((b0.getLong(1), b0.getLong(2), b0.getLong(3)) == ((0L, 2L, 1L)))
    assert(b0.getLong(4) == 500000L && b0.getLong(5) == 6L)   // mean (5+7)/2
    assert((b0.getLong(6), b0.getLong(7)) == ((5L, 3L)))      // cum over all
    assert(b0.getLong(8) == 600000L)                          // 3/5
    val b1 = out(1L)
    assert(b1.getLong(1) == 10L && b1.getLong(4) == 1000000L &&
      b1.getLong(5) == 15L)
    assert((b1.getLong(6), b1.getLong(7), b1.getLong(8)) ==
      ((3L, 2L, 666667L)))                                    // bands 2+1
    val b2 = out(2L)
    assert(b2.getLong(1) == 20L && b2.getLong(4) == 500000L &&
      b2.getLong(5) == 27L)                                   // (25+29)/2
    assert((b2.getLong(6), b2.getLong(7), b2.getLong(8)) ==
      ((2L, 1L, 500000L)))                                    // top band alone
  }
}
