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
}
