package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Interval-union coverage: overlap merge, components, degenerate and
  * invalid intervals, tie-order invariance.
  */
class IntervalsSpec extends AnyFunSuite with SparkTestSession {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("overlaps merge, gaps split components, invalid rows excluded") {
    import spark.implicits._
    // key a: [0,10] ∪ [5,15] ∪ [20,25] -> covered 20 s, 2 components
    // key b: [0,0] degenerate + [2,1] invalid -> 1 interval, 0 covered
    val df = Seq(("a", t(0), t(10)), ("a", t(5), t(15)), ("a", t(20), t(25)),
      ("b", t(0), t(0)), ("b", t(2), t(1)),
      ("c", null.asInstanceOf[Timestamp], t(9))).toDF("k", "s", "e")
    val out = Intervals.unionLength(df, col("k"), col("s"), col("e"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((3L, 20000000L, 2L)))
    assert(out("b") == ((1L, 0L, 1L)))
    assert(!out.contains("c")) // null bound: no extent
  }

  test("containment and same-start ties: union is order-invariant") {
    import spark.implicits._
    // [0,5] contains [1,2] and ties [0,3]: union = 5 s, one component
    val df = Seq(("k", t(0), t(5)), ("k", t(1), t(2)), ("k", t(0), t(3)))
      .toDF("k", "s", "e")
    val out = Intervals.unionLength(df, col("k"), col("s"), col("e"))
      .collect()(0)
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((3L, 5000000L, 1L)))
  }
}
