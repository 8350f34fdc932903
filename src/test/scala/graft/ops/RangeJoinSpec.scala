package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("binned range join equals the raw range predicate join") {
    val rng = new scala.util.Random(3)
    val points = (1 to 300).map(i => (i.toLong, s"k${i % 3}", t(rng.nextInt(500))))
      .toDF("p_id", "k", "ts")
    val intervals = (1 to 80).map { i =>
      val s = rng.nextInt(480)
      (1000L + i, s"k${i % 3}", t(s), t(s + 1 + rng.nextInt(40)))
    }.toDF("i_id", "k", "w_start", "w_end")

    val binned = RangeJoin.pointInInterval(points, intervals, "k",
        "ts", "w_start", "w_end", binWidthMicros = 10L * 60 * 1000 * 1000)
      .select("p_id", "i_id")
    val raw = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("p_id", "i_id")

    assert(binned.count() == raw.count())
    assert(binned.exceptAll(raw).isEmpty && raw.exceptAll(binned).isEmpty)
  }

  test("edges: boundary inclusivity, empty intervals, bin-straddling") {
    val points = Seq((1L, "k", t(10)), (2L, "k", t(20)), (3L, "k", t(15)))
      .toDF("p_id", "k", "ts")
    val intervals = Seq(
      (10L, "k", t(10), t(20)), // [10,20): includes t10, excludes t20
      (11L, "k", t(14), t(16)), // straddles a 10-min bin boundary? (14→16 within; t15 in)
      (12L, "k", t(30), t(30)), // empty → matches nothing
      (13L, "k", t(25), t(24))  // inverted → matches nothing (and must not explode)
    ).toDF("i_id", "k", "w_start", "w_end")
    val out = RangeJoin.pointInInterval(points, intervals, "k",
        "ts", "w_start", "w_end", binWidthMicros = 10L * 60 * 1000 * 1000)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (3L, 10L), (3L, 11L)))
  }

  test("plan is a hash equi-join — no nested loop, no cartesian") {
    val points = spark.range(10).select(col("id").as("p_id"), lit("k").as("k"),
      col("id").cast("timestamp").as("ts"))
    val intervals = spark.range(10).select(col("id").as("i_id"), lit("k").as("k"),
      col("id").cast("timestamp").as("w_start"),
      (col("id") + 100).cast("timestamp").as("w_end"))
    val plan = RangeJoin.pointInInterval(points, intervals, "k",
        "ts", "w_start", "w_end", binWidthMicros = 1000000L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }
}
