package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FunnelSpec extends AnyFunSuite with SparkTestSession {

  private def events(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, sec, et), i) => (u, sec, i.toLong, et) }
      .toDF("user_id", "sec", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  private def run(df: org.apache.spark.sql.DataFrame,
      horizon: Option[Long] = None) =
    Funnel.funnel(df, col("user_id"), col("ts"), col("event_type"),
        Seq("a", "b", "c"), horizon)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("steps_completed")),
          r.getBoolean(r.fieldIndex("completed")))).toMap

  test("greedy-earliest ordering: steps must be strictly increasing in time") {
    val df = events(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),   // full funnel
      (2L, 10L, "a"), (2L, 5L, "b"), (2L, 30L, "c"),    // b BEFORE a → stalls at a... but c after a?
      (3L, 10L, "b"), (3L, 20L, "c"),                   // never enters (no a)
      (4L, 10L, "a"), (4L, 20L, "b"))                   // stalls after b
    val out = run(df)
    assert(out(1L) == ((3L, true)))
    // user 2: b at t=5 precedes a at t=10 → no b after a → completed 1
    assert(out(2L) == ((1L, false)))
    assert(!out.contains(3L)) // no step-1 event → not in the funnel population
    assert(out(4L) == ((2L, false)))
  }

  test("greedy-earliest is well-defined with repeats: earliest valid match wins") {
    // a@10; b@15 and b@40; c@20. Greedy takes b@15 → c@20 completes.
    // (Matching b@40 instead would miss c — greedy-earliest must not.)
    val df = events((1L, 10L, "a"), (1L, 15L, "b"), (1L, 40L, "b"), (1L, 20L, "c"))
    assert(run(df)(1L) == ((3L, true)))
  }

  test("horizon bounds the WHOLE funnel from t1") {
    val df = events(
      (1L, 0L, "a"), (1L, 50L, "b"), (1L, 99L, "c"),    // all inside 100 s
      (2L, 0L, "a"), (2L, 50L, "b"), (2L, 150L, "c"))   // c outside
    val out = run(df, horizon = Some(100L))
    assert(out(1L) == ((3L, true)))
    assert(out(2L) == ((2L, false)))
  }

  test("same-timestamp events do not satisfy the STRICTLY-after rule") {
    val df = events((1L, 10L, "a"), (1L, 10L, "b"), (1L, 20L, "b"))
    assert(run(df)(1L)._1 == 2L) // b@10 rejected, b@20 matches
  }
}
