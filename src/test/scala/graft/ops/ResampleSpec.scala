package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ResampleSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // key "a": hours 00, 01, 04 — gaps at 02, 03
    ("a", ts("2024-01-01 00:10:00"), 10.0),
    ("a", ts("2024-01-01 00:50:00"), 20.0),
    ("a", ts("2024-01-01 01:30:00"), 30.0),
    ("a", ts("2024-01-01 04:00:00"), 40.0),
    // key "b": single hour — no gaps, grid of one
    ("b", ts("2024-01-01 12:59:59"), 7.0)
  ).toDF("k", "t", "v")

  test("gapFill manufactures every missing grid cell and forward-fills it") {
    val out = Resample.gapFill(events, col("k"), col("t"), col("v"), "hour")
      .orderBy("key", "bucket").collect()
    assert(out.length == 6) // a: 5 hourly cells, b: 1
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L, 0L, 1L))
    assert(a.map(_.getBoolean(5)).toSeq == Seq(false, false, true, true, false))
    // v_ffill carries the last non-gap mean across the gap
    assert(a.map(_.getDouble(4)).toSeq == Seq(15.0, 30.0, 30.0, 30.0, 40.0))
    // real cells keep their own mean; gap cells have null v_avg
    assert(a(2).isNullAt(3) && a(3).isNullAt(3))
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b(0).getLong(2) == 1L && !b(0).getBoolean(5))
  }

  test("gapFill at day grain: one row per day, count preserved") {
    val out = Resample.gapFill(events, col("k"), col("t"), col("v"), "day")
    assert(out.count() == 2) // one day per key
    assert(out.agg(sum("n")).as[Long].head() == events.count())
  }

  test("gapFill rejects unsupported grid units") {
    intercept[IllegalArgumentException] {
      Resample.gapFill(events, col("k"), col("t"), col("v"), "fortnight")
    }
  }
}
