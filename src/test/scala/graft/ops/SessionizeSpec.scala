package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SessionizeSpec extends AnyFunSuite with SparkTestSession {

  private def events(rows: (Long, Long, Long, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "sec", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  test("gap splits sessions; idx, bounds, duration, composition are exact") {
    val df = events(
      (1L, 0L, 1L, "view", 1.0), (1L, 100L, 2L, "click", 2.0),
      (1L, 4000L, 3L, "view", 4.0),          // 3900 s gap > 1800 → new session
      (2L, 50L, 4L, "buy", 8.0))
    val out = Sessionize.sessions(df, col("user_id"), col("ts"), col("event_id"),
        gapSeconds = 1800L, col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.size == 3)
    val s11 = out((1L, 1L))
    assert(s11.getLong(2) == 2 && s11.getLong(3) == 0L && s11.getLong(4) == 100000000L)
    assert(s11.getLong(5) == 100 && s11.getLong(6) == 2 && s11.getDouble(7) == 3.0)
    val s12 = out((1L, 2L))
    assert(s12.getLong(2) == 1 && s12.getLong(5) == 0 && s12.getLong(6) == 1)
    assert(out((2L, 1L)).getLong(2) == 1)
  }

  test("boundary: a gap of exactly gapSeconds stays in the session") {
    val df = events(
      (1L, 0L, 1L, "a", 0.0), (1L, 1800L, 2L, "a", 0.0), (1L, 3601L, 3L, "a", 0.0))
    val out = Sessionize.sessions(df, col("user_id"), col("ts"), col("event_id"),
        gapSeconds = 1800L, col("event_type"), col("value"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // 0→1800 is ≤ gap (same session); 1800→3601 is 1801 s (new session)
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("result is independent of input partitioning and row order") {
    val base = (1 to 500).map { i =>
      (i % 7L, (i * 997 % 10000).toLong, i.toLong, s"t${i % 3}", i / 10.0)
    }
    val a = Sessionize.sessions(events(base: _*), col("user_id"), col("ts"),
      col("event_id"), 600L, col("event_type"), col("value"))
    val b = Sessionize.sessions(events(scala.util.Random.shuffle(base): _*)
        .repartition(13), col("user_id"), col("ts"),
      col("event_id"), 600L, col("event_type"), col("value"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // sessions partition the events: per-user n_events sums to input count
    val n = a.groupBy("key").agg(sum("n_events")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val in = events(base: _*).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == in)
  }
}
