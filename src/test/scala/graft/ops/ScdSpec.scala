package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ScdSpec extends AnyFunSuite with SparkTestSession {

  private def events(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "sec", "event_id", "status")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  test("consecutive equal values collapse into validity intervals") {
    val df = events(
      (1L, 0L, 1L, "new"), (1L, 10L, 2L, "new"), (1L, 20L, 3L, "active"),
      (1L, 30L, 4L, "active"), (1L, 40L, 5L, "new"),
      (2L, 5L, 6L, "active"))
    val out = Scd.runCompact(df, col("user_id"), col("ts"), col("event_id"),
        col("status"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.size == 4) // user 1: new/active/new; user 2: active
    val r11 = out((1L, 1L))
    assert(r11.getString(2) == "new" && r11.getLong(3) == 0L &&
      r11.getLong(4) == 20000000L && r11.getLong(5) == 2 && !r11.getBoolean(6))
    val r12 = out((1L, 2L))
    assert(r12.getString(2) == "active" && r12.getLong(3) == 20000000L &&
      r12.getLong(4) == 40000000L && r12.getLong(5) == 2)
    val r13 = out((1L, 3L)) // re-entering a past value starts a NEW run
    assert(r13.getString(2) == "new" && r13.getLong(3) == 40000000L &&
      r13.getLong(4) == Scd.OpenEndUs && r13.getBoolean(6))
    assert(out((2L, 1L)).getBoolean(6))
  }

  test("nullable attribute breaks runs null-safely (no first-row confusion)") {
    val df = events((1L, 0L, 1L, "a"), (1L, 10L, 2L, "a"))
      .union(events((1L, 20L, 3L, "x"), (1L, 30L, 4L, "x"))
        .withColumn("status", lit(null: String)))
      .union(events((1L, 40L, 5L, "a")))
    val out = Scd.runCompact(df, col("user_id"), col("ts"), col("event_id"),
        col("status"))
      .orderBy("run_idx").collect()
    assert(out.length == 3)
    assert(out(0).getString(2) == "a" && out(0).getLong(5) == 2)
    assert(out(1).isNullAt(2) && out(1).getLong(5) == 2) // null run is one run
    assert(out(2).getString(2) == "a" && out(2).getBoolean(6))
  }

  test("intervals tile: each run closes at the next run's start; rows conserve") {
    val base = (1 to 400).map { i =>
      (i % 5L, i.toLong * 7, i.toLong, s"s${(i / 13) % 3}")
    }
    val out = Scd.runCompact(events(base: _*), col("user_id"), col("ts"),
      col("event_id"), col("status")).cache()
    try {
    // tiling: lead(valid_from) over run order equals valid_to (except last)
    val bad = out.withColumn("__next", lead(col("valid_from_us"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy("run_idx")))
      .filter(col("__next").isNotNull && col("__next") =!= col("valid_to_us"))
    assert(bad.count() == 0)
    // exactly one current run per key; open-end sentinel on it
    val cur = out.filter(col("is_current")).groupBy("key").count()
      .collect().map(_.getLong(1)).toSet
    assert(cur == Set(1L))
    assert(out.filter(col("is_current") =!=
      (col("valid_to_us") === Scd.OpenEndUs)).count() == 0)
    // conservation: run n_rows sums to the input count per key
    val n = out.groupBy("key").agg(sum("n_rows")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == base.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
    } finally out.unpersist() // shared session: CacheHygieneSpec audits leaks
  }

  test("result is independent of input partitioning and row order") {
    val base = (1 to 300).map { i =>
      (i % 4L, i.toLong * 11, i.toLong, s"s${(i * i) % 4}")
    }
    val a = Scd.runCompact(events(base: _*), col("user_id"), col("ts"),
      col("event_id"), col("status"))
    val b = Scd.runCompact(events(scala.util.Random.shuffle(base): _*)
        .repartition(13), col("user_id"), col("ts"),
      col("event_id"), col("status"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
