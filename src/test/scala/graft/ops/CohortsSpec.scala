package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CohortsSpec extends AnyFunSuite with SparkTestSession {

  private val Day = 86400L

  test("cohort assignment, offsets, sizes, and rates are exact") {
    import spark.implicits._
    // users 1,2 first active day 0; user 3 first active day 1.
    // user 1 returns day 1 and (twice) day 3; user 2 never returns.
    val df = Seq(
      (1L, 10L), (1L, 20L), (2L, 30L),                 // day 0
      (1L, Day + 5L), (3L, Day + 6L),                  // day 1
      (1L, 3 * Day + 1L), (1L, 3 * Day + 2L),          // day 3 ×2 events
      (3L, 2 * Day + 9L))                              // day 2
      .toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = Cohorts.retention(df, col("user_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // ts epoch day 0 is 1970-01-01 → cohort_day is the raw epoch day
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)))    // users 1,2 on their day 0
    assert(out((0L, 1L)) == ((1L, 2L, 0.5)))    // user 1 back on day 1
    assert(out((0L, 3L)) == ((1L, 2L, 0.5)))    // day-3 multiplicity collapsed
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))    // user 3's own cohort
    assert(out((1L, 1L)) == ((1L, 1L, 1.0)))    // user 3 back next day
    assert(out.size == 5)                        // no empty cells emitted
  }

  test("within-day event multiplicity never inflates counts") {
    import spark.implicits._
    val df = (1 to 100).map(i => (7L, (i % 5).toLong * 3600))
      .toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = Cohorts.retention(df, col("user_id"), col("ts")).collect()
    assert(out.length == 1 && out.head.getLong(2) == 1)
  }
}
