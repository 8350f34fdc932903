package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: keys are cohorted by their FIRST
  * active day, and the matrix cell (cohort_day, day_offset) counts how many
  * of that cohort's keys were active again `day_offset` days later — the
  * standard retention triangle, and (read along a row) the survival curve of
  * each acquisition day.
  *
  * All time arithmetic is integer epoch-DAYS (`epoch_µs div 86 400·10⁶`,
  * floor — UTC day buckets, no calendar/timezone functions to disagree
  * across engines).
  *
  * Scale shape: the (key, day) activity relation is DISTINCT-ed first (the
  * smallest faithful representation — event multiplicity within a day is
  * irrelevant to retention), cohorts are one min-aggregate on the key, the
  * cohort tag joins shuffle_hash on the key (key-scale, stat-less), and the
  * matrix is one count-distinct aggregate whose output is
  * days × max-offset — dashboard-scale. No window, nothing quadratic.
  */
object Cohorts {

  private val UsPerDay = 86400L * 1000000L

  /** One row per non-empty (cohort_day, day_offset) cell: `n_users` distinct
    * keys from cohort `cohort_day` active exactly `day_offset` days after
    * their first day. `day_offset` 0 is the cohort's size-on-day-one;
    * `cohort_size` repeats it on every row so a consumer can compute the
    * retention RATE without a self-join.
    */
  def retention(events: DataFrame, key: Column, ts: Column): DataFrame = {
    val userDays = events
      // floor(a/b) in double is exact here: epoch-µs < 2⁵³ and the quotient
      // is never within an ulp of the next integer (1 µs ≙ 1.2e-11 days,
      // ~3 ulps at day ~2e4) — and DuckDB's integer `//` floors identically
      .select(key.as("key"),
        floor(TimeCols.tsMicros(ts) / lit(UsPerDay)).cast("long").as("day"))
      .distinct()
    val cohorts = userDays.groupBy("key").agg(min(col("day")).as("cohort_day"))
    // lazy checkpoint: the day-0 sizes filter and the final join both read
    // ONE materialization of the matrix instead of re-running the key join
    val cells = userDays
      .join(cohorts.hint("shuffle_hash"), Seq("key"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("key")).as("n_users"))
      .localCheckpoint(eager = false)
    val sizes = cells.filter(col("day_offset") === 0L)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    cells.join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention",
        round(col("n_users").cast("double") / col("cohort_size").cast("double"), 6))
      .select("cohort_day", "day_offset", "n_users", "cohort_size", "retention")
  }
}
