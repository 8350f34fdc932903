package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union aggregation — per key, the total length COVERED by a set
  * of possibly-overlapping intervals and the count of merged components:
  * total active time from session spans, effective crawl coverage from
  * fetch windows, span-dedup coverage from matched regions. The classic
  * "union of intervals" that naive `sum(end − start)` double-counts.
  *
  * Sweep-line as a window: with intervals ordered by (start, end) within a
  * key, each row contributes `max(0, end − max(start, maxEndBefore))` and
  * opens a new component iff `start > maxEndBefore`. The per-row
  * contributions depend on tie order, but their SUM is order-invariant
  * (overlapping mass is counted exactly once whichever overlapping row
  * claims it), so the aggregate is engine-deterministic in exact integer
  * µs arithmetic.
  *
  * Scale design: one hash shuffle on the key, one per-key sort for the
  * running-max frame — the window relation is the interval set itself
  * (per-key cardinality = that key's intervals, the quantity any interval
  * algorithm must hold); no global window, no self-join.
  */
object Intervals {

  /** Per key: `key`, `n_intervals`, `covered_us` (union length),
    * `n_components` (merged runs). Rows with NULL bounds or `end < start`
    * are excluded (no extent). Degenerate `end == start` intervals count
    * as intervals and components but cover zero.
    */
  def unionLength(df: DataFrame, key: Column, start: Column,
      end: Column): DataFrame = {
    val base = df.select(key.as("key"),
        TimeCols.tsMicros(start).as("s"), TimeCols.tsMicros(end).as("e"))
      .filter(col("s").isNotNull && col("e").isNotNull &&
        col("e") >= col("s"))
    val w = Window.partitionBy(col("key")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMax = max(col("e")).over(w)
    base
      .withColumn("__contrib",
        greatest(lit(0L), col("e") -
          greatest(col("s"), coalesce(prevMax, col("s")))))
      .withColumn("__newc",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .groupBy("key")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__contrib")).as("covered_us"),
        sum(col("__newc")).as("n_components"))
  }
}
