package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling with gap fill: bucket an event stream per key onto a
  * regular `unit` grid (hour/day/minute), emit EVERY grid cell between each
  * key's first and last bucket, and forward-fill the value across empty
  * cells — the "regularize before you window" step of metric and training-
  * telemetry pipelines.
  *
  * Scale shape: buckets aggregate first (one map-side-combined shuffle on
  * (key, bucket) — the only pass over the raw stream), so the grid explode
  * and the forward-fill window run on BUCKET-cardinality data, bounded by
  * key-count × time-span regardless of event volume. The per-key window is
  * safe for real keys (a key's grid is its time span, not its event count);
  * the grid join is hash-hinted because post-aggregate relations carry no
  * stats and would otherwise sort-merge.
  */
object Resample {

  /** Returns one row per (key, grid bucket): `bucket`, `n` events in the
    * bucket (0 for gaps), `v_avg` the bucket's mean value (null for gaps),
    * `v_ffill` the forward-filled mean, `gap_filled` whether the cell was
    * manufactured. `v_avg` is rounded to 6 places BEFORE the fill so the
    * carried value is reproducible across engines.
    */
  def gapFill(df: DataFrame, key: Column, ts: Column, value: Column,
      unit: String = "hour"): DataFrame = {
    require(Set("minute", "hour", "day", "week").contains(unit.toLowerCase),
      s"unsupported grid unit: $unit")
    val hourly = df
      .select(key.as("key"), date_trunc(unit, ts).as("bucket"), value.as("v"))
      .groupBy("key", "bucket")
      .agg(count(lit(1)).as("n"), round(avg("v"), 6).as("v_avg"))
    val grid = hourly.groupBy("key")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col("key"), explode(
        sequence(col("b0"), col("b1"), expr(s"INTERVAL 1 $unit"))).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly.hint("shuffle_hash"), Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("v_avg"),
        last(col("v_avg"), ignoreNulls = true).over(w).as("v_ffill"),
        col("n").isNull.as("gap_filled"))
  }
}
