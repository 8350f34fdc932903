package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window anomaly scoring: each row's value against the mean/stddev
  * of its key's PRECEDING `lookback` rows (the row itself excluded — the
  * baseline must not contain the observation it judges). The monitoring
  * primitive for event streams: spend spikes, latency regressions, volume
  * drops.
  *
  * Scale shape: one shuffle on the key, then a bounded ROWS frame per row —
  * state is O(lookback), never the key's history. Keys are data-scale
  * (users/devices), so the per-key window parallelizes; there is no global
  * window anywhere. Baseline stats are ROUNDED (6 dp) before the z-score so
  * every engine derives identical flags from identical boundaries.
  */
object Outliers {

  /** Adds `base_n` (trailing sample size), `z` (null until `minN` baseline
    * rows exist and the baseline varies), `is_anomaly` (|z| > threshold).
    * `order` must totally order rows within a key or frames are ambiguous.
    */
  def trailingZScore(df: DataFrame, key: Column, order: Seq[Column],
      value: Column, lookback: Int = 20, minN: Int = 10,
      threshold: Double = 3.0): DataFrame = {
    require(lookback >= minN && minN >= 2)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(-lookback, -1)
    df.withColumn("base_n", count(value).over(w))
      .withColumn("__avg", round(avg(value).over(w), 6))
      .withColumn("__std", round(stddev_samp(value).over(w), 6))
      .withColumn("z",
        when(col("base_n") >= minN && col("__std") > 0,
          round((value - col("__avg")) / col("__std"), 4)))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__avg", "__std")
  }
}
