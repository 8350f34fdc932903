package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2-style run compaction (the gaps-and-islands build): collapse a keyed,
  * time-ordered attribute stream into validity intervals — one row per
  * maximal run of consecutive equal attribute values, carrying
  * `[valid_from, valid_to)` bounds. This is the history-table construction
  * every warehouse CDC merge performs (slowly-changing-dimension type 2),
  * and the change-log compaction a 100 TB event store runs before serving
  * point-in-time lookups: the reference's status timeline
  * (`app.py:1038-1081` renders per-job status transitions) generalized to
  * the keyed-attribute case.
  *
  * Mechanics: the [[Sessionize]] island idiom with a VALUE-change trigger
  * instead of a time-gap trigger — per-key ordered `lag` marks run STARTS
  * (first row, or attribute changed under null-safe `<=>`), a running sum
  * numbers the runs, one aggregate per (key, run) emits the interval, and a
  * per-key `lead` closes each interval with the next run's start.
  * `valid_to_us` of the LAST run is the open-interval sentinel
  * `Long.MaxValue` (the classic SCD2 high-date — no NULL bound to trip
  * null-ordering differences across engines); `is_current` marks it.
  *
  * Scale shape: ONE shuffle on the key — both windows (flag + close) and
  * the run aggregate share that partitioning, and the closing `lead` runs
  * over the already-compacted RUN relation (≤ one row per value change,
  * not per event). First-row detection uses `lag(tieBreak)` — the tie-break
  * is non-null by contract, so a NULL previous-attribute is never confused
  * with "no previous row" (a nullable attribute forms its own runs).
  */
object Scd {

  val OpenEndUs: Long = Long.MaxValue

  /** One row per (key, run): `run_idx` (1-based, in time order), `attr_val`
    * (the run's constant attribute value), `valid_from_us` (first event's
    * epoch micros), `valid_to_us` (next run's start, or [[OpenEndUs]] for
    * the key's current run), `n_rows` (events compacted into the run),
    * `is_current`.
    *
    * `ts` must be TimestampType and non-null; `tieBreak` must be non-null
    * and make (ts, tieBreak) unique per key (pass the event id).
    */
  def runCompact(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      attr: Column): DataFrame = {
    val base = df.select(key.as("key"), TimeCols.tsMicros(ts).as("__us"),
      tieBreak.as("__tb"), attr.as("attr_val"))
    val w = Window.partitionBy(col("key")).orderBy(col("__us"), col("__tb"))
    val flagged = base
      .withColumn("__prev_tb", lag(col("__tb"), 1).over(w))
      .withColumn("__prev_attr", lag(col("attr_val"), 1).over(w))
      // null-safe change test: a nullable attribute still breaks runs
      // correctly, and the first row (prev_tb null) always starts one
      .withColumn("__new", when(col("__prev_tb").isNull ||
        !(col("__prev_attr") <=> col("attr_val")), 1L).otherwise(0L))
      .withColumn("run_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged.groupBy(col("key"), col("run_idx"))
      .agg(min(col("attr_val")).as("attr_val"),
        min(col("__us")).as("valid_from_us"),
        count(lit(1)).as("n_rows"))
    val wRun = Window.partitionBy(col("key")).orderBy(col("run_idx"))
    runs
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(wRun), lit(OpenEndUs)))
      .withColumn("is_current", col("valid_to_us") === OpenEndUs)
      .select("key", "run_idx", "attr_val", "valid_from_us", "valid_to_us",
        "n_rows", "is_current")
  }
}
