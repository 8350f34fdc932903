package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the batch twin of the
  * streaming session-window operator: consecutive events of the same key
  * belong to one session while the gap between them stays ≤ `gapSeconds`;
  * a longer silence starts a new session.
  *
  * Mechanics: per-key ordered `lag` marks session STARTS (first event, or
  * gap exceeded), a running sum of start-flags numbers the sessions
  * (1-based `session_idx`), and one aggregate per (key, session) emits the
  * session row. All gap arithmetic is in INTEGER epoch microseconds
  * (`gap_us > gapSeconds·1e6`) — no float time math, engine-bit-stable.
  *
  * Scale shape: ONE shuffle on the key; both windows and the final
  * aggregate share that partitioning (the `session_idx` grouping is a
  * prefix-extension of the sort the windows already established, so AQE
  * coalesces it into the same exchange). Per-key state is the window sort
  * — bounded by a key's own event count; a pathological bot key is the
  * usual salting candidate, but sessions are key-contiguous so the skew
  * cap is per-key history, not corpus size. No corpus-scale collect, no
  * global sort.
  */
object Sessionize {

  /** One row per (key, session): `session_idx` (1-based, in time order),
    * `n_events`, `start_us`/`end_us` (epoch micros), `duration_s`
    * (floor seconds), `n_event_types`, `sum_value` (rounded to 4 dp — the
    * engine-parity convention for float event sums).
    *
    * `ts` must be a TimestampType column; `tieBreak` stabilizes ordering of
    * equal timestamps (pass the event id).
    */
  def sessions(events: DataFrame, key: Column, ts: Column, tieBreak: Column,
      gapSeconds: Long, eventType: Column, value: Column): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val base = events.select(key.as("key"), TimeCols.tsMicros(ts).as("__us"),
      tieBreak.as("__tb"), eventType.as("__et"), value.as("__v"))
    val w = Window.partitionBy(col("key")).orderBy(col("__us"), col("__tb"))
    val flagged = base
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("__us") - col("__prev") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("key"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"),
        countDistinct(col("__et")).as("n_event_types"),
        round(sum(col("__v")), 4).as("sum_value"))
      .withColumn("duration_s",
        expr("(end_us - start_us) DIV 1000000"))
      .select("key", "session_idx", "n_events", "start_us", "end_us",
        "duration_s", "n_event_types", "sum_value")
  }
}
