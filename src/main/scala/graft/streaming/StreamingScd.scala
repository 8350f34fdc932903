package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TimeCols

/** Streaming SCD2 run compaction — the ingest-time twin of the batch
  * [[graft.ops.Scd.runCompact]]: a run CLOSES the moment a key's attribute
  * value changes, so a 100 TB change-data stream produces finished validity
  * intervals continuously instead of re-compacting history in batch later.
  * Closed rows carry the SAME fields and arithmetic as the batch operator
  * (epoch-µs bounds, `valid_to_us` = the next run's start); the key's OPEN
  * run lives in state (it is the batch operator's `is_current` row — append
  * mode cannot retract, so it is emitted only when a value change closes
  * it).
  *
  * PARITY CONTRACT: for an in-order stream, after any prefix the emitted
  * rows EQUAL `Scd.runCompact(prefix)` minus its `is_current` rows
  * (StreamingScdSpec pins this across batch compositions). Within a
  * micro-batch events are processed in `(ts, tieBreak)` order (the
  * `flatMapGroupsWithState` iterator order is not defined), so batch
  * composition never changes run splits.
  *
  * Idempotence / late data: the state keeps the key's high-water
  * `(us, tieBreak)` mark and DROPS anything at or below it — re-delivered
  * events cannot double-count `n_rows`, and a late event cannot
  * retroactively split an interval that subsequent history already
  * extended (the same watermark trade [[StreamingSessionize]] documents;
  * feed genuinely out-of-order streams through the batch operator
  * instead).
  *
  * State per key: run counter + the open run's (attr, from, n) + the
  * high-water mark — ~4 longs and one attribute value, bounded for an
  * unbounded stream. No event-time timeout is needed (runs close on data,
  * not on silence), so the state never expires by design; keys are the
  * dimension-table population, bounded by contract.
  */
object StreamingScd {

  /** Mirrors the batch operator's output row (closed runs only, so
    * `is_current` is always false — kept for schema parity). `attr_val` is
    * an Option: the batch operator compacts NULL-attribute runs too. */
  case class RunRow(key: Long, run_idx: Long, attr_val: Option[String],
    valid_from_us: Long, valid_to_us: Long, n_rows: Long,
    is_current: Boolean)

  /** Internal event (public: Catalyst codegen instantiates it). */
  case class ScdEv(key: Long, us: Long, tb: Long, attr: Option[String])

  case class OpenRun(attr: Option[String], fromUs: Long, n: Long)
  case class ScdState(curIdx: Long, open: Option[OpenRun],
    hwUs: Long, hwTb: Long)

  /** `events` needs a key castable to long, a timestamp (TIMESTAMP or
    * TIMESTAMP_NTZ), a long tie-break (the event id) and an attribute
    * column (cast to string). Output mode: append (closed runs only).
    */
  def runCompactStream(events: DataFrame, key: Column, ts: Column,
      tieBreak: Column, attr: Column): Dataset[RunRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(key.cast("long").as("key"),
        TimeCols.tsMicros(ts).as("us"), tieBreak.cast("long").as("tb"),
        attr.cast("string").as("attr"))
      .as[ScdEv]
    base.groupByKey(_.key)
      .flatMapGroupsWithState[ScdState, RunRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[ScdEv], state: GroupState[ScdState]) =>
          var st = state.getOption.getOrElse(
            ScdState(0L, None, Long.MinValue, Long.MinValue))
          val out = List.newBuilder[RunRow]
          it.toArray.sortBy(e => (e.us, e.tb)).foreach { e =>
            // idempotence/late-data guard: strictly-newer events only
            if (e.us > st.hwUs || (e.us == st.hwUs && e.tb > st.hwTb)) {
              st.open match {
                case Some(o) if o.attr == e.attr =>
                  st = ScdState(st.curIdx, Some(o.copy(n = o.n + 1L)),
                    e.us, e.tb)
                case Some(o) =>
                  out += RunRow(k, st.curIdx, o.attr, o.fromUs, e.us, o.n,
                    is_current = false)
                  st = ScdState(st.curIdx + 1L,
                    Some(OpenRun(e.attr, e.us, 1L)), e.us, e.tb)
                case None =>
                  st = ScdState(st.curIdx + 1L,
                    Some(OpenRun(e.attr, e.us, 1L)), e.us, e.tb)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
