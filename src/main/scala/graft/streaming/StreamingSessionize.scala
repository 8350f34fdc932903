package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.TimeCols

/** Streaming gap-based sessionization — the ingest-time analogue of the batch
  * [[graft.ops.Sessionize.sessions]]: sessions are CLOSED and emitted as the
  * event-time watermark passes `last event + gap`, so a 100 TB event stream
  * produces finished session rows continuously instead of re-sessionizing in
  * batch later. Output rows carry the SAME fields and arithmetic as the
  * batch operator (epoch-µs bounds, floor-second duration, distinct-type
  * count, 4-dp HALF_UP value sum), and StreamingSessionizeSpec pins
  * stream ≡ batch equality on closed sessions.
  *
  * State design (what survives an unbounded stream):
  *  - one state row per key: the OPEN session accumulator (bounded: counters
  *    + the distinct event-type list, enum-scale by contract) plus the
  *    1-based session counter. Closing a session keeps the counter (so
  *    numbering matches the batch operator's per-key `session_idx`) and
  *    drops the accumulator — steady-state is ~3 longs per key.
  *  - sessions close via `EventTimeTimeout` at `last_us + gap`, clamped one
  *    ms past the current watermark (a timeout timestamp at or before the
  *    watermark is illegal). No processing-time coupling: replaying the
  *    stream gives identical sessions.
  *
  * Within a micro-batch events are processed in `(ts, tieBreak)` order (the
  * `flatMapGroupsWithState` iterator order is not defined), so batch
  * composition does not change session splits for in-order streams. An
  * event arriving LATE but within the watermark merges into the key's open
  * session (extending its bounds) — it cannot retroactively split a session
  * that already closed; that is the watermark trade every streaming
  * sessionizer makes. Choose `watermarkDelay` ≥ the real out-of-orderness.
  */
object StreamingSessionize {

  /** Mirrors the batch operator's output row. */
  case class SessionRow(key: Long, session_idx: Long, n_events: Long,
    start_us: Long, end_us: Long, duration_s: Long, n_event_types: Long,
    sum_value: Double)

  /** Internal event (public: Catalyst codegen instantiates it). The
    * WATERMARKED timestamp column itself rides into the stateful operator —
    * projecting it to epoch-µs upstream would strip the watermark metadata
    * and fail the event-time-timeout analysis check. */
  case class Ev(key: Long, wmts: java.sql.Timestamp, tb: Long, et: String,
      v: Double) {
    def us: Long = (wmts.getTime / 1000L) * 1000000L + wmts.getNanos / 1000L
  }

  /** Open-session accumulator + per-key session counter. */
  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long,
    types: List[String], sum: Double)
  case class KeyState(curIdx: Long, open: Option[OpenSession])

  /** `events` needs a key castable to long, a timestamp (TIMESTAMP or
    * TIMESTAMP_NTZ), a long tie-break (the event id), an event-type string
    * and a double value. Output mode: append (closed sessions only).
    */
  def sessionsStream(events: DataFrame, key: Column, ts: Column,
      tieBreak: Column, gapSeconds: Long, eventType: Column, value: Column,
      watermarkDelay: String = "0 seconds"): Dataset[SessionRow] = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .withColumn("__wmts", ts.cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("__wmts", watermarkDelay)
      .select(key.cast("long").as("key"), col("__wmts").as("wmts"),
        tieBreak.cast("long").as("tb"), eventType.cast("string").as("et"),
        value.cast("double").as("v"))
      .as[Ev]
    val gapUs = gapSeconds * 1000000L
    base.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: Long, it: Iterator[Ev], state: GroupState[KeyState]) =>
          def close(idx: Long, o: OpenSession): SessionRow =
            SessionRow(k, idx, o.nEvents, o.startUs, o.lastUs,
              (o.lastUs - o.startUs) / 1000000L, o.types.size.toLong,
              BigDecimal(o.sum)
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          if (state.hasTimedOut) {
            val st = state.get
            val out = st.open.map(o => close(st.curIdx, o)).iterator
            state.update(KeyState(st.curIdx, None)) // keep the counter
            out
          } else {
            var st = state.getOption.getOrElse(KeyState(0L, None))
            val out = List.newBuilder[SessionRow]
            it.toArray.sortBy(e => (e.us, e.tb)).foreach { e =>
              st.open match {
                case None =>
                  st = KeyState(st.curIdx + 1,
                    Some(OpenSession(e.us, e.us, 1L, List(e.et), e.v)))
                case Some(o) if e.us - o.lastUs > gapUs =>
                  out += close(st.curIdx, o)
                  st = KeyState(st.curIdx + 1,
                    Some(OpenSession(e.us, e.us, 1L, List(e.et), e.v)))
                case Some(o) =>
                  val types =
                    if (o.types.contains(e.et)) o.types else e.et :: o.types
                  st = KeyState(st.curIdx, Some(OpenSession(
                    math.min(o.startUs, e.us), math.max(o.lastUs, e.us),
                    o.nEvents + 1L, types, o.sum + e.v)))
              }
            }
            state.update(st)
            st.open.foreach { o =>
              // ceiling-divide last_us to ms: floor would let the timeout
              // fire up to 999µs before last+gap, closing a session that a
              // sub-ms in-gap event should still extend (stream≡batch pin)
              state.setTimeoutTimestamp(math.max(
                (o.lastUs + 999L) / 1000L + gapSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }
}
