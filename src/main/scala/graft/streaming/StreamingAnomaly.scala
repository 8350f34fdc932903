package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly detection — the ingest-time analogue of
  * the batch [[graft.ops.Anomaly.rollingZScore]]: every event is judged
  * against the trailing `window` observations of its key AS IT ARRIVES,
  * so pipeline telemetry (ingest rates, reject ratios, doc sizes) alarms
  * continuously instead of in a nightly batch sweep. Fields and arithmetic
  * are IDENTICAL to the batch operator — integer MILLI values, the
  * cross-multiplied BIGINT z-test `(n·v−S)² > z²(n·Q−S²)` over exact window
  * sums, the trailing frame excluding the current row — and
  * StreamingAnomalySpec pins stream ≡ batch equality on in-order streams.
  *
  * State design: one ring of the last `window` v_milli values per key
  * (≤ `window` longs — absolutely bounded, no timeout needed; keys are
  * enum-scale by contract: event types, pipeline stages). Within a
  * micro-batch the group's events are processed in `(ts, tieBreak)` order
  * (the `flatMapGroupsWithState` iterator order is not defined); across
  * batches the ring carries forward, so batch composition does not change
  * verdicts for in-order streams. An out-of-order event (late but within
  * the upstream watermark) is judged against the state AS OF its arrival —
  * the same trade the streaming sessionizer documents; choose the source
  * watermark ≥ the real out-of-orderness if exact batch parity matters.
  */
object StreamingAnomaly {

  /** Mirrors the batch operator's output row. */
  case class AnomalyRow(event_id: Long, part: String, v_milli: Long,
    n_prev: Long, dev_sq: Long, thr_sq: Long, is_anomaly: Boolean)

  /** Internal event (public: Catalyst codegen instantiates it). */
  case class AEv(part: String, us: Long, tb: Long, vm: Long)

  /** Trailing ring: oldest-first v_milli values, ≤ window entries. */
  case class Ring(vals: List[Long])

  def anomaliesStream(events: DataFrame, part: Column, ts: Column,
      tieBreak: Column, value: Column, window: Int = 50, z: Int = 3,
      minPrev: Int = 20): Dataset[AnomalyRow] = {
    require(window >= 2 && window <= 10000,
      s"window must be in [2,10000], got $window")
    require(z >= 1 && z <= 100, s"z must be in [1,100], got $z")
    require(minPrev >= 2 && minPrev <= window,
      s"minPrev must be in [2,$window], got $minPrev")
    // Same enforced overflow envelope as the batch operator: with
    // max(2,z)·window·|v_milli| ≤ floor(√(2⁶³−1)) every Long product below
    // (dev², z²·varn, n·q, s²) provably fits — so the batch/stream parity
    // contract holds bit-for-bit instead of both silently wrapping.
    val vmMax = graft.ops.Anomaly.vMilliBound(window, z)
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.select(part.cast("string").as("part"),
        graft.ops.TimeCols.tsMicros(ts).as("us"),
        tieBreak.cast("long").as("tb"),
        round(value * 1000).cast("long").as("vm"))
      .as[AEv]
    val zz = z.toLong * z
    base.groupByKey(_.part)
      .flatMapGroupsWithState[Ring, AnomalyRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: String, it: Iterator[AEv], state: GroupState[Ring]) =>
          var ring = state.getOption.getOrElse(Ring(Nil)).vals
          val out = List.newBuilder[AnomalyRow]
          it.toArray.sortBy(e => (e.us, e.tb)).foreach { e =>
            if (math.abs(e.vm) > vmMax)
              throw new IllegalArgumentException(
                s"StreamingAnomaly: |round(value*1000)| exceeds the " +
                  s"overflow-safe bound $vmMax for window=$window, z=$z; " +
                  s"got ${e.vm} (key=$k)")
            val n = ring.size.toLong
            val s = ring.sum
            val q = ring.iterator.map(v => v * v).sum
            val dev = n * e.vm - s
            val varn = n * q - s * s
            out += AnomalyRow(e.tb, k, e.vm, n, dev * dev, zz * varn,
              n >= minPrev && dev * dev > zz * varn)
            ring = (ring :+ e.vm).takeRight(window)
          }
          state.update(Ring(ring))
          out.result().iterator
      }
  }
}
