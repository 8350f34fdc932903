package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitoring — the ingest-time twin of the
  * batch [[graft.extensions.Drift.ksDrift]]: per (group, tumbling window),
  * the two-sample Kolmogorov–Smirnov statistic of the window's value
  * distribution against a FIXED reference distribution (the accepted
  * snapshot's per-value counts), emitted as the event-time watermark
  * closes the window. The regression gate a recurring crawl runs batch
  * becomes a continuous alarm: a source whose length/score distribution
  * moves shows a KS spike in the very window it moved.
  *
  * Same integral arithmetic as the batch operator: `D_scaled =
  * max |cumW(v)·n_ref − cumRef(v)·n_w|` over the merged value support —
  * exact BIGINT, engine- and replay-deterministic (`D = D_scaled /
  * (n_w · n_ref)`).
  *
  * State design: one row per OPEN (group, window): the per-value count map
  * — bounded by the VALUE CARDINALITY, which is the operator's contract
  * (band the signal first: length bands, score grids), never by the
  * stream. Windows close via `EventTimeTimeout` at window end (clamped
  * past the current watermark) and drop their state; an event later than
  * the watermark allows re-opens a closed window and re-emits it — keep
  * `watermarkDelay` ≥ the real out-of-orderness, the same trade as the
  * streaming sessionizer.
  */
object StreamingDrift {

  /** One closed window of one group. */
  case class DriftRow(grp: String, window_start_us: Long, n_window: Long,
    ks_scaled: Long)

  /** Internal event (public: Catalyst codegen instantiates it). The
    * watermarked timestamp column rides in whole — projecting to epoch-µs
    * upstream would strip the watermark metadata. */
  case class DEv(grp: String, wmts: java.sql.Timestamp, v: Long) {
    def us: Long = (wmts.getTime / 1000L) * 1000000L + wmts.getNanos / 1000L
  }

  /** Open-window accumulator: per-value counts + total. */
  case class WinState(counts: Map[Long, Long], n: Long)

  def ksDriftStream(events: DataFrame, grp: Column, ts: Column,
      value: Column, windowSeconds: Long, reference: Map[Long, Long],
      watermarkDelay: String = "0 seconds"): Dataset[DriftRow] = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    require(reference.nonEmpty && reference.valuesIterator.forall(_ > 0),
      "reference must be non-empty positive per-value counts")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .withColumn("__wmts", ts.cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("__wmts", watermarkDelay)
      .select(grp.cast("string").as("grp"), col("__wmts").as("wmts"),
        value.cast("long").as("v"))
      .filter(col("grp").isNotNull && col("v").isNotNull)
      .as[DEv]
    val wUs = windowSeconds * 1000000L
    val nRef = reference.values.sum
    base.groupByKey(e => (e.grp, e.us / wUs)) // nonneg epochs by contract
      .flatMapGroupsWithState[WinState, DriftRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (String, Long), it: Iterator[DEv],
            state: GroupState[WinState]) =>
          val (g, w) = key
          if (state.hasTimedOut) {
            val st = state.get
            // same enforced overflow envelope as the batch operator: every
            // product is bounded by n_window·n_ref, which must fit in a Long
            if (st.n > Long.MaxValue / math.max(nRef, 1L))
              throw new IllegalArgumentException(
                s"StreamingDrift: n_window(${st.n})*n_ref($nRef) exceeds " +
                  "2^63-1 — the integral KS product would overflow; shorten " +
                  "the window or band the values")
            val keys = (st.counts.keySet ++ reference.keySet).toArray.sorted
            var cw = 0L; var cr = 0L; var d = 0L
            keys.foreach { k =>
              cw += st.counts.getOrElse(k, 0L)
              cr += reference.getOrElse(k, 0L)
              d = math.max(d, math.abs(cw * nRef - cr * st.n))
            }
            state.remove()
            Iterator.single(DriftRow(g, w * wUs, st.n, d))
          } else {
            var st = state.getOption.getOrElse(WinState(Map.empty, 0L))
            it.foreach { e =>
              st = WinState(st.counts.updated(e.v,
                st.counts.getOrElse(e.v, 0L) + 1L), st.n + 1L)
            }
            state.update(st)
            // close as the watermark passes window end (wUs is a whole ms)
            state.setTimeoutTimestamp(math.max((w + 1L) * (wUs / 1000L),
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
