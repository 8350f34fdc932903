package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quantile monitor — the ingest-time twin of
  * [[graft.ops.Quantiles.approxQuantileProfile]]: per key, live quantile
  * estimates of every value that has arrived so far (latency percentiles,
  * document-length drift, score-distribution dashboards) from a bounded
  * Greenwald–Khanna (SIGMOD 2001) summary, without ever holding the value
  * multiset.
  *
  * State per key: the GK tuple list `(v, g, Δ)` (+ counters) — the
  * classic ε-approximate rank summary, O((1/ε)·log(εn)) tuples with the
  * standard compress pass, absolutely bounded, no timeout, no value
  * retention beyond the summary.
  *
  * DIVERGENCE CONTRACT vs batch (the [[StreamingCardinality]] stance,
  * envelope-only): a GK summary is insertion-order- and compress-timing-
  * dependent, and Spark's batch `percentile_approx` is a different
  * summary family (KLL-ish) — estimate EQUALITY between stream and batch,
  * or between two batchings of the same stream, is NOT promised. What IS
  * pinned, for every emitted estimate on any stream prefix: the estimate
  * is a VALUE THAT ARRIVED, and its exact rank r in the prefix satisfies
  * `|r − ⌈φ·n⌉| ≤ ε·n` — the GK guarantee, enforced by construction
  * (every insert carries Δ = ⌊2εn⌋−1 and every merge respects
  * g + Δ ≤ ⌊2εn⌋) and verified against exact driver ranks in the spec.
  *
  * NULL values are counted in `n_events` (the throughput signal) but
  * never summarized — `n_valued` carries the estimate's own denominator
  * (the round-11 StreamingCardinality advisory stance). After every
  * micro-batch each updated key re-emits
  * `(key, n_events, n_valued, quantiles)` in the φ-order requested;
  * consumers keep the newest stamp per key.
  */
object StreamingQuantiles {

  /** One emission: key, events so far (NULLs included), non-NULL values
    * summarized, and one estimate per requested φ (a key with no non-NULL
    * values yet emits NaN estimates — primitive arrays can't carry NULL,
    * and n_valued = 0 already flags the row).
    */
  case class QuantRow(key: String, n_events: Long, n_valued: Long,
      quantiles: Array[Double])

  /** Internal keyed event (public: Catalyst codegen instantiates it). */
  case class QEv(key: String, v: Option[Double])

  /** GK summary as parallel arrays (vs: sorted values; gs/ds: the g/Δ
    * rank gaps) + counters. Arrays, not case-class lists: the state
    * encoder round-trips primitive arrays without boxing.
    */
  case class GkState(vs: Array[Double], gs: Array[Long], ds: Array[Long],
      n: Long, nEvents: Long)

  /** Insert one value, maintaining the GK invariant g + Δ ≤ ⌊2εn⌋.
    * New interior tuples carry Δ = ⌊2εn⌋ − 1; a value inserted before the
    * current min or after the current max is itself an exact extreme and
    * carries Δ = 0.
    */
  private[streaming] def insert(st: GkState, v: Double, eps: Double): GkState = {
    val n1 = st.n + 1
    var i = 0
    while (i < st.vs.length && st.vs(i) <= v) i += 1
    val delta =
      if (i == 0 || i == st.vs.length) 0L
      else math.max(0L, math.floor(2.0 * eps * st.n).toLong - 1L)
    GkState(
      (st.vs.take(i) :+ v) ++ st.vs.drop(i),
      (st.gs.take(i) :+ 1L) ++ st.gs.drop(i),
      (st.ds.take(i) :+ delta) ++ st.ds.drop(i),
      n1, st.nEvents)
  }

  /** One compress pass: merge tuple i into its right neighbor wherever
    * g_i + g_{i+1} + Δ_{i+1} ≤ ⌊2εn⌋ — the merged tuple keeps the
    * neighbor's (v, Δ) and absorbs g, so rmin/rmax bounds stay valid.
    * The first and last tuples are never merged away (they pin the
    * exact min/max).
    */
  private[streaming] def compress(st: GkState, eps: Double): GkState = {
    if (st.vs.length < 3) return st
    val cap = math.floor(2.0 * eps * st.n).toLong
    val vs = scala.collection.mutable.ArrayBuffer[Double]()
    val gs = scala.collection.mutable.ArrayBuffer[Long]()
    val ds = scala.collection.mutable.ArrayBuffer[Long]()
    // walk right-to-left, greedily absorbing left tuples into the current
    var i = st.vs.length - 1
    var curV = st.vs(i); var curG = st.gs(i); var curD = st.ds(i)
    i -= 1
    while (i >= 1) { // tuple 0 (the exact min) is never absorbed
      if (st.gs(i) + curG + curD <= cap) {
        curG += st.gs(i) // absorb tuple i into the current (right) tuple
      } else {
        vs.prepend(curV); gs.prepend(curG); ds.prepend(curD)
        curV = st.vs(i); curG = st.gs(i); curD = st.ds(i)
      }
      i -= 1
    }
    vs.prepend(curV); gs.prepend(curG); ds.prepend(curD)
    vs.prepend(st.vs(0)); gs.prepend(st.gs(0)); ds.prepend(st.ds(0))
    GkState(vs.toArray, gs.toArray, ds.toArray, st.n, st.nEvents)
  }

  /** ε-approximate φ-quantile lookup: the value at the first tuple whose
    * rmax exceeds ⌈φn⌉ + εn, stepped back one — the canonical GK query.
    */
  private[streaming] def query(st: GkState, phi: Double, eps: Double): Double = {
    val r = math.ceil(phi * st.n)
    val t = eps * st.n
    var rmin = 0L
    var i = 0
    while (i < st.vs.length) {
      rmin += st.gs(i)
      if (rmin + st.ds(i) > r + t) return st.vs(math.max(0, i - 1))
      i += 1
    }
    st.vs(st.vs.length - 1)
  }

  def quantileStream(events: DataFrame, key: Column, value: Column,
      phis: Seq[Double], eps: Double = 0.01): Dataset[QuantRow] = {
    require(phis.nonEmpty && phis.forall(p => p > 0.0 && p < 1.0),
      s"phis must be in (0,1), got $phis")
    require(eps >= 0.001 && eps <= 0.2, s"eps must be in [0.001,0.2], got $eps")
    val spark = events.sparkSession
    import spark.implicits._
    // compress cadence: every ⌈1/(2ε)⌉ inserts — the classic schedule that
    // keeps the summary at O((1/ε)·log(εn)) tuples
    val cadence = math.max(1, math.ceil(1.0 / (2.0 * eps)).toInt)
    val base = events
      .filter(key.isNotNull)
      .select(key.cast("string").as("key"),
        value.cast("double").as("v"))
      .as[QEv]
    base.groupByKey(_.key)
      .flatMapGroupsWithState[GkState, QuantRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (kk: String, it: Iterator[QEv], state: GroupState[GkState]) =>
          var st = state.getOption.getOrElse(GkState(
            Array.emptyDoubleArray, Array.emptyLongArray,
            Array.emptyLongArray, 0L, 0L))
          it.foreach { ev =>
            st = st.copy(nEvents = st.nEvents + 1)
            ev.v.foreach { v =>
              st = insert(st, v, eps)
              if (st.n % cadence == 0) st = compress(st, eps)
            }
          }
          state.update(st)
          val qs =
            if (st.n == 0) Array.fill(phis.size)(Double.NaN)
            else phis.map(p => query(st, p, eps)).toArray
          Iterator.single(QuantRow(kk, st.nEvents, st.n, qs))
      }
  }
}
