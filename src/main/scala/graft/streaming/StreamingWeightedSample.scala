package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Efraimidis–Spirakis weighted sample — the ingest-time twin of
  * the batch [[graft.extensions.Sampling.weightedSample]]: per stratum, the
  * k items with the largest A-ES keys `u^(1/w)` seen so far, where `u` is
  * the PORTABLE sha-derived uniform of (id ⊕ salt) — the same arithmetic,
  * computed by the same in-plan expressions, as the batch operator.
  *
  * PARITY CONTRACT vs batch: the A-ES key is a pure function of (id, salt,
  * weight), so keeping the top-k keys is an order- and batching-invariant
  * fold that is idempotent under re-delivery (a re-arriving id recomputes
  * the identical key and is skipped or re-evicted identically). On any
  * stream prefix the sample therefore EQUALS the batch selection over the
  * same rows — strict equality, the [[StreamingBottomK]] stance — with one
  * caveat pinned in the spec: exact A-ES-key ties break on the STRING form
  * of the id here (the state's representation) vs the native type in the
  * batch window; two distinct ids tie only by drawing the same 2^-32
  * uniform with equal weights, so tie-free parity is the practical
  * contract.
  *
  * Weight-stability contract: an id that re-arrives with a DIFFERENT
  * weight is treated as a new draw of the same uniform (the key is
  * recomputed); the sample then reflects whichever draws qualified — batch
  * parity holds only for weight-stable streams, the same uniqueness
  * assumption the batch operator places on its input relation.
  *
  * Events with a NULL id or non-positive/NULL weight are counted in
  * `n_events` (the throughput signal) but never sampled — the batch
  * operator excludes them by contract. NULL-stratum events are dropped
  * entirely (no key to attribute them to, the batch filter's stance).
  *
  * State per stratum: ≤ k (key, id, weight) triples + one counter —
  * absolutely bounded, no timeout, no item retention beyond the sample.
  * After every micro-batch each updated stratum re-emits
  * `(stratum, n_events, ids, weights)` in rank order; consumers keep the
  * newest stamp per stratum (largest n_events, the family convention).
  */
object StreamingWeightedSample {

  /** One emission: stratum, events so far, sampled ids + weights in rank
    * order (best A-ES key first).
    */
  case class SampleRow(stratum: String, n_events: Long, ids: Array[String],
      weights: Array[Double])

  /** Internal keyed event (public: Catalyst codegen instantiates it). */
  case class WEv(stratum: String, id: Option[String], w: Option[Double],
      a: Option[Double])

  /** Parallel-array sample state sorted by (key desc, id asc) + counter. */
  case class WsState(as: Array[Double], ids: Array[String],
      ws: Array[Double], n: Long)

  /** Rank order: larger key first, ties by id ascending (string form). */
  private[streaming] def beats(a1: Double, id1: String, a2: Double,
      id2: String): Boolean =
    a1 > a2 || (a1 == a2 && id1 < id2)

  /** Insert (a, id, w) into the rank-sorted sample if it qualifies; an id
    * already present with the same key is skipped (re-delivery
    * idempotence). Returns the (possibly unchanged) state arrays.
    *
    * Order of checks matters: the dup lookup runs FIRST, so a re-arriving
    * id's stale entry is always dropped before the qualification test —
    * a re-weighted id re-ranks under its NEW key (re-entering the slot
    * its removal freed), never holds rank under the stale one. (The
    * pre-round-13 version tested qualification first — a full sample
    * whose threshold beat the new key returned early with the stale
    * entry intact — and its no-op scan stopped one slot past the
    * equal-ranked identical entry, beats() being false on equality, so
    * the short-circuit never fired; correctness leaned entirely on the
    * dup-removal path.)
    */
  private[streaming] def insert(st: WsState, a: Double, id: String,
      w: Double, k: Int): WsState = {
    val dup = st.ids.indexOf(id)
    // identical (key, id) already tracked → re-delivery no-op
    if (dup >= 0 && st.as(dup) == a) return st
    // drop the stale entry of a re-weighted id unconditionally
    val (as0, ids0, ws0) =
      if (dup < 0) (st.as, st.ids, st.ws)
      else (st.as.patch(dup, Nil, 1), st.ids.patch(dup, Nil, 1),
        st.ws.patch(dup, Nil, 1))
    var j = 0
    while (j < as0.length && !beats(a, id, as0(j), ids0(j))) j += 1
    if (as0.length >= k && j >= k) return WsState(as0, ids0, ws0, st.n)
    val outLen = math.min(as0.length + 1, k)
    WsState(
      (as0.take(j) :+ a) ++ as0.drop(j) take outLen,
      (ids0.take(j) :+ id) ++ ids0.drop(j) take outLen,
      (ws0.take(j) :+ w) ++ ws0.drop(j) take outLen,
      st.n)
  }

  def weightedSampleStream(events: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int, salt: String = ""): Dataset[SampleRow] = {
    require(k >= 1 && k <= 100000, s"k must be in [1,1e5], got $k")
    val spark = events.sparkSession
    import spark.implicits._
    val idStr = id.cast("string")
    // identical arithmetic to Sampling.weightedSample — the parity contract
    val u = (conv(substring(sha2(concat(idStr, lit(salt)), 256), 1, 8),
      16, 10).cast("double") + lit(0.5)) / lit(4294967296.0)
    val w = weight.cast("double")
    val eligible = idStr.isNotNull && w > 0.0
    val base = events
      .filter(stratum.isNotNull)
      .select(stratum.cast("string").as("stratum"),
        when(eligible, idStr).as("id"),
        when(eligible, w).as("w"),
        when(eligible, pow(u, lit(1.0) / w)).as("a"))
      .as[WEv]
    base.groupByKey(_.stratum)
      .flatMapGroupsWithState[WsState, SampleRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (kk: String, it: Iterator[WEv], state: GroupState[WsState]) =>
          var st = state.getOption.getOrElse(
            WsState(Array.emptyDoubleArray, Array.empty[String],
              Array.emptyDoubleArray, 0L))
          it.foreach { ev =>
            st = st.copy(n = st.n + 1)
            for (a <- ev.a; i <- ev.id; ww <- ev.w)
              st = insert(st, a, i, ww, k)
          }
          state.update(st)
          Iterator.single(SampleRow(kk, st.n, st.ids, st.ws))
      }
  }
}
