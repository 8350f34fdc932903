package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming bottom-k (KMV) sketch monitor — the ingest-time twin of the
  * batch [[graft.ops.Sketches.bottomKOverlap]] sketch builder: per key,
  * the k smallest xxhash64 values of the distinct items seen so far.
  * One bounded structure yields three live signals:
  *
  *   - a KMV distinct-count estimate `(k−1) / h_(k) · 2^64`-normalized
  *     (Bar-Yossef et al. 2002) once the sketch is full — emitted as
  *     `approx_distinct`; below k distinct items the sketch IS the
  *     distinct hash set and the count is exact;
  *   - a uniform sample of the key's distinct items (the items whose
  *     hashes are the minima — we retain the hashes; the caller joins
  *     back by hash when item payloads are needed);
  *   - direct overlap comparability with any other bottom-k sketch built
  *     from the SAME hash (the batch builder, another stream, yesterday's
  *     snapshot) — stream and batch sketches over the same item set are
  *     IDENTICAL, not merely close.
  *
  * That last property is the monitor's contract and what the spec pins:
  * a min-k set is a fold of per-item minima — order- and
  * batching-invariant, deduplicating by construction — so unlike the HLL
  * monitor (register scheme ≠ Spark's HLL++, estimate parity only within
  * an envelope, see StreamingCardinality) the streaming sketch equals the
  * batch sketch ELEMENT-WISE on any prefix of the stream.
  *
  * State per key: ≤ k longs (a sorted array) — absolutely bounded, no
  * timeout, no item retention. After every micro-batch each updated key
  * re-emits `(key, n_events, sketch, approx_distinct)`; consumers keep
  * the newest stamp per key (largest n_events, the family convention).
  */
object StreamingBottomK {

  /** One emission: key, events so far, current sketch (ascending hashes,
    * ≤ k), distinct estimate (exact while the sketch is not full).
    */
  case class SketchRow(key: String, n_events: Long, sketch: Array[Long],
      approx_distinct: Long)

  /** Internal keyed event (public: Catalyst codegen instantiates it). */
  case class BEv(key: String, h: Long)

  /** Sorted-ascending bottom-k hash state + event counter. */
  case class BkState(hs: Array[Long], n: Long)

  /** KMV estimate from a sorted sketch: exact size below k; otherwise
    * (k−1)/u where u = h_(k) mapped to (0,1] from the full signed-long
    * range. Deterministic given the data (shared by stream and batch).
    */
  private[streaming] def estimate(hs: Array[Long], k: Int): Long = {
    if (hs.length < k) return hs.length.toLong
    // map signed long to (0,1]: (h − Long.Min) / 2^64 — ulp-level care is
    // pointless here (KMV's own error is ~1/sqrt(k)); double rounding is
    // deterministic, which is the property that matters
    val u = (hs(k - 1).toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
    if (u <= 0.0) return hs.length.toLong
    math.round((k - 1) / u)
  }

  /** Insert h into the sorted bottom-k set if it qualifies and is not
    * already present; returns the (possibly unchanged) array.
    */
  private[streaming] def insert(hs: Array[Long], h: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(hs, h)
    if (pos >= 0) return hs // distinct-set semantics: already tracked
    val ins = -pos - 1
    if (hs.length >= k && ins >= k) return hs // too large to qualify
    val outLen = math.min(hs.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(hs, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(hs, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  /** CHECKPOINT COMPATIBILITY: round 13 changed the sketch hash from
    * `xxhash64(item)` to `xxhash64(item.cast("string"))` for batch parity.
    * The state store holds raw hash values with no version tag, so a query
    * RESTARTED from a checkpoint written before that change would silently
    * merge old raw-typed hashes with new string-form hashes in one sketch,
    * corrupting distinct-count and overlap estimates with no error.
    * Checkpoints created before the change must be DISCARDED (start the
    * query from a fresh checkpoint location); this only affects non-string
    * item columns — for string items the two hash streams are identical.
    */
  def bottomKStream(events: DataFrame, key: Column, item: Column,
      k: Int = 256): Dataset[SketchRow] = {
    require(k >= 16 && k <= 65536, s"k must be in [16,65536], got $k")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      // NULL items are counted (n_events is the throughput signal, the
      // StreamingCardinality stance) but never sketched — the batch
      // builder's distinct() ignores NULL terms the same way
      .filter(key.isNotNull)
      // hash the STRING form of the item: the batch builder
      // (Sketches.bottomKOverlap) hashes term.cast("string"), and the
      // sketches are only overlap-comparable if both sides draw from the
      // identical hash stream — xxhash64 over a raw long and over its
      // string form differ, which would silently read near-zero overlap
      // for non-string item columns (numeric ids)
      .select(key.cast("string").as("key"),
        when(item.isNotNull, xxhash64(item.cast("string"))).as("h"))
      .as[CEvB]
    base.groupByKey(_.key)
      .flatMapGroupsWithState[BkState, SketchRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (kk: String, it: Iterator[CEvB], state: GroupState[BkState]) =>
          val st = state.getOption.getOrElse(BkState(Array.emptyLongArray, 0L))
          var hs = st.hs
          var n = st.n
          it.foreach { ev =>
            n += 1
            ev.h.foreach { h => hs = insert(hs, h, k) }
          }
          state.update(BkState(hs, n))
          Iterator.single(SketchRow(kk, n, hs, estimate(hs, k)))
      }
  }

  /** Internal keyed event with nullable hash. */
  case class CEvB(key: String, h: Option[Long])
}
