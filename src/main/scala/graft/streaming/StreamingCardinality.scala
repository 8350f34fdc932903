package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-cardinality monitor — the ingest-time twin of
  * [[graft.ops.Cardinality.approxDistinctProfile]]: per key, a live
  * HyperLogLog estimate of how many DISTINCT values have arrived so far
  * (vocabulary growth, unique-domain counts, dedup-rate dashboards),
  * without ever holding the value set.
  *
  * The value is hashed IN-PLAN with the codegen'd `xxhash64` (the same
  * deterministic 64-bit hash family the batch engine uses everywhere), so
  * the stateful operator only ever sees longs; the state per key is one
  * dense HLL register array of 2^p bytes (+ a row counter) — absolutely
  * bounded, no timeout, no value retention. After every micro-batch each
  * updated key re-emits `(key, n_events, n_valued, approx_distinct)`
  * stamped with its running event total (the [[StreamingHeavyHitters]]
  * consumer contract: keep the newest stamp per key). `n_events` counts
  * EVERY event for the key (NULL values included — the throughput
  * signal); `n_valued` counts the non-NULL-valued subset the estimate is
  * actually built from.
  *
  * Estimator: classic HLL (Flajolet et al. 2007) with the standard
  * small-range linear-counting correction; 64-bit hashes need no
  * large-range correction. Relative error ≈ 1.04/√(2^p) — 1.6% at the
  * default p = 12 (4 KiB/key). Deterministic: same data → same registers
  * → same estimate, whatever the batch composition (register update is a
  * per-slot max, which is order- and batching-invariant — the spec pins
  * stream ≡ one-batch equality).
  */
object StreamingCardinality {

  /** One emission: key, events so far (every event for the key, NULL
    * values included — the raw throughput/volume signal), non-NULL-valued
    * events (the subset the estimate is built from), current distinct
    * estimate.
    */
  case class CardRow(key: String, n_events: Long, n_valued: Long,
      approx_distinct: Long)

  /** Internal keyed event (public: Catalyst codegen instantiates it).
    * `h` is None when the value was NULL — counted, never hashed.
    */
  case class CEv(key: String, h: Option[Long])

  /** Dense HLL registers + counters (all events / non-NULL-valued). */
  case class HllState(regs: Array[Byte], n: Long, nValued: Long)

  /** HLL estimate from dense registers (standard alpha_m + linear count). */
  private[streaming] def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  def distinctCountStream(events: DataFrame, key: Column, value: Column,
      p: Int = 12): Dataset[CardRow] = {
    require(p >= 4 && p <= 18, s"p must be in [4,18], got $p")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      // NULL values are excluded from HASHING but not from COUNTING:
      // xxhash64(NULL) returns the seed hash, which would count NULL as one
      // distinct value — while the batch twin
      // (Cardinality.approxDistinctProfile, i.e. approx_count_distinct)
      // ignores NULLs. Stream ≡ batch on nullable value columns therefore
      // requires NULLs out of the registers; but n_events is a
      // throughput/volume signal and must keep counting every event, so the
      // NULL-ness travels as a nullable hash (None) instead of a row filter.
      // n_valued carries the estimate's own denominator separately.
      .filter(key.isNotNull)
      .select(key.cast("string").as("key"),
        when(value.isNotNull, xxhash64(value)).as("h"))
      .as[CEv]
    val m = 1 << p
    base.groupByKey(_.key)
      .flatMapGroupsWithState[HllState, CardRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: String, it: Iterator[CEv], state: GroupState[HllState]) =>
          val st = state.getOption.getOrElse(HllState(new Array[Byte](m), 0L, 0L))
          val regs = st.regs.clone()
          var n = st.n
          var nValued = st.nValued
          it.foreach { ev =>
            n += 1
            ev.h.foreach { h =>
              nValued += 1
              val idx = (h >>> (64 - p)).toInt
              val rest = h << p
              // rank = leading zeros of the remaining bits + 1; all-zero rest
              // saturates at 64 - p + 1
              val rank =
                math.min(java.lang.Long.numberOfLeadingZeros(rest) + 1, 64 - p + 1)
              if (rank > regs(idx)) regs(idx) = rank.toByte
            }
          }
          state.update(HllState(regs, n, nValued))
          Iterator.single(CardRow(k, n, nValued, estimate(regs)))
      }
  }
}
