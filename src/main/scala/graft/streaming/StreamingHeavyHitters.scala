package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy-hitter tracking — the ingest-time twin of the batch
  * [[graft.extensions.HeavyHitters]]: which tokens/domains/keys dominate
  * the stream RIGHT NOW, without ever holding the vocabulary. Per hash
  * partition, a SpaceSaving summary (Metwally et al. 2005) of `capacity`
  * counters; each item is hashed to exactly ONE partition, so the classic
  * guarantees hold per partition and therefore globally:
  *   - any item with true count > n_part / capacity is in the summary;
  *   - for a tracked item, `est − err ≤ true ≤ est`.
  *
  * After every micro-batch each updated partition re-emits its full
  * summary stamped with `n_part` (events processed so far) — consumers
  * keep the latest stamp per partition and rank across partitions. The
  * emission is summary-sized (≤ capacity rows), not stream-sized.
  *
  * State design: ≤ `capacity` (item, count, err) counters per partition —
  * absolutely bounded, no timeout. Within a batch the group's items are
  * folded in arrival-iterator order; SpaceSaving is order-dependent only
  * in WHICH min-counter an eviction recycles, never in the bounds above,
  * and the spec pins the bound invariants rather than a specific victim.
  */
object StreamingHeavyHitters {

  /** One tracked counter of partition `part` as of `n_part` events. */
  case class HitterRow(part: Int, item: String, est: Long, err: Long,
    n_part: Long)

  /** Internal keyed event (public: Catalyst codegen instantiates it). */
  case class HEv(part: Int, item: String)

  /** SpaceSaving summary state: parallel item/count/err lists + total. */
  case class Summary(items: List[String], counts: List[Long],
    errs: List[Long], n: Long)

  def spaceSavingStream(events: DataFrame, item: Column,
      partitions: Int = 16, capacity: Int = 64): Dataset[HitterRow] = {
    require(partitions >= 1 && partitions <= 4096,
      s"partitions must be in [1,4096], got $partitions")
    require(capacity >= 2 && capacity <= 100000,
      s"capacity must be in [2,100000], got $capacity")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events
      .select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(pmod(xxhash64(col("item")), lit(partitions)).cast("int")
        .as("part"), col("item"))
      .as[HEv]
    base.groupByKey(_.part)
      .flatMapGroupsWithState[Summary, HitterRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (part: Int, it: Iterator[HEv], state: GroupState[Summary]) =>
          val s = state.getOption.getOrElse(Summary(Nil, Nil, Nil, 0L))
          val cnt = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
          s.items.lazyZip(s.counts).lazyZip(s.errs).foreach {
            (i, c, e) => cnt(i) = (c, e)
          }
          var n = s.n
          it.foreach { ev =>
            n += 1
            cnt.get(ev.item) match {
              case Some((c, e)) => cnt(ev.item) = (c + 1, e)
              case None if cnt.size < capacity => cnt(ev.item) = (1L, 0L)
              case None =>
                val (vic, (vc, _)) = cnt.minBy { case (i, (c, _)) => (c, i) }
                cnt.remove(vic)
                cnt(ev.item) = (vc + 1, vc)   // inherit the evicted mass
            }
          }
          state.update(Summary(cnt.keys.toList,
            cnt.values.map(_._1).toList, cnt.values.map(_._2).toList, n))
          cnt.iterator.map { case (i, (c, e)) =>
            HitterRow(part, i, c, e, n)
          }
      }
  }
}
