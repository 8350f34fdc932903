package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) matching: for each key, find the earliest
  * strictly-ordered occurrence of `steps` (e.g. view → click → purchase) and
  * report how far the key got. The standard product/conversion query, and at
  * corpus scale the same machinery audits pipeline event logs (received →
  * parsed → written).
  *
  * Semantics (greedy-earliest, the classic funnel definition): step 1 matches
  * at the key's MINIMUM step-1 timestamp t₁; step i+1 matches at the minimum
  * step-i+1 timestamp STRICTLY AFTER tᵢ. Greedy-earliest maximizes every
  * suffix's chance to match, so "completed k steps" is well-defined without
  * backtracking. An optional `horizonSeconds` bounds the WHOLE funnel:
  * step i must land within the horizon of t₁ (the common "converted within
  * 7 days" form). Ties inside one (key, step, timestamp) don't matter — the
  * minimum is unique by value.
  *
  * Scale shape: the scan is filtered to funnel-step events BEFORE any
  * movement (steps are a literal `isin` — the stream is step-sparse from the
  * scan on); each step is ONE map-side-combinable min-aggregate keyed by the
  * key, and consecutive steps meet in shuffle_hash equi-joins on the key
  * (key-scale relations, stat-less — unhinted they would sort-merge). No
  * window, no per-key event buffering, |steps| linear passes over the
  * step-sparse relation only.
  */
object Funnel {

  /** One row per key that reached step 1: `steps_completed` (1..|steps|),
    * per-step epoch-µs match times `t1..tN` (null once the funnel stalls),
    * and `completed` (reached every step). Keys with no step-1 event do not
    * appear (they are the "never entered" population, countable from the
    * source relation directly).
    */
  def funnel(events: DataFrame, key: Column, ts: Column, eventType: Column,
      steps: Seq[String], horizonSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val stepEvents = events
      .select(key.as("key"), TimeCols.tsMicros(ts).as("__us"), eventType.as("__et"))
      .filter(col("__et").isin(steps.map(s => s: Any): _*))
    // step 1: earliest occurrence per key
    val first = stepEvents.filter(col("__et") === steps.head)
      .groupBy("key").agg(min(col("__us")).as("t1"))
    val horizonCap: Column => Column = t1 => horizonSeconds match {
      case Some(h) => t1 + lit(h * 1000000L)
      case None    => lit(Long.MaxValue)
    }
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      // earliest `step` event strictly after the key's step-i time, within
      // the horizon of t1 — the aggregate runs on the (key, prev) pair so
      // the min is conditional without a second pass
      val nextT = stepEvents.filter(col("__et") === step)
        .join(acc.select(col("key"), col(prev), col("t1")).hint("shuffle_hash"), Seq("key"))
        .filter(col("__us") > col(prev) && col("__us") <= horizonCap(col("t1")))
        .groupBy("key").agg(min(col("__us")).as(cur))
      acc.join(nextT.hint("shuffle_hash"), Seq("key"), "left")
    }
      .withColumn("steps_completed",
        steps.indices.drop(1).foldLeft(lit(1L)) { (e, i) =>
          // t(i+1) can only exist if t(i) does, so the later step must be
          // the OUTERMOST when
          when(col(s"t${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(e)
        })
      .withColumn("completed", col(s"t${steps.size}").isNotNull)
  }
}
