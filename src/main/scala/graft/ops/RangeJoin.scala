package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: `points ⋈ intervals` on a key plus containment
  * `start <= t < end` — the standard "which window/config/session does each
  * observation fall in" alignment.
  *
  * Spark turns a raw range predicate into a broadcast-nested-loop (or worse,
  * a cartesian) because there is no equi-key. The binned formulation
  * manufactures one: time is quantized into fixed-width bins, each interval
  * is exploded into the bins it covers, each point falls in exactly one bin,
  * and the join runs as a plain hash equi-join on (key, bin) with the exact
  * containment predicate as a post-filter. Work is
  * |intervals|·(span/binWidth) + |points| — linear, shuffled once, never
  * |points|×|intervals-per-key|.
  *
  * `binWidthMicros` tunes replication vs selectivity: ~the typical interval
  * length is a good default (each interval then explodes into ~2 bins).
  * Output: one row per (point, containing interval) — a point inside several
  * overlapping intervals matches each once (exactly the SQL semantics).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: String, startCol: String, endCol: String,
      binWidthMicros: Long): DataFrame = {
    require(binWidthMicros > 0)

    val p = points.withColumn("__bin",
      floor(TimeCols.tsMicros(col(pointTime)) / binWidthMicros))
    val i = intervals
      // empty intervals ([s, e) with e <= s) match nothing — and would make
      // sequence() count DOWNWARD, exploding into bins they don't cover
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        floor(TimeCols.tsMicros(col(startCol)) / binWidthMicros),
        // end is exclusive: a zero-length interval still lands in its start bin
        floor((TimeCols.tsMicros(col(endCol)) - 1) / binWidthMicros))))

    p.join(i, Seq(key, "__bin"))
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bin")
  }
}
