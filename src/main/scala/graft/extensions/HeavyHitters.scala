package graft.extensions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Frequent-item (heavy hitter) detection with a mergeable Count-Min sketch —
  * the streaming/approximate side of vocabulary profiling (Cormode &
  * Muthukrishnan 2005). The sketch aggregates with map-side combine and
  * merges associatively, so at 100 TB it behaves like any other mergeable
  * aggregate: a few KB of state per partition, one 1-row reduce — no
  * vocabulary-scale shuffle at all, which is the point: the exact top-k needs
  * a full token shuffle, the sketch answers membership/frequency queries
  * without one.
  *
  * Here the sketch AUDITS the exact path (same invariant-query pattern as the
  * HLL corpus profile): for every exact top-k item the CMS estimate must
  * bound the true count from above by at most `eps * totalCount` — the
  * one-sided CMS error guarantee. Both sides ship in one output so the
  * invariant is oracle-checkable.
  */
object HeavyHitters {

  /** Exact top-`k` items of `item` (count desc, item asc — total order), each
    * with its CMS estimate and the two CMS error-bound verdicts:
    * `cms_lower_ok` (estimate ≥ exact, deterministic guarantee) and
    * `cms_upper_ok` (estimate ≤ exact + eps·N, holds w.p. ≥ confidence per
    * query). Output is k rows — driver-side work is one sketch + k probes,
    * metadata-scale by construction.
    */
  def auditedTopK(df: DataFrame, item: Column, k: Int = 20,
      eps: Double = 0.0001, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val items = df.select(item.cast("string").as("__item")).filter(col("__item").isNotNull)
    // exact top-k: two-level hash aggregate + TakeOrdered(k) — the only
    // vocabulary-scale shuffle, with map-side combine
    val exact = items.groupBy("__item").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("__item")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // mergeable sketch: partial sketches combine associatively, 1-row result
    val skBytes = items
      .select(expr(s"count_min_sketch(__item, cast($eps as double), " +
        s"cast($confidence as double), $seed)").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(skBytes))
    val slack = math.ceil(eps * sk.totalCount()).toLong
    val rows = exact.map { case (tok, cnt) =>
      val est = sk.estimateCount(tok)
      (tok, cnt, est, est >= cnt, est <= cnt + slack)
    }
    import spark.implicits._
    rows.toSeq.toDF("item", "cnt", "cms_cnt", "cms_lower_ok", "cms_upper_ok")
  }
}
