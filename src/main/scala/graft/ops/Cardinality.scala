package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality profiling at corpus scale — "how many distinct values does
  * this column hold per group" is the question behind vocabulary sizing,
  * join-strategy picks, blocking-key design, and dedup-rate dashboards,
  * and at 100 TB the EXACT answer (a distinct shuffle over the corpus) is
  * exactly what you cannot afford per dashboard refresh.
  *
  * [[approxDistinctProfile]] answers it with Spark's built-in
  * HyperLogLog++ aggregate (`approx_count_distinct`): sketch-mergeable
  * (partial aggregation works map-side like any sum), one narrow shuffle
  * of fixed-size sketches per group, RELATIVE-error-bounded by `rsd`
  * (default 5%). The estimate is DETERMINISTIC for a given dataset —
  * HLL++ is hash-based, no RNG — so the same corpus always profiles to
  * the same numbers (the engine's reproducibility contract), and the
  * x124 audit query pins the estimate against the exact distinct count
  * inside the error envelope on every oracle run.
  *
  * Scale design: map-side partial sketches (HLL registers, ~1.5 KB at 5%
  * rsd) merge in ONE groupBy — corpus rows never shuffle, only sketches;
  * contrast with exact `countDistinct`, which expands to a two-phase
  * (group, value)-distinct shuffle of the full value set. No windows, no
  * joins, no driver state.
  */
object Cardinality {

  /** Per-group cardinality profile: `grp`, `n_rows`, `approx_distinct`
    * (HLL++ estimate at `rsd`), `density_ppm` (approx_distinct per million
    * rows — 1e6 means all-unique, small means heavy duplication). NULL
    * values are not counted as a distinct value (Spark aggregate
    * semantics); NULL groups form their own group (real bucket).
    */
  def approxDistinctProfile(df: DataFrame, group: Column, value: Column,
      rsd: Double = 0.05): DataFrame = {
    require(rsd >= 0.000017 && rsd <= 0.4, // Spark's HLL++ supported range
      s"rsd must be in [1.7e-5, 0.4], got $rsd")
    df.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        approx_count_distinct(value, rsd).as("approx_distinct"))
      .select(col("grp"), col("n_rows"), col("approx_distinct"),
        // integral ppm (Column `/` would be double division)
        expr("approx_distinct * 1000000 div greatest(n_rows, 1)")
          .as("density_ppm"))
  }
}
