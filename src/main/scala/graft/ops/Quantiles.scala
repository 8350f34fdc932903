package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile profiling at corpus scale — the distribution-shaped sibling of
  * [[Cardinality.approxDistinctProfile]]: "where do the length/score/latency
  * percentiles sit per group" drives length-band design, batch packing,
  * outlier thresholds, and SLA dashboards, and at 100 TB the exact answer
  * (a full per-value histogram shuffle — what [[graft.extensions.Ensemble]]'s
  * robustScale and Layout.rangeBounds rightly pay for their one-off jobs)
  * is not what a per-refresh dashboard can afford.
  *
  * [[approxQuantileProfile]] answers with Spark's built-in Greenwald–Khanna
  * sketch (`percentile_approx`): mergeable map-side partials, one narrow
  * shuffle of fixed-size sketches per group, rank error bounded by
  * `n/accuracy`. Like x124's distinct audit, the ESTIMATE itself is
  * engine-specific (GK results depend on merge order, so cross-run/engine
  * equality is not a contract) and stays out of oracle-hashed columns; what
  * the profile emits and the oracle replays is the exact row count and the
  * in-plan VERDICT that every estimate's true rank sits inside its
  * guarantee envelope — computed against the exact per-value histogram in
  * the same job (the audit deliberately pays the exact pass to certify the
  * sketch; production reads drop the audit and keep the sketch).
  */
object Quantiles {

  /** Per (group, permille) audit row: `grp`, `pct_permille`, `n_rows`
    * (non-null values in the group), `approx_ok` — true iff the sketch
    * estimate's exact rank interval intersects
    * `[p·n − n/accuracy − 2, p·n + n/accuracy + 2]` (the GK guarantee with
    * 2 ranks of slack for the floor/ceil conventions at the extremes).
    *
    * Percentiles are INTEGER PERMILLE (500 = median) so the target rank
    * `pml·n` is exact integer arithmetic — no float rank targets; products
    * run in decimal(38,0) (≡ DuckDB HUGEINT), so no 2⁶³ envelope to
    * enforce. NULL values are excluded (aggregate semantics, same stance
    * as the distinct profile); NULL groups form their own group (`<=>`
    * audit join).
    *
    * Scale design: the sketch path is ONE map-side-combined aggregate —
    * corpus rows never shuffle, only ~KB sketches. The audit adds one
    * (group, value) histogram aggregate (per-VALUE memory, the robustScale
    * pattern) and an enum-scale broadcast join of the (group × permille)
    * estimate relation — nothing corpus-wide moves twice.
    */
  def approxQuantileProfile(df: DataFrame, group: Column, value: Column,
      permilles: Seq[Int], accuracy: Int = 10000): DataFrame = {
    require(permilles.nonEmpty, "need at least one permille point")
    require(permilles.forall(p => p >= 1 && p <= 999),
      s"permilles must be in [1,999], got $permilles")
    require(permilles.distinct == permilles, "duplicate permille points")
    require(accuracy >= 100 && accuracy <= 100000,
      s"accuracy must be in [1e2,1e5], got $accuracy")
    val base = df.select(group.as("grp"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val pmlArr = array(permilles.map(lit): _*)
    val est = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        percentile_approx(col("__v"),
          array(permilles.map(p => lit(p / 1000.0)): _*),
          lit(accuracy)).as("__ests"))
      .select(col("grp").as("__eg"), col("n_rows"),
        posexplode(col("__ests")))
      .select(col("__eg"), col("n_rows"),
        element_at(pmlArr, col("pos") + 1).as("pct_permille"),
        col("col").as("__est"))
    val hist = base.groupBy(col("grp"), col("__v"))
      .agg(count(lit(1)).as("__cnt"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    hist
      .join(broadcast(est), col("grp") <=> col("__eg"))
      .groupBy(col("grp"), col("pct_permille"), col("n_rows"))
      .agg(
        sum(when(col("__v") < col("__est"), col("__cnt")).otherwise(0L))
          .as("__rank_lt"),
        sum(when(col("__v") <= col("__est"), col("__cnt")).otherwise(0L))
          .as("__rank_le"))
      .withColumn("__eps",
        d(expr("1000 * n_rows div " + accuracy)) + d(lit(2000)))
      .withColumn("approx_ok",
        // the estimate's exact rank interval is [rank_lt + 1, rank_le]:
        // the INTERVAL must intersect [target − eps, target + eps], so the
        // minimum rank (rank_lt + 1, not rank_lt) bounds the upper side —
        // rank_lt alone would be one rank looser than the doc'd guarantee
        (d(col("__rank_lt")) + d(lit(1))) * d(lit(1000)) <=
          d(col("pct_permille")) * d(col("n_rows")) + col("__eps") &&
        d(col("__rank_le")) * d(lit(1000)) >=
          d(col("pct_permille")) * d(col("n_rows")) - col("__eps"))
      .select(col("grp"), col("pct_permille"), col("n_rows"), col("approx_ok"))
  }
}
