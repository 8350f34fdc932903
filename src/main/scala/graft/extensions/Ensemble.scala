package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-based ensembling of quality signals — the FineWeb-Edu-style move of
  * combining heterogeneous scorers (heuristic quality, LM likelihood, token
  * entropy, …) on a COMMON scale: each signal is converted to its global
  * percent rank and the ensemble is the mean of ranks. Rank normalization is
  * the point — raw signals live on incomparable scales (a logprob is not a
  * [0,1] heuristic), and any weighted sum of raws silently lets the
  * widest-variance signal win.
  */
object Ensemble {

  /** Per-row percent rank of every named signal plus their mean.
    *
    * Each signal's rank comes from [[Sampling.stratumPercentRank]] under a
    * constant stratum — i.e. the GLOBAL percent_rank (ties broken by
    * `tieBreak`, so the rank is engine-deterministic), computed on the
    * range-partitioned parallel scan, never a single-partition window.
    * Output: (id, pct_<name>… , ensemble) with `ensemble` the 6-dp-rounded
    * mean of the per-signal ranks.
    *
    * Scale shape: |signals| parallel-scan rank passes over the projected
    * (id, signal) relation, re-joined on the id via shuffle_hash (doc-scale,
    * stat-less intermediates). The input `df` should already carry the
    * signal columns — this operator ranks and blends, it does not score.
    */
  def rankEnsemble(df: DataFrame, id: Column,
      signals: Seq[(String, Column)]): DataFrame = {
    require(signals.nonEmpty, "rankEnsemble needs at least one signal")
    require(signals.map(_._1).distinct.size == signals.size,
      "signal names must be distinct")
    val ranked = signals.map { case (name, sig) =>
      Sampling.stratumPercentRank(
        df.select(id.as("id"), sig.as("__sig")),
        lit("all"), col("__sig"), col("id"), outCol = s"pct_$name")
        .drop("__sig")
    }
    val joined = ranked.reduce { (a, b) => a.join(b.hint("shuffle_hash"), Seq("id")) }
    val mean = signals.map { case (name, _) => col(s"pct_$name") }
      .reduce(_ + _) / lit(signals.size.toDouble)
    joined.withColumn("ensemble", round(mean, 6))
  }
}
