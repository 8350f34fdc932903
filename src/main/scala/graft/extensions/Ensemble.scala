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
    // r17: score once, rank many. Each rank pass used to re-derive its
    // (id, signal) projection from `df` — when the caller's signal columns
    // are expensive (x80: tokenize + entropy + an LM likelihood join), the
    // whole scoring pipeline re-ran once PER SIGNAL. The lazy checkpoint
    // materializes the narrow (id, signals…) relation on first use and the
    // remaining passes read its blocks; each signal's rank is computed from
    // the identical per-row values, so results are unchanged (guide §1.2).
    // EAGER checkpoint: the rank passes below run on driver threads (Par),
    // and materializing the scored relation once up front keeps them from
    // racing to compute it concurrently (harmless for values, wasteful for
    // work).
    val src = df.select(id.as("id") +:
        signals.map { case (name, sig) => sig.as(s"__sig_$name") }: _*)
      .localCheckpoint()
    // r17: each rank pass constructs eagerly (PrefixSum's totals collect);
    // the passes are independent given the materialized src, so overlap
    // them on driver threads (guide §2.6). Result order = signal order.
    val ranked = graft.ops.Par.seq(signals.map { case (name, _) => () =>
      Sampling.stratumPercentRank(
        src.select(col("id"), col(s"__sig_$name").as("__sig")),
        lit("all"), col("__sig"), col("id"), outCol = s"pct_$name")
        .drop("__sig")
    }: _*)
    val joined = ranked.reduce { (a, b) => a.join(b.hint("shuffle_hash"), Seq("id")) }
    val mean = signals.map { case (name, _) => col(s"pct_$name") }
      .reduce(_ + _) / lit(signals.size.toDouble)
    joined.withColumn("ensemble", round(mean, 6))
  }

  /** Quantile normalization of a per-group score onto the GLOBAL score
    * distribution — batch-effect correction for quality scorers: a scorer
    * systematically harsher on one source would otherwise make any global
    * threshold cut that source disproportionately. Each row's normalized
    * score is the global empirical quantile at its within-group percentile:
    * `qnorm = Q_global(pct_group(score))` with
    * `Q_global(p) = max{ score : F_global(score) ≤ p }`.
    *
    * Deterministic integer/6-dp construction: both percent ranks are
    * [[Sampling.stratumPercentRank]] (parallel-scan, tie-broken, round-6);
    * the quantile function is materialized on a fixed 1001-bin grid —
    * per-score global ranks collapse to (bin = floor(pct·1000), max score),
    * and empty bins inherit the highest lower bin via an enum²-bounded
    * grid⋈bins backward-fill join (1001 × |occupied bins|, broadcast — no
    * window over the grid, no SinglePartition). Bin 0 is always occupied
    * (the global minimum has pct 0), so every lookup lands.
    *
    * Scale shape: two rank passes over the (id, group, score) projection,
    * one enum-scale bin aggregate, the bounded grid fill, and one
    * shuffle_hash join of the corpus onto its 1001-row lookup. The corpus
    * is never windowed globally.
    *
    * Output: `id`, `grp`, `score` (as given, cast long), `src_pct`
    * (round-6 within-group rank), `qnorm` (the global score at that
    * percentile, long).
    */
  def quantileNormalize(df: DataFrame, id: Column, group: Column,
      score: Column): DataFrame = {
    val base = df.select(id.as("id"), group.as("grp"),
      score.cast("long").as("score"))
    val srcPct = Sampling.stratumPercentRank(base, col("grp"), col("score"),
      col("id"), outCol = "src_pct")
    val globPct = Sampling.stratumPercentRank(base, lit("all"), col("score"),
      col("id"), outCol = "__gpct")
    // per distinct score: its highest global rank → occupied grid bins
    val bins = globPct.groupBy(col("score").as("__s"))
      .agg(max(col("__gpct")).as("__gp"))
      .select(floor(col("__gp") * 1000).cast("long").as("__bin"), col("__s"))
      .groupBy("__bin").agg(max(col("__s")).as("__smax"))
    // backward fill on the 1001-bin grid: enum²-bounded broadcast theta join
    val grid = df.sparkSession.range(0, 1001).select(col("id").as("__b"))
      .join(broadcast(bins), col("__bin") <= col("__b"))
      .groupBy("__b").agg(max(col("__smax")).as("qnorm"))
    srcPct
      .withColumn("__b", floor(col("src_pct") * 1000).cast("long"))
      .join(grid.hint("shuffle_hash"), Seq("__b"))
      .select(col("id"), col("grp"), col("score"), col("src_pct"),
        col("qnorm"))
  }

  /** Median/MAD robust scaling per group — the outlier-immune alternative
    * to z-scores ([[Similarity.standardizeEmbeddings]]'s mean/stddev shape
    * breaks when a scraped source has a heavy length tail: one 10 MB page
    * drags the mean past most of the corpus). Per group: the exact median,
    * the median absolute deviation around it, and each row's robust score
    * `(v − med) / mad` (round-6; NULL when mad = 0 — a constant group has
    * no scale). No 1.4826 normal-consistency factor: the score is used for
    * rank/threshold decisions, not σ estimation.
    *
    * Scale design: two `percentile` aggregation passes (exact, map-side
    * combined on a per-VALUE histogram — memory is bounded by the distinct
    * value count of the signal, which for length/score signals is
    * range-bounded, not row-bounded) + two broadcast joins of the
    * group-level stats (groups are enum-scale by contract: sources, langs).
    */
  def robustScale(df: DataFrame, id: Column, group: Column,
      value: Column): DataFrame = {
    val base = df.select(id.as("id"), group.as("grp"),
      value.cast("double").as("v"))
    val med = base.groupBy("grp")
      .agg(expr("percentile(v, 0.5)").as("med"))
    val dev = base.join(broadcast(med), Seq("grp"))
      .withColumn("__ad", abs(col("v") - col("med")))
    val mad = dev.groupBy("grp")
      .agg(expr("percentile(__ad, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("grp"))
      .select(col("id"), col("grp"), col("v"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        round((col("v") - col("med")) / nullif(col("mad"), lit(0d)), 6)
          .as("robust_z"))
  }

  /** Cohen's kappa agreement audit between two BOOLEAN labelers — the QC
    * step before trusting a cheap label (a metadata rule, a fast classifier)
    * as a stand-in for an expensive one: raw agreement overstates accord
    * whenever the base rates are skewed; kappa discounts the agreement
    * chance alone would produce.
    *
    * One output row: the 2×2 confusion matrix, both keep rates, observed
    * agreement, and kappa — the latter from its EXACT integer form
    *
    * {{{
    *   kappa = (n·(tt+ff) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0))
    * }}}
    *
    * with `a1/a0, b1/b0` the marginal true/false counts. The num/den run
    * internally in DECIMAL(38,0) (n² would overflow BIGINT past ~3e9
    * labeled rows); the OUTPUT carries the raw confusion counts — the full
    * exact audit — and `kappa_micro`, one division + round. When either
    * rater is constant the denominator is 0 (chance
    * agreement is 1) — kappa is NULL and `degenerate` is true, never a
    * division blow-up. Rows where either label is NULL are excluded
    * pairwise and reported as `n_unlabeled`.
    *
    * Scale shape: ONE map-side-combined aggregate over the corpus, a 1-row
    * result; nothing shuffles but partial counters.
    */
  def raterAgreement(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val labeled = raterA.isNotNull && raterB.isNotNull
    def n(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val agg = df.agg(
      n(labeled).as("n"),
      n(!labeled).as("n_unlabeled"),
      n(labeled && raterA && raterB).as("n_tt"),
      n(labeled && raterA && !raterB).as("n_tf"),
      n(labeled && !raterA && raterB).as("n_ft"),
      n(labeled && !raterA && !raterB).as("n_ff"))
    // kappa's numerator/denominator contain n² and marginal products — at
    // corpus scale (n beyond ~3.0e9 labeled rows) those overflow BIGINT, so
    // they stay INTERNAL and run in DECIMAL(38,0) (exact to n ≈ 10¹⁹); the
    // output carries the raw confusion counts — the full exact audit any
    // consumer can re-derive kappa from — plus the micro rendering, whose
    // one decimal→double division is the only (documented) approximation.
    def d(c: Column): Column = c.cast("decimal(19,0)")
    val pe = (d(col("n_tt")) + col("n_tf")) * (d(col("n_tt")) + col("n_ft")) +
      (d(col("n_ft")) + col("n_ff")) * (d(col("n_tf")) + col("n_ff"))
    val num = d(col("n")) * (d(col("n_tt")) + col("n_ff")) - pe
    val den = d(col("n")) * d(col("n")) - pe
    agg
      .withColumn("po_micro",
        when(col("n") === 0L, lit(null).cast("long"))
          .otherwise(round((col("n_tt") + col("n_ff")).cast("double") /
            col("n") * 1e6).cast("long")))
      .withColumn("kappa_micro",
        when(den === lit(0), lit(null).cast("long"))
          .otherwise(round(num.cast("double") / den.cast("double") * 1e6)
            .cast("long")))
      .withColumn("degenerate", den === lit(0))
  }
}
