package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling/splitting for training-data
  * pipelines.
  *
  * `df.sample()`/`randomSplit()` depend on partitioning and the JVM RNG — two
  * runs (or two engines) disagree, which is fatal for train/val/test splits
  * that must be stable across reprocessing runs of a 100 TB corpus. Here the
  * split is a pure function of the row's KEY: bucket = first 8 hex chars of
  * sha256(key ⊕ salt) mod 10000. Same key ⇒ same split, forever, on any
  * engine (the DuckDB oracle re-derives it), independent of partitioning,
  * row order, or cluster size. Salting gives independent re-draws (change the
  * salt ⇒ a fresh uncorrelated assignment).
  *
  * sha256 over a short key is scan-speed; the alternative (xxhash64) is
  * 4-5× cheaper but engine-specific — splits should be portable, so the
  * portable hash wins here (same trade as TextAnalysis.docFingerprint).
  */
object Sampling {

  private val Buckets = 10000L

  /** Uniform bucket in [0, 10000) derived from the key — the split primitive. */
  def hashBucket(key: Column, salt: String = ""): Column =
    conv(substring(sha2(concat(key.cast("string"), lit(salt)), 256), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Deterministic sample: keep ~`fraction` of rows, stable under reruns. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // round, don't truncate: 0.3*10000 is 2999.999… in double — toLong would
    // quietly under-sample and leave gap buckets in "sums to 1" splits
    df.filter(hashBucket(key, salt) < math.round(fraction * Buckets))
  }

  /** Deterministic weighted sample WITHOUT replacement, k per stratum —
    * Efraimidis–Spirakis (2006) A-ES: each row draws a uniform u from its
    * key and survives if `u^(1/w)` ranks in the stratum's top k. Inclusion
    * probability is proportional to weight in the without-replacement
    * sense, and the "randomness" is the same portable sha-derived uniform
    * as [[hashBucket]] — reruns, engines, and the DuckDB oracle all draw
    * identical samples (the xxhash64 family would be cheaper but
    * engine-specific; portability wins for split/sample primitives, the
    * [[hashBucket]] trade).
    *
    * Non-positive and NULL weights are excluded by contract (a zero weight
    * must never be sampled; A-ES keys aren't defined for w ≤ 0). Ties
    * (identical keys) break by id for engine determinism.
    *
    * Scale shape: one rank-k window per stratum over a scan-local key
    * computation — plans a WindowGroupLimit, so no stratum buffers more
    * than k rows per side of its shuffle (the fixedKPerStratum guard).
    *
    * Output: the stratum/id/weight columns of the kept rows.
    */
  def weightedSample(df: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int, salt: String = ""): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1,1e6], got $k")
    import org.apache.spark.sql.expressions.Window
    // u in (0,1): 8 sha hex chars → [0,2^32), +0.5 then /2^32 — strictly
    // inside the open interval, so pow(u, 1/w) is never 0^x or 1 exactly
    df.select(stratum.as("stratum"), id.as("id"),
        weight.cast("double").as("weight"))
      // NULL ids excluded by contract (mirrors StreamingWeightedSample):
      // a NULL id has no sha uniform, so its A-ES key is NULL — under
      // desc_nulls_last it sorts past every real key but could still be
      // EMITTED from a stratum with fewer than k eligible rows, breaking
      // stream ≡ batch parity on that edge
      .filter(col("stratum").isNotNull && col("id").isNotNull &&
        col("weight") > 0.0)
      .withColumn("__u", (conv(substring(sha2(concat(col("id").cast("string"),
        lit(salt)), 256), 1, 8), 16, 10).cast("double") + lit(0.5)) /
        lit(4294967296.0))
      .withColumn("__key", pow(col("__u"), lit(1.0) / col("weight")))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("stratum"))
        .orderBy(col("__key").desc, col("id"))))
      .filter(col("__rn") <= k)
      .select(col("stratum"), col("id"), col("weight"))
  }

  /** Stratified deterministic sample: a per-stratum keep fraction (e.g.
    * down-sample over-represented languages, keep rare ones whole — the
    * corpus-balancing op). Same hash-bucket determinism as
    * [[deterministicSample]]; strata not in `fractions` use `default`.
    */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
      fractions: Map[String, Double], default: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1))
    val bound = fractions.foldRight(lit(math.round(default * Buckets)): Column) {
      case ((stratum, f), elseCol) =>
        when(strata === stratum, lit(math.round(f * Buckets))).otherwise(elseCol)
    }
    df.filter(hashBucket(key, salt) < bound)
  }

  /** Deterministic epoch shuffle: a reproducible global permutation of the
    * corpus per training epoch — every epoch a fresh, uncorrelated order;
    * every rerun of the same epoch the SAME order, on any engine and any
    * cluster size. Data ordering is part of a training run's reproducibility
    * contract, and `df.orderBy(rand(seed))` breaks it (rand is
    * partitioning-dependent).
    *
    * Order key = sha256(key ⊕ epoch ⊕ salt) — same portable-hash trade as
    * [[hashBucket]]; `key` itself breaks the (hash-collision) ties so the
    * permutation is total when keys are unique (same caller contract as
    * [[graft.ops.SeqNumber]]). Output adds `epoch_pos` (1-based position in
    * the shuffled order) via the range-partitioned distributed numbering —
    * ONE sample-ranged shuffle, never a single-partition window; rows come
    * back physically sorted in shuffle order, ready for sequential write.
    */
  def epochShuffle(df: DataFrame, key: Column, epoch: Int,
      salt: String = ""): DataFrame = {
    val ord = sha2(concat_ws("|", key.cast("string"), lit(epoch.toString), lit(salt)), 256)
    graft.ops.SeqNumber.withGlobalSeq(
        df.withColumn("__shuffle_ord", ord), "epoch_pos",
        col("__shuffle_ord"), key)
      .drop("__shuffle_ord")
  }

  /** Disjoint named splits, e.g. `Seq("train" -> 0.9, "val" -> 0.05,
    * "test" -> 0.05)` → adds a `split` column. Fractions must sum to ≤ 1;
    * any remainder gets NULL (excluded rows).
    */
  def deterministicSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val bucket = hashBucket(key, salt)
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets) // see deterministicSample: round, not toLong
    }.tail
    val col0: Column = lit(null).cast("string")
    val assigned = splits.zip(bounds).foldRight(col0) {
      case (((name, _), upper), elseCol) =>
        when(bucket < upper, name).otherwise(elseCol)
    }
    df.withColumn("split", assigned)
  }

  /** Per-stratum TOKEN budget: keep, within each stratum (source, language,
    * …), the deterministically-first rows whose cumulative `weight` stays
    * within `budget` — the token-weighted refinement of a per-source doc cap
    * (a mixture recipe says "200 B tokens of web, 50 B of code", not "N
    * documents"). "First" = sha256(key ⊕ salt) order with `key` breaking
    * hash ties, so the kept set is a pure function of (corpus, salt, budget)
    * — same portable-order contract as [[epochShuffle]].
    *
    * Adds `cum_weight` (the running total INCLUDING the row — the kept set
    * is `cum_weight <= budget`, so one document never straddles the budget
    * line; the first over-budget document is dropped entirely, it doesn't
    * slide in partially).
    *
    * Scale shape: one range-partitioned parallel scan
    * ([[graft.ops.PrefixSum.withStratumCumsum]]) — a hot stratum spreads
    * over many range partitions instead of buffering in one window task,
    * and the driver only ever holds per-partition per-stratum totals.
    */
  def tokenBudgetCap(df: DataFrame, key: Column, stratum: Column,
      weight: Column, budget: Long, salt: String = ""): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    graft.ops.PrefixSum.withStratumCumsum(
        df.withColumn("__budget_ord",
          sha2(concat(key.cast("string"), lit(salt)), 256)),
        stratum, weight, "cum_weight", col("__budget_ord"), key)
      .filter(col("cum_weight") <= budget)
      .drop("__budget_ord")
  }

  /** Per-stratum percentile rank — the normalization that makes one quality
    * threshold mean the same thing across sources (a raw score cut keeps 90%
    * of one source and 10% of another; a percentile cut keeps the same
    * fraction everywhere). Semantics are SQL `percent_rank()` over
    * `(value, tieBreak)` within each stratum: `(seq − 1) / (n − 1)`,
    * 0 for singleton strata, rounded to 6 dp for engine-stable downstream
    * thresholds. `(value, tieBreak)` must totally order rows within a
    * stratum.
    *
    * Scale shape: the within-stratum sequence is
    * [[graft.ops.PrefixSum.withStratumCumsum]]'s range-partitioned parallel
    * scan (never a per-stratum window — a hot source would buffer its whole
    * partition in one WindowExec task); stratum counts are an enum-scale
    * aggregate that broadcasts back.
    */
  def stratumPercentRank(df: DataFrame, stratum: Column, value: Column,
      tieBreak: Column, outCol: String = "pct_rank"): DataFrame = {
    val seqd = graft.ops.PrefixSum.withStratumCumsum(df, stratum, lit(1L),
      "__seq", value, tieBreak)
    val counts = seqd.groupBy(stratum.as("__st")).agg(count(lit(1)).as("__n"))
    seqd.join(broadcast(counts), stratum === col("__st"))
      .withColumn(outCol, when(col("__n") === 1L, lit(0.0))
        .otherwise(round((col("__seq") - 1L).cast("double") / (col("__n") - 1L), 6)))
      .drop("__st", "__n", "__seq")
  }

  /** Leakage-free train/val/test split: the unit of assignment is the
    * NEAR-DUP CLUSTER, not the document. A row-level [[deterministicSplit]]
    * happily puts two near-identical documents on opposite sides of the
    * train/val line — the classic eval-contamination bug that inflates every
    * metric downstream; here all members of a connected near-dup component
    * hash to the same split because the split key IS the component id.
    *
    * `pairs` is any candidate pair relation over `id` ([[Dedup.minhashPairs]]
    * at scale, [[Dedup.ngramJaccardPairs]] when the oracle needs to re-derive
    * it). Singletons (docs in no pair) are their own component. Output: the
    * input columns + `component` + `split`.
    *
    * Scale shape: component resolution is [[Dedup.resolveClusters]]' measured
    * machinery (pointer-jumping components, broadcast-vs-shuffle-hash cutover
    * on edge count); the split itself is a pure sha-bucket expression on the
    * component id — no extra shuffle beyond the cluster tagging join.
    */
  def clusterAwareSplit(df: DataFrame, id: Column, pairs: DataFrame,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame =
    deterministicSplit(
      Dedup.resolveClusters(df, id, id, pairs)
        .drop("cluster_size", "is_survivor"),
      col("component"), splits, salt)

  /** Deterministic systematic probability-proportional-to-size sampling —
    * the zero-RNG weighted sampler: lay every row's weight as an interval on
    * the cumulative-weight axis (in portable sha(key ⊕ salt) order, the
    * [[epochShuffle]] contract), probe the axis at `k` mid-grid points
    * `t_j = ⌊W·(2j+1) / 2k⌋`, and emit one `(sample_idx = j, row)` hit per
    * probe. Classic systematic PPS: inclusion probability ∝ weight; a row
    * heavier than the W/k grid step is hit by SEVERAL consecutive probes
    * (its multiplicity is its expected count — that is the with-replacement
    * analog a token-weighted mixture wants, not a bug), zero-weight rows are
    * never hit. Exactly `k` output rows whenever total weight W > 0; empty
    * output when W = 0.
    *
    * Every step is integer arithmetic on BIGINTs — the probe-hit range per
    * row is solved in closed form (`jmin/jmax` below), so results are
    * bit-identical in any engine. Caller contract: weights are clamped to
    * ≥ 0 (null → 0), and `2·k·W` must stay under 2⁶³ (at k = 10⁴ that is
    * W < 4.6·10¹⁴ — a 460-trillion-token corpus). The W bound is ENFORCED
    * at the 1-row total aggregate with raise_error (the shared overflow
    * contract): an out-of-envelope corpus fails loudly instead of silently
    * wrapping every probe position.
    *
    * Scale shape: one range-partitioned parallel scan for the cumsum
    * ([[graft.ops.PrefixSum.withGlobalCumsum]] — never a single-partition
    * window), the total W as an in-plan broadcast 1-row aggregate, then the
    * probe-hit range is SCAN-LOCAL per row (closed-form integer bounds +
    * `sequence` explode emitting ≤ ⌈k·w/W⌉+1 hits per row, k total) — no
    * join against a probe table, no shuffle after the scan.
    */
  /** Deterministic fixed-k sample PER STRATUM — "give me exactly k spot-
    * check docs from every (lang, source) cell", the eval/annotation
    * counterpart of the rate-based [[stratifiedSample]]: rates under-fill
    * small strata and over-fill big ones, a fixed k does neither. Zero
    * RNG: rows are ranked inside their stratum by `sha256(key ⊕ salt)`
    * (ties broken by the key itself, so the rank is total) and the first
    * k survive — reruns, re-partitioning, and any other engine reproduce
    * the exact same sample, and a different `salt` draws an independent
    * one.
    *
    * Scale design: ONE hash shuffle on the stratum and a per-stratum sort
    * for the rank window — the canonical per-key top-k shape; no global
    * window, no join. A stratum's partition holds that stratum's rows
    * (the quantity any per-stratum sampler must see); for corpus-scale
    * strata prefer rate-based sampling — fixed-k is for cells you can
    * enumerate.
    *
    * Output: the sampled rows with `sample_rank` (1..k within stratum).
    */
  def fixedKPerStratum(df: DataFrame, stratum: Column, key: Column, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1,1e6], got $k")
    val ord = sha2(concat(key.cast("string"), lit(salt)), 256)
    val w = Window.partitionBy(stratum)
      .orderBy(ord.asc, key.cast("string").asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  def systematicSample(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val clamped = df
      .withColumn("__w", greatest(coalesce(weight.cast("long"), lit(0L)), lit(0L)))
      .withColumn("__sys_ord",
        sha2(concat(key.cast("string"), lit(salt)), 256))
    val cum = graft.ops.PrefixSum.withGlobalCumsum(clamped, col("__w"),
      "__cum", col("__sys_ord"), key)
    val twoK = 2L * k
    val wBound = Long.MaxValue / twoK
    val total = cum.agg(coalesce(max(col("__cum")), lit(0L)).as("__t0"))
      .select(when(col("__t0") <= wBound, col("__t0"))
        .otherwise(raise_error(concat(
          lit(s"Sampling.systematicSample: total weight exceeds the " +
            s"overflow-safe bound $wBound for k=$k (2kW must stay under " +
            s"2^63); got "),
          col("__t0").cast("string")))).as("__tot"))
    cum.crossJoin(broadcast(total))
      .filter(col("__tot") > 0L && col("__w") > 0L)
      .withColumn("__lo", col("__cum") - col("__w"))
      // jmin = smallest j with t_j >= lo: ceil((2k·lo − W) / 2W), floored at 0
      .withColumn("__n0", lit(twoK) * col("__lo") - col("__tot"))
      .withColumn("__jmin", when(col("__n0") <= 0L, lit(0L))
        .otherwise(expr("(__n0 + 2 * __tot - 1) div (2 * __tot)")))
      // jmax = largest j with t_j < hi: ceil((2k·hi − W) / 2W) − 1 (≤ k−1 by
      // construction since hi ≤ W)
      .withColumn("__n1", lit(twoK) * col("__cum") - col("__tot"))
      .withColumn("__jmax",
        expr("(__n1 + 2 * __tot - 1) div (2 * __tot)") - 1L)
      .filter(col("__jmax") >= col("__jmin"))
      .withColumn("sample_idx",
        explode(sequence(col("__jmin"), col("__jmax"))))
      .drop("__w", "__sys_ord", "__cum", "__tot", "__lo", "__n0", "__jmin",
        "__n1", "__jmax")
  }
}
