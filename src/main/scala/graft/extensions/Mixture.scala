package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling: down-sample groups (languages, sources,
  * domains) so the KEPT corpus matches target proportions — the "data mixture
  * weights" step every pretraining pipeline runs before tokenization (the
  * mixture tables of GPT-3/LLaMA-style training setups).
  *
  * Semantics, all in integer arithmetic so any engine re-derives the exact
  * same decisions (the DuckDB oracle does):
  *   - target shares are parts-per-million per group;
  *   - `T = min over groups of floor(n_g * 1e6 / share_g)` is the largest
  *     total corpus size whose mixture is achievable without up-sampling any
  *     group (the binding group is kept whole);
  *   - per-group keep target `k_g = floor(share_g * T / 1e6)`, applied as a
  *     [[Sampling.hashBucket]] threshold `floor(k_g * 10000 / n_g)` — the
  *     same engine-portable sha-bucket primitive as the split operators, so
  *     membership is a pure function of the row key and survives reruns,
  *     repartitions, and engine swaps.
  *
  * Scale shape: group cardinalities come from one map-side-combined count
  * aggregate whose result is ENUM-scale (one row per group — languages,
  * sources), collected to the driver to fold the thresholds into the plan as
  * literals; the corpus itself is never shuffled — the keep decision is a
  * narrow per-row filter expression. Unknown groups (no share entry) are
  * dropped, mirroring mixture tables which enumerate their sources.
  */
object Mixture {

  /** Adds `bucket` and `kept` to every row of `df`. `sharesPpm` values should
    * sum to ≤ 1e6; groups absent from the map get `kept = false`. */
  def sampleToMixture(df: DataFrame, key: Column, group: Column,
      sharesPpm: Map[String, Long], salt: String = ""): DataFrame = {
    require(sharesPpm.values.forall(s => s > 0 && s <= 1000000L),
      "shares must be in (0, 1e6] ppm")
    val counts = df.groupBy(group.as("__g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = sharesPpm.filter { case (g, _) => counts.getOrElse(g, 0L) > 0 }
    // largest achievable mixture total: the binding group is kept whole
    val t: Long = if (present.isEmpty) 0L
      else present.map { case (g, ppm) => counts(g) * 1000000L / ppm }.min
    // fold per-group bucket thresholds into the plan as a literal CASE —
    // no join, no broadcast, just a codegen'd scalar expression
    val thresh: Column = present.foldRight(lit(-1L): Column) {
      case ((g, ppm), elseCol) =>
        val kg = ppm * t / 1000000L
        when(group === g, lit(kg * 10000L / counts(g))).otherwise(elseCol)
    }
    df.withColumn("bucket", Sampling.hashBucket(key, salt))
      .withColumn("kept", col("bucket") < thresh)
  }

  /** Up-sampling counterpart of [[sampleToMixture]] — the "repeat Wikipedia
    * 3.2× per epoch" half of a mixture recipe, which down-sampling cannot
    * express. Each row yields `floor(factor)` copies plus one more iff its
    * sha-bucket falls under the fractional part, so the expected multiplier
    * is exactly `factor` and every decision is a pure function of
    * (key, salt) — reruns, repartitions and engines agree on the exact copy
    * set, not just its size. Rows with `factor < 1` behave as a
    * deterministic down-sample (kept with probability `factor`), making
    * this a superset of per-row keep/drop.
    *
    * Output: the input columns + `copy` (1-based). Scale shape: one narrow
    * `explode(sequence(...))` — scan-local row expansion, no join, no
    * shuffle, no driver state. `factor` is any per-row Column (a literal
    * per-source CASE, or [[temperatureWeights]]-derived).
    */
  def upsamplePlan(df: DataFrame, key: Column, factor: Column,
      salt: String = ""): DataFrame = {
    val base = floor(factor).cast("long")
    val fracThresh = round((factor - floor(factor)) * 10000, 0).cast("long")
    val n = base +
      (Sampling.hashBucket(key, salt) < fracThresh).cast("long")
    df.withColumn("copy",
      explode(when(n >= 1L, sequence(lit(1L), n))
        .otherwise(array().cast("array<long>"))))
  }

  /** Temperature-scaled mixture weights (the multilingual-corpus balancing
    * rule: sampling probability ∝ (n_g/N)^α, α < 1 flattens the head and
    * lifts the tail — α = 1 is proportional, α = 0 uniform). Returns one row
    * per group with the normalized weight, the expected document count under
    * a total `budget`, and the per-group up/down-sampling factor to feed
    * [[upsamplePlan]].
    *
    * Engine-stable float contract: each group's unnormalized term
    * `round((n_g/N)^α, 6)` is cast to DECIMAL(18,6) and the normalizer is
    * the EXACT decimal sum, so the weights are reproducible regardless of
    * aggregation order (DuckDB re-derives them bit-for-bit). `expected_docs`
    * floors `weight × budget` — a deterministic integer on both engines.
    *
    * Scale shape: the input is scanned once into an enum-scale count
    * aggregate (one row per language/source); everything downstream is two
    * bounded 1-row aggregates broadcast back over the ≤|groups|-row relation.
    * The corpus itself is never shuffled.
    */
  def temperatureWeights(df: DataFrame, group: Column, alpha: Double,
      budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint() // enum-scale; one materialization feeds both aggs
    val total = counts.agg(sum(col("n_docs")).cast("double").as("__N"))
    val terms = counts.crossJoin(broadcast(total))
      .withColumn("__term",
        round(pow(col("n_docs").cast("double") / col("__N"), alpha), 6)
          .cast("decimal(18,6)"))
    val norm = terms.agg(sum(col("__term")).as("__S"))
    terms.crossJoin(broadcast(norm))
      .withColumn("weight",
        round(col("__term").cast("double") / col("__S").cast("double"), 6))
      .withColumn("expected_docs",
        floor(col("weight") * lit(budget)).cast("long"))
      .withColumn("up_factor",
        round(col("expected_docs").cast("double") /
          col("n_docs").cast("double"), 6))
      .select("grp", "n_docs", "weight", "expected_docs", "up_factor")
  }

  /** Token-budget waterfilling under per-source caps — the mixture-recipe
    * allocator: spread `budget` tokens across sources, no source above its
    * own token count (its cap), small sources taken whole, the rest leveled
    * equally. The waterfill solution is `alloc_g = min(cap_g, L)` with the
    * water level `L` chosen so the total exhausts the budget.
    *
    * Deterministic integer construction (no sort, no iteration): a boundary
    * candidate is every cap value c (plus a −1 sentinel). For each,
    * `capsum(c) = Σ_{cap ≤ c} cap` and `ngt(c) = #{cap > c}` come from one
    * enum²-bounded broadcast self-aggregate; c is CONSISTENT when
    * `capsum(c) ≤ budget` and `L(c) = (budget − capsum(c)) div ngt(c) ≥ c`
    * (every uncapped source really holds more than the level). The true
    * boundary is the maximum consistent `(c, grp)` — lower consistent
    * boundaries under-fill, higher ones overdraw — picked by one 1-row
    * max-struct aggregate and broadcast back. Integral `div` floors the
    * level, so up to `ngt−1` tokens stay unallocated (documented; exact in
    * both engines). `ngt = 0` (budget covers everything) allocates every
    * cap in full.
    *
    * Scale shape: the corpus collapses to the enum-scale (grp, cap)
    * relation in one aggregate; everything after is enum²-bounded broadcast
    * joins — the corpus itself is never shuffled, nothing collects.
    *
    * Output: one row per group: `grp`, `cap_tokens`, `alloc_tokens`,
    * `at_cap` (fully taken).
    */
  def waterfillAllocation(df: DataFrame, group: Column, tokens: Column,
      budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative, got $budget")
    val caps = df.groupBy(group.as("grp"))
      .agg(sum(tokens.cast("long")).as("cap"))
      .localCheckpoint()      // enum-scale; feeds boundaries + final alloc
    val bounds = caps.select(col("cap").as("c"), col("grp").as("bgrp"))
      .unionAll(caps.sparkSession.range(1)
        .select(lit(-1L).as("c"), lit("").as("bgrp")))
    val stats = bounds
      .crossJoin(broadcast(caps.select(col("cap").as("__cap"))))
      .groupBy(col("c"), col("bgrp"))
      .agg(sum(when(col("__cap") <= col("c"), col("__cap")).otherwise(0L))
        .as("capsum"),
        sum(when(col("__cap") > col("c"), 1L).otherwise(0L)).as("ngt"))
    val consistent = stats
      .withColumn("lvl", when(col("ngt") > 0L,
        expr(s"($budget - capsum) div ngt")).otherwise(lit(null).cast("long")))
      .filter(col("capsum") <= budget &&
        (col("ngt") === 0L || col("lvl") >= col("c")))
    val boundary = consistent
      .agg(max(struct(col("c"), col("bgrp"), col("lvl"))).as("__b"))
      .select(col("__b.lvl").as("__lvl"))
    caps.crossJoin(broadcast(boundary))
      .select(col("grp"), col("cap").as("cap_tokens"),
        least(col("cap"), coalesce(col("__lvl"), col("cap")))
          .as("alloc_tokens"))
      .withColumn("at_cap", col("alloc_tokens") === col("cap_tokens"))
  }

  /** Mixture-concentration audit — per group, how dominated is it by its
    * categories (per lang: how concentrated over sources; per corpus: over
    * domains)? The balance dashboard behind blocklist / per-source-cap
    * decisions: a lang whose HHI ≈ 1 is one scraper's output, whatever its
    * row count says. Emits per group: `n_rows`, `n_cats`, `top_share`
    * (modal category's share), `hhi` (Σ share² — Herfindahl), `entropy`
    * (nats) and `norm_entropy` (entropy / ln n_cats; NULL for a single
    * category — a one-category group has no normalizable spread). All
    * round-6; shares derive from one counts pass via
    * `H = ln n − Σ c·ln c / n`, so no per-category second scan.
    *
    * Scale design: one (group, category) count aggregation (map-side
    * combined) followed by a group-level re-aggregation — two narrow
    * shuffles on keys no wider than the group enum; no windows, no joins.
    */
  def concentrationProfile(df: DataFrame, group: Column,
      category: Column): DataFrame = {
    val counts = df.groupBy(group.as("grp"), category.as("cat"))
      .agg(count(lit(1)).as("__c"))
    // c² and n_rows² in decimal(38,0)/double: a single cell past ~3·10⁹
    // rows would silently wrap a Long c·c (and n_rows·n_rows) — the same
    // overflow class the Anomaly/Drift/Decay envelopes guard. Here no
    // envelope is needed: decimal removes the cliff entirely and the
    // outputs are already round-6 doubles.
    counts.groupBy("grp")
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_cats"),
        max(col("__c")).as("__mx"),
        sum((col("__c").cast("decimal(38,0)") * col("__c"))).as("__ss"),
        sum(col("__c").cast("double") * log(col("__c").cast("double")))
          .as("__slc"))
      .select(col("grp"), col("n_rows"), col("n_cats"),
        round(col("__mx").cast("double") / col("n_rows"), 6).as("top_share"),
        round(col("__ss").cast("double") /
          (col("n_rows").cast("double") * col("n_rows")), 6).as("hhi"),
        round(log(col("n_rows").cast("double")) -
          col("__slc") / col("n_rows"), 6).as("entropy"),
        round((log(col("n_rows").cast("double")) -
          col("__slc") / col("n_rows")) /
          nullif(log(col("n_cats").cast("double")), lit(0d)), 6)
          .as("norm_entropy"))
  }
}
