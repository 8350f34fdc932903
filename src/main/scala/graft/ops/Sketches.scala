package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency and set-overlap sketching — the two mergeable-summary shapes
  * the cardinality (x124) and quantile (x126) profiles don't cover:
  *
  *   - [[countMinProfile]]: Count–Min (Cormode–Muthukrishnan 2005) point
  *     frequencies. Where SpaceSaving (HeavyHitters) answers "which keys are
  *     hot", CMS answers "how hot is THIS key" for every key, from a
  *     fixed-size counter grid that merges by cell-wise addition — the
  *     per-shard corpus statistic a 1000-executor fleet can build with one
  *     map-side-combined aggregate and union by '+'.
  *   - [[bottomKOverlap]]: bottom-k / KMV (Bar-Yossef et al. 2002) distinct
  *     sketches compared pair-wise for Jaccard overlap between corpus
  *     strata — "how much vocabulary do two sources share" without ever
  *     joining their vocabularies, from k longs per stratum.
  *
  * Both follow the engine's sketch-audit contract (x124/x126): the sketch
  * ESTIMATE is engine-specific (a function of the hash family, so no
  * cross-engine oracle can replay it) and stays out of hash-compared
  * columns; what the profile emits alongside it is exact-pass values and
  * in-plan VERDICT booleans certifying the sketch against its published
  * guarantee. The audit deliberately pays the exact computation; production
  * reads drop the audit columns and keep the sketch.
  */
object Sketches {

  /** Count–Min frequency profile over one term per row: per distinct term,
    * the exact count, the CMS estimate, and the audit verdict for the
    * sketch's DETERMINISTIC guarantee — a Count–Min estimate can never
    * undercount (every counter the term hashes to received at least all of
    * that term's own increments; taking the min cannot dip below them).
    * The symmetric ≤ exact + εN bound holds only with probability 1−δ and
    * is measured, not asserted: `overcount` carries est − exact so callers
    * (and the spec) can profile the error distribution.
    *
    * Output: (term, exact_count, cms_estimate, ge_ok).
    *
    * Scale design: the counter grid is `depth × width` cells — FIXED size,
    * independent of corpus rows — built by one aggregate whose map side
    * pre-combines per (row-of-grid, bucket); corpus rows cross the wire
    * once, `depth`-fold expanded but collapsing to ≤ depth·width rows per
    * task. The probe join broadcasts the grid (depth·width ≤ ~1e6 cells by
    * the require below), so the exact-count relation never shuffles twice.
    * Hash family: xxhash64(term, row) — one codegen'd expression, row index
    * as the seed channel.
    */
  def countMinProfile(df: DataFrame, term: Column, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 16 && width <= (1 << 20),
      s"width must be in [16,2^20], got $width")
    val terms = df.select(term.cast("string").as("term"))
      .filter(col("term").isNotNull)
    val seeded = terms
      .select(col("term"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", pmod(xxhash64(col("term"), col("row")), lit(width)))
    val grid = seeded.groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("__cnt"))
    val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("exact_count"))
    exact
      .select(col("term"), col("exact_count"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("bucket", pmod(xxhash64(col("term"), col("row")), lit(width)))
      .join(broadcast(grid), Seq("row", "bucket"))
      .groupBy(col("term"), col("exact_count"))
      .agg(min(col("__cnt")).as("cms_estimate"))
      .select(col("term"), col("exact_count"), col("cms_estimate"),
        (col("cms_estimate") >= col("exact_count")).as("ge_ok"),
        (col("cms_estimate") - col("exact_count")).as("overcount"))
  }

  /** Pair-wise distinct-set overlap between groups via bottom-k sketches:
    * for every unordered group pair, the exact distinct-term counts, exact
    * Jaccard, the k-minimum-values estimate, and the audit verdict that the
    * estimate sits within `envelope` of the exact value.
    *
    * Estimator: per group keep the k smallest xxhash64 values of its
    * distinct terms (one shared hash → sketches are comparable); for a pair,
    * the k smallest of the two sketches' union is a uniform sample of the
    * union, and the fraction of it present in BOTH sketches estimates
    * Jaccard (Bar-Yossef et al.; the MinHash bottom-k form). When a group
    * has fewer than k distinct terms its sketch IS its distinct set and the
    * estimate degrades gracefully toward exact. Standard error is
    * ~sqrt(J(1−J)/k); the default envelope is 5·sqrt(0.25/k) + 2/k —
    * 5 standard errors at the worst-case J plus the ±1-element edge effects.
    *
    * Output: (grp_a, grp_b, n_a, n_b, n_common, jaccard_exact, kmv_estimate,
    * approx_ok), one row per unordered pair, grp_a < grp_b.
    *
    * Scale design: the corpus collapses to distinct (group, term) once (one
    * shuffle, map-side combined); the bottom-k filter is a rank-k window per
    * group (WindowGroupLimit pushes the limit into the sort, so no group's
    * full vocabulary materializes); after that everything operates on
    * ≤ k longs per group — the pair relation is |groups|² arrays of k longs,
    * enum-scale. The exact audit join IS vocabulary-scale (that's the point
    * of the audit) and drops with it.
    */
  def bottomKOverlap(df: DataFrame, group: Column, term: Column, k: Int = 256,
      envelope: Double = Double.NaN): DataFrame = {
    require(k >= 16 && k <= 65536, s"k must be in [16,65536], got $k")
    val env = if (envelope.isNaN) 5.0 * math.sqrt(0.25 / k) + 2.0 / k
              else envelope
    val dist = df
      .select(group.cast("string").as("grp"), term.cast("string").as("term"))
      .filter(col("grp").isNotNull && col("term").isNotNull)
      .distinct()
    import org.apache.spark.sql.expressions.Window
    val sk = dist
      .withColumn("h", xxhash64(col("term")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("__rn") <= k)
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("h"))).as("hs"),
        count(lit(1)).as("__sk_n"))
    val exactN = dist.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    // vocabulary-scale self-join on term: post-aggregate relations carry no
    // stats, so without the hint Catalyst sort-merges — shuffled hash is the
    // engine-shape join here (both sides hash-partition on term, no sort)
    val exactPairs = dist.as("l").join(dist.hint("shuffle_hash").as("r"),
        col("l.term") === col("r.term") && col("l.grp") < col("r.grp"))
      .groupBy(col("l.grp").as("grp_a"), col("r.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    // every unordered pair (including zero-overlap ones exactPairs misses);
    // all relations from here down are enum-scale (|groups| or |groups|²
    // rows) — broadcast them explicitly, statsless as they are
    val allPairs = exactN.select(col("grp").as("grp_a"), col("n").as("n_a"))
      .join(broadcast(exactN.select(col("grp").as("grp_b"), col("n").as("n_b"))),
        col("grp_a") < col("grp_b"))
      .join(broadcast(exactPairs), Seq("grp_a", "grp_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
    val withSk = allPairs
      .join(broadcast(sk.select(col("grp").as("grp_a"), col("hs").as("ha"))),
        Seq("grp_a"))
      .join(broadcast(sk.select(col("grp").as("grp_b"), col("hs").as("hb"))),
        Seq("grp_b"))
    // merged bottom-k of the union; estimate = |merged ∩ A ∩ B| / |merged|
    withSk
      .withColumn("__merged",
        slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .withColumn("__both", array_intersect(col("ha"), col("hb")))
      .withColumn("kmv_estimate", round(
        size(array_intersect(col("__merged"), col("__both"))).cast("double") /
          size(col("__merged")), 6))
      .withColumn("jaccard_exact", round(
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6))
      .withColumn("approx_ok",
        abs(col("kmv_estimate") - col("jaccard_exact")) <= lit(env))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("n_common"), col("jaccard_exact"), col("kmv_estimate"),
        col("approx_ok"))
  }
}
