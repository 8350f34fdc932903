package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two corpus slices — the
  * regression gate a recurring ingest pipeline runs before accepting a new
  * crawl snapshot: has the per-group length/score distribution moved?
  *
  * Two-sample Kolmogorov–Smirnov statistic per group, computed exactly and
  * integrally: `D = max_x |F_A(x) − F_B(x)|` is evaluated as the BIGINT
  * `max |cumA(x)·n_B − cumB(x)·n_A|` over the merged value support, so the
  * result is bit-identical in any engine (`D = ks_scaled / (n_A·n_B)`).
  * Overflow envelope (ENFORCED, not advisory — the same raise_error
  * contract as [[graft.ops.Anomaly.rollingZScore]]): every product is
  * bounded by n_A·n_B, so the operator requires n_A ≤ ⌊(2⁶³−1)/n_B⌋ per
  * group — slice sizes up to ~3·10⁹ rows per group. A group beyond that
  * fails the job loudly (exactly as ANSI mode and the DuckDB oracle's
  * BIGINT casts would) instead of silently wrapping the statistic.
  *
  * Scale design: one aggregate collapses the corpus to per-(group, value)
  * counts — the window then runs over the DISTINCT-VALUE relation, whose
  * per-group width is the value cardinality (length bands, score grids:
  * thousands), not the corpus. One hash shuffle, one bounded sort per
  * group, a final per-group max. No per-row window over raw data.
  */
object Drift {

  /** KS drift of integer `value` between the `isB = false` slice (A) and
    * the `isB = true` slice (B) of each `group`. Rows with NULL value or
    * NULL `isB` are excluded (no slice membership). Groups where either
    * slice is empty are reported with `ks_scaled = NULL` (KS undefined
    * against an empty sample) rather than dropped.
    *
    * Output: one row per group: `grp`, `n_a`, `n_b`, `ks_scaled`
    * (= D·n_a·n_b, exact integer).
    */
  def ksDrift(df: DataFrame, group: Column, value: Column,
      isB: Column): DataFrame = {
    val base = df
      .select(group.as("grp"), value.cast("long").as("v"),
        isB.cast("boolean").as("b"))
      .filter(col("v").isNotNull && col("b").isNotNull)
    val perValue = base.groupBy(col("grp"), col("v"))
      .agg(sum(when(!col("b"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("b"), 1L).otherwise(0L)).as("__cb"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-group totals via an unbounded frame over the SAME partitioning —
    // reuses the one hash shuffle instead of a second aggregate + join
    val wAll = Window.partitionBy(col("grp"))
    val cums = perValue
      .withColumn("__cumA", sum(col("__ca")).over(w))
      .withColumn("__cumB", sum(col("__cb")).over(w))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
    // enforced envelope: cum·total products are bounded by n_a·n_b, so
    // n_a ≤ (2⁶³−1) div n_b guarantees every Long product below is exact.
    // INTEGRAL `div`, not Column `/`: double division rounds the quotient
    // near 2⁶³ (ulp ≈ 1024 there), which could admit n_a values whose
    // products slightly overflow — the same double-division pitfall the
    // round-10 prefix-length fix in Dedup.prefixJaccardPairs closed
    val safe = col("__na") <=
      expr("9223372036854775807 div greatest(__nb, CAST(1 AS BIGINT))")
    val term = when(safe,
      abs(col("__cumA") * col("__nb") - col("__cumB") * col("__na")))
      .otherwise(raise_error(concat(
        lit("Drift.ksDrift: n_a*n_b exceeds 2^63-1 for group "),
        col("grp").cast("string"),
        lit(" — the integral KS product would overflow; split or band the slices"))))
    cums.groupBy(col("grp"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(term).as("__d"))
      .select(col("grp"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, col("__d"))
          .otherwise(lit(null).cast("long")).as("ks_scaled"))
  }

  /** Chi-square contingency audit — [[ksDrift]]'s categorical sibling: is
    * `category`'s distribution independent of `group` (is the lang mix the
    * same across sources)? Per group: its row count and its χ² contribution
    * `Σ_cats (o − e)² / e` with `e = rowTot·colTot / N`; the full test
    * statistic is the sum over groups against `(R−1)(C−1)` degrees of
    * freedom (emitted as `dof` on every row). Groups/categories absent from
    * a cell contribute their expected mass via the dense cell grid — a
    * structurally-zero cell is real evidence of dependence, not a skipped
    * term.
    *
    * All inputs to the float expression are EXACT integer counts (o, row
    * totals, col totals, N), so per-cell terms are engine-deterministic;
    * only the ≤|cats| per-group summation is float, round-6 at the edge.
    *
    * Scale design: one (group, category) counts pass; margins re-aggregate
    * from it (enum-scale relations); the dense grid is the enum×enum
    * broadcast cross of the two margin relations joined back to observed
    * counts — never a corpus-sized join.
    */
  def chi2Contingency(df: DataFrame, group: Column,
      category: Column): DataFrame = {
    // NULL group/category rows are excluded up front: groupBy would keep
    // them as values but the dense-grid equi-join back cannot match NULL
    // keys, so their observed mass would silently vanish from o while
    // still inflating the margins — exactly the wrong direction for a
    // test statistic. No cell membership without both labels.
    val cells = df
      .select(group.as("grp"), category.as("cat"))
      .filter(col("grp").isNotNull && col("cat").isNotNull)
      .groupBy(col("grp"), col("cat"))
      .agg(count(lit(1)).as("__o"))
    val rowTot = cells.groupBy("grp").agg(sum(col("__o")).as("__rt"))
    val colTot = cells.groupBy("cat").agg(sum(col("__o")).as("__ct"))
    val n = cells.agg(sum(col("__o")).as("__n"),
      count(lit(1)).as("__ncells"))
    val dense = rowTot.crossJoin(broadcast(colTot))
      .join(cells.hint("shuffle_hash"), Seq("grp", "cat"), "left")
      .na.fill(0L, Seq("__o"))
      .crossJoin(broadcast(n.select(col("__n"))))
    val e = col("__rt").cast("double") * col("__ct") / col("__n")
    dense
      .groupBy("grp")
      .agg(max(col("__rt")).as("n_rows"),
        sum((col("__o") - e) * (col("__o") - e) / e).as("__chi"))
      .crossJoin(broadcast(
        rowTot.agg(count(lit(1)).as("__r"))
          .crossJoin(colTot.agg(count(lit(1)).as("__c")))
          .select(((col("__r") - 1L) * (col("__c") - 1L)).as("dof"))))
      .select(col("grp"), col("n_rows"), round(col("__chi"), 6).as("chi2"),
        col("dof"))
  }
}
