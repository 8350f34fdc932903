package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants for every SparkEntry query — the "would this
  * survive a 100× scale-up" checks, enforced as tests so a regression fails
  * CI instead of surfacing as a cluster incident:
  *
  *   - no CartesianProduct anywhere;
  *   - no SortMergeJoin (at engine shapes every join is either broadcast
  *     [dims, sketches, probes] or a shuffled hash join on a blocking key);
  *   - SinglePartition exchanges only where output is provably bounded
  *     (global single-row aggregates);
  *   - selective scans keep their pushed filters (q02's predicate must reach
  *     the parquet reader).
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  // global single-row aggregates: the final partial→total exchange is bounded
  // x155: the cumulative keep-above-band window runs over the BAND relation
  // (max margin / bandMicro rows — enum-bounded by construction), never the
  // corpus; its single partition is the intended plan.
  private val singlePartitionOk = Set("q19_cost_rollup",
    "q22_pipeline_cost_summary", "x155_margin_reliability")

  test("no query plan contains a CartesianProduct") {
    for ((name, fn) <- SparkEntry.queries) {
      val plan = fn(spark, dir).queryExecution.explainString(FormattedMode)
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }

  test("no query plan contains a SortMergeJoin") {
    for ((name, fn) <- SparkEntry.queries) {
      val plan = fn(spark, dir).queryExecution.explainString(FormattedMode)
      assert(!plan.contains("SortMergeJoin"), s"$name sort-merge-joins")
    }
  }

  /** A SinglePartition exchange is bounded iff its child emits a bounded row
    * count. The structural case: a KEYLESS partial aggregate (one row per
    * input partition — Spark's runtime bloom-filter join pruning plans
    * exactly this shape, `partial_bloom_filter_agg` → SinglePartition).
    * Formatted-mode detail blocks are "(N) NodeName"-headed and an Exchange's
    * child is block N−1, so: flag SinglePartition exchanges whose child block
    * is not a keyless aggregate.
    */
  private def unboundedSinglePartition(plan: String): Boolean = {
    val byId = plan.split("\n\n").flatMap { b =>
      val t = b.trim
      "^\\((\\d+)\\)".r.findFirstMatchIn(t).map(m => m.group(1).toInt -> t)
    }.toMap
    byId.exists { case (id, b) =>
      b.contains("Arguments: SinglePartition") &&
        !byId.get(id - 1).exists(c => c.contains("Keys: []"))
    }
  }

  test("SinglePartition exchanges only in bounded-output queries") {
    for ((name, fn) <- SparkEntry.queries if !singlePartitionOk(name)) {
      val plan = fn(spark, dir).queryExecution.explainString(FormattedMode)
      assert(!unboundedSinglePartition(plan),
        s"$name moves unbounded data to one partition")
    }
  }

  test("selective scan predicates reach the parquet reader (q02)") {
    val plan = SparkEntry.queries("q02_filter_project")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull"), plan)
  }

  test("star-join dims broadcast (q03)") {
    val plan = SparkEntry.queries("q03_join_revenue_by_nation")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("scan-local operators stay shuffle- and join-free (x63, x64)") {
    // upsample plan and JL projection are pure row expansions/projections —
    // any KEYED Exchange or Join appearing here means the scan-local
    // contract broke. The r17 parallelism floor (ops.Fanout: conditional
    // ROUND-ROBIN repartition when a narrow-split input scans below
    // defaultParallelism — a no-op at any real corpus scale) is the one
    // permitted exchange: it moves no data by key and disappears whenever
    // the scan splits wide, so the 100×-scale-up contract is intact.
    for (name <- Seq("x63_upsample_plan", "x64_random_projection")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      val keyedExchanges = "Arguments: [a-z]*[Hh]ashpartitioning|Arguments: rangepartitioning|SinglePartition".r
      assert(keyedExchanges.findFirstIn(plan).isEmpty,
        s"$name shuffles by key: $plan")
      assert(!plan.contains("Join"), s"$name joins: $plan")
    }
  }

  test("parallel-scan operators never plan a Window (x60, x62)") {
    // batch packing and percentile ranks are the two ops whose naive
    // formulation is a per-stratum window — the exact single-task buffering
    // trap PrefixSum exists to avoid
    for (name <- Seq("x60_length_batches", "x62_quality_pct_rank",
        "x135_context_spans")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      assert(!plan.contains("Window"), s"$name windows: $plan")
    }
  }

  test("rank-filter windows push into a WindowGroupLimit (x05, x123)") {
    // the per-group rank ≤ k shape (top-k neighbors, fixed-k strata) must
    // plan Spark's group-limit pushdown: without it, one corpus-scale
    // stratum buffers ENTIRELY in its window task before the filter runs —
    // the guard for the one-giant-stratum case at 100 TB. WindowGroupLimit
    // keeps only k rows per group on each side of the shuffle.
    for (name <- Seq("x05_embed_topk_cosine", "x123_fixedk_sample",
        "x134_rrf_fusion", "x137_pq_adc_topk", "x139_ivfpq_topk",
        "x153_ivfpq_refine")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      assert(plan.contains("WindowGroupLimit"),
        s"$name rank filter did not push into a WindowGroupLimit:\n$plan")
    }
  }

  test("blocklist fold-back is a broadcast + hinted hash join (x58)") {
    val plan = SparkEntry.queries("x58_domain_blocklist")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan) // rules side
    assert(plan.contains("ShuffledHashJoin"), plan) // verdict fold-back
  }

  test("CMS probe joins the fixed-size grid as a broadcast (x127)") {
    // the counter grid is depth×width cells regardless of corpus size — if
    // it ever shuffle-joins, the sketch's whole scale advantage is gone
    val plan = SparkEntry.queries("x127_count_min")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bottom-k sketch keeps k per group via WindowGroupLimit (x128)") {
    // rank ≤ k over each group's hashed vocabulary: without the group-limit
    // pushdown one giant source would buffer its full vocabulary in a
    // single window task
    val plan = SparkEntry.queries("x128_vocab_overlap")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bloom decontam broadcasts only the bitmap words (x129)") {
    // the whole point of the bloom path: the ≤ mBits/64-row word relation
    // broadcasts; the exact confirm join on the pruned survivors is a
    // hinted hash join (benchmark side may be corpus-scale)
    val plan = SparkEntry.queries("x129_bloom_decontam")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
  }
}
