package graft

import org.apache.spark.sql.SparkSession

/** The engine's verified session defaults — ONE place where probe-proven
  * configuration lives, so every entry point (Bench, Verify, JobRunner,
  * user sessions built through [[localBuilder]]) runs the configuration the
  * scale probes validated instead of rediscovering it per call site.
  *
  * Why these specific settings:
  *
  *   - **AQE skew-join split, forced**: the planted-skew probe
  *     (`SKEWPROBE_r10.json` + SkewStressSpec) proved that a hot blocking
  *     key holding ~30% of a blocked pair join's rows runs as ONE task
  *     without the split and as 17 with it — 3.4× wall-clock on the probe,
  *     unboundedly worse at 100 TB where a single hot LSH bucket / domain /
  *     deletion-variant block is a certainty, not a risk.
  *     `forceOptimizeSkewedJoin` additionally lets the split proceed when it
  *     introduces an extra shuffle — at engine shapes (shuffled-hash pair
  *     joins whose reduce side dwarfs the exchange) that trade is always
  *     right. Neither flag changes results, only task partitioning; both
  *     only activate when the runtime detects an actually-skewed partition
  *     (≥ `skewedPartitionFactor` × median AND ≥ threshold bytes), so
  *     balanced workloads plan exactly as before.
  *   - **UTC session timezone**: every timestamp format/parse contract in
  *     the engine (F6, archive sorts, windows) is pinned to UTC; a session
  *     inheriting a machine-local zone would silently shift them.
  *   - **Parquet TIMESTAMP(NANOS) as long**: the driver's `events.parquet`
  *     carries nanosecond timestamps, which vanilla Spark rejects at scan
  *     time; the engine reads them as nanos-since-epoch longs and converts
  *     in the query layer (ParityQueries.events). Static conf — builder
  *     path only.
  *
  * Deliberately NOT here: parallelism sizing (`master`,
  * `spark.sql.shuffle.partitions`, memory) — those are deployment choices
  * that must come from the caller/cluster manager, not a library.
  */
object Sessions {

  /** Defaults settable on a LIVE session (`spark.conf.set`). Applied by
    * every engine entry point; safe to re-apply.
    */
  val runtimeDefaults: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
    // Start every shuffle fine-grained and let AQE COALESCE down to the
    // advisory size, instead of pinning shuffles to the static
    // spark.sql.shuffle.partitions. Why this matters at scale: a
    // shuffled-hash join's build side must FIT IN MEMORY per task, so a
    // corpus-scale relation divided by a small static partition count
    // OOMs exactly when the data grows (the round-11 sf10 probe hit this:
    // the prefix-join verify's token-array build side at 32 partitions
    // exceeded the executor heap; fine-grained initial partitions shrink
    // each build and AQE merges them back wherever data is small).
    //
    // 256, not 1024: the round-13 controlled probe (BENCH_x26_probe_r13,
    // 3 boots × 3 reps × {default,1024,1024+parallelismFirst=false,256})
    // attributed the round-12 x26-family drift to the 1024 value itself —
    // serialized audit chains pay per-stage pre-coalesce overhead
    // proportional to the initial count (x26 4.2 s → 17.4 s, ~4×; x24/x56/
    // x57 1.4–1.8×; parallelismFirst=false does NOT recover it). 256 keeps
    // an 8× build-side shrink vs the static 32 (the sf10 x56 rerun under
    // 256 passes — same artifact) while measuring at default-arm speed on
    // the audit family. Deployments at real cluster scale should raise it
    // with executor count (it is runtime-settable); the engine default
    // targets the envelope the probes actually validated.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "256",
    // Let AQE size the output partitioning of CACHED plans too. Spark pins
    // cached-plan output partitioning by default (the conf below is false)
    // so a persisted relation whose last exchange started at
    // initialPartitionNum=256 materializes — and is re-read by every
    // consumer — as 256 partitions even when the data would coalesce to a
    // handful. The r17 profiler measured the cost on the x26 audit: five
    // consumer stages of ~256 tasks each (~1,000 near-empty tasks per run)
    // re-reading persisted ANN relations that hold a few hundred rows.
    // Scale-adaptive by construction: partition count follows the SAME
    // 64 MB advisory as uncached shuffles, so corpus-scale cached relations
    // keep corpus-scale parallelism. Results are unaffected — only the
    // partition count of materialized cache blocks moves.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true")

  /** Static SQL confs — only effective at session build time. */
  val staticDefaults: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // Generated-class cache sized to a MANY-QUERY application (r17). The
    // default keeps only 100 compiled codegen units per JVM; an engine
    // session that executes hundreds of distinct queries (Bench/Verify run
    // 203, a pipeline run is query-per-operator) evicts the whole cache
    // every sweep and pays Janino recompilation for every WholeStageCodegen
    // unit on every pass. 10k entries ≈ the full engine query surface with
    // headroom; compiled classes are small (the cache is count-bounded, not
    // byte-bounded, upstream default chosen for single-query jobs). Not a
    // local[32] tune: any long-lived session running this engine's query
    // surface hits the same eviction wall at any data scale; results are
    // unaffected (a cache of compiled bytecode for identical source).
    "spark.sql.codegen.cache.maxEntries" -> "10000")

  /** Quiet the one warning class the engine has PINNED as benign (r18,
    * VERDICT #6): `WindowExec: No Partition Defined` fires for every
    * unpartitioned window, but the engine's only remaining global windows
    * run over relations bounded independently of corpus size —
    * marginReliability's band enum (≤ margin-domain/bandMicro rows,
    * post-aggregate) and the ≤ k-row rank windows above TakeOrdered limits
    * (SeqMining.frequentSeqs) — each pinned by a spec
    * (ClassifySpec/SeqMiningSpec bounded-window tests). Call AFTER
    * `setLogLevel`, which resets logger levels. Corpus-scale relations
    * never reach a global window (SeqNumber/PrefixSum are the engine's
    * distributed formulations), so a surviving warning would be a bug —
    * the specs, not the log tail, are the guard.
    */
  def quietPinnedWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Set the runtime-settable engine defaults on an existing session and
    * return it. For engine-owned sessions (Bench/Verify/tests) where the
    * defaults should persist. Library entry points that borrow a CALLER's
    * session must use [[withRuntimeDefaults]] instead — leaving the
    * caller's conf permanently flipped (their AQE choice, their timezone)
    * is a side effect they never asked for.
    */
  def applyRuntimeDefaults(spark: SparkSession): SparkSession = {
    runtimeDefaults.foreach { case (k, v) => spark.conf.set(k, v) }
    spark
  }

  /** Run `body` with the engine runtime defaults set on `spark`, then
    * restore every touched key to the caller's prior value (or unset it if
    * the caller never set it). The scoped form JobRunner uses: the pipeline
    * itself runs under the probe-verified skew/UTC configuration, but a
    * caller who deliberately disabled AQE or runs a non-UTC session gets
    * their session back exactly as they configured it. Safe because the
    * pipeline materializes its results eagerly (checkpoint) before the
    * scope exits — nothing engine-shaped is left lazily pending on the
    * restored conf.
    */
  def withRuntimeDefaults[A](spark: SparkSession)(body: => A): A = {
    val saved = runtimeDefaults.map { case (k, _) => k -> spark.conf.getOption(k) }
    runtimeDefaults.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** A builder pre-loaded with every engine default (runtime + static) for
    * a `local[cpus]` session — the shape Bench/Verify/tests use. Callers
    * append sizing (`shuffle.partitions`) and call `.getOrCreate()`.
    */
  def localBuilder(cpus: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
    (runtimeDefaults ++ staticDefaults).foldLeft(b) {
      case (acc, (k, v)) => acc.config(k, v)
    }
  }
}
