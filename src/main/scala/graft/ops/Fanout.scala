package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive CPU fan-out for heavy per-row pipelines (r17).
  *
  * The problem: a parquet input with few row groups scans as few partitions
  * (one task per row group at the limit), so CPU-heavy per-row work placed
  * scan-side — shingling, hashing, tokenizing — runs at file parallelism,
  * not cluster parallelism. The r17 stage profiler measured the worst case
  * on the bench corpus (single-row-group files): 4-second single-task
  * stages with 31 of 32 cores idle.
  *
  * The fix is deliberately CONDITIONAL: round-robin repartition to
  * `defaultParallelism`, but only when the plan's physical partitioning is
  * narrower than that. At real scale a corpus scan already carries
  * hundreds of splits, the condition is false, and NO extra exchange is
  * ever planned — this is a parallelism floor, not a repartition-always
  * (guide §2.4: never add a shuffle the data doesn't need).
  *
  * Caller contract: everything downstream must be value-independent of row
  * order and partitioning (the engine-wide exact-arithmetic convention —
  * integer micros/cents, sorted aggregates, per-row functions). Do NOT use
  * upstream of `limit`-based model sampling (fitCentroids' pinned-order
  * determinism contract) or any float-sum whose low bits reach an oracle
  * hash unrounded.
  */
object Fanout {

  /** `df`, repartitioned round-robin to `defaultParallelism` iff its
    * physical plan yields fewer partitions than that. Deciding from the
    * physical partition count costs one planning pass, no job.
    */
  def forCpu(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
