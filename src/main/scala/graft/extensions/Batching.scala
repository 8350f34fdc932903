package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed batch packing — the inference/training batching step that
  * turns a token-counted corpus into fixed-size batches of similar-length
  * documents. Batching docs of wildly different lengths pads every short doc
  * to the batch max; bucketing by length first bounds that waste, and the
  * padding-efficiency report makes the trade-off measurable per batch.
  *
  * Determinism contract: bucket = `n_tokens div bucketWidth` (pure
  * arithmetic), within-bucket order is the id order, batch =
  * `(seq − 1) div batchSize` — the whole assignment is a pure function of
  * (corpus, bucketWidth, batchSize), so re-runs and engines agree.
  */
object Batching {

  /** Per-document batch assignment: adds `bucket`, `batch_seq` (1-based
    * position within the bucket, in `id` order) and `batch_id`
    * (0-based within the bucket).
    *
    * Scale shape: the within-bucket sequence is
    * [[graft.ops.PrefixSum.withStratumCumsum]]'s range-partitioned parallel
    * scan (counting 1s ≡ a per-bucket row_number) — a hot bucket spreads
    * over many range partitions instead of buffering in one window task,
    * the exact trap a `row_number().over(partitionBy(bucket))` would hit on
    * a length-skewed corpus (most web documents are short, so one bucket
    * holds most of the corpus).
    */
  def assignBatches(df: DataFrame, id: Column, nTokens: Column,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    graft.ops.PrefixSum.withStratumCumsum(
        df.withColumn("bucket",
          (nTokens.cast("long") / bucketWidth).cast("long")),
        col("bucket"), lit(1L), "batch_seq", id)
      .withColumn("batch_id", ((col("batch_seq") - 1L) / batchSize).cast("long"))
  }

  /** Per-batch padding-efficiency report:
    * (bucket, batch_id, n_docs, max_tokens, sum_tokens, padding_frac) where
    * `padding_frac = 1 − sum/(max·n)` — the fraction of the padded batch
    * tensor that is padding. One aggregate over the assignment; batch count
    * is corpus-sized/batchSize, so the report stays far smaller than the
    * corpus. */
  def batchStats(df: DataFrame, id: Column, nTokens: Column,
      bucketWidth: Int, batchSize: Int): DataFrame =
    assignBatches(df, id, nTokens, bucketWidth, batchSize)
      .withColumn("__n", nTokens.cast("long"))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max(col("__n")).as("max_tokens"),
        sum(col("__n")).as("sum_tokens"))
      .withColumn("padding_frac",
        when(col("max_tokens") === 0L, 0.0)
          .otherwise(round(lit(1.0) - col("sum_tokens").cast("double") /
            (col("max_tokens") * col("n_docs")), 6)))
}
