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

  /** Exact-capacity context packing: concatenate the corpus token stream in
    * `id` order and cut it at every `blockSize`-token boundary, emitting one
    * row per (document, block) span. Documents CROSS block boundaries — the
    * GPT-style pretraining packing where every block is a full training
    * tensor (no padding at all) and document seams are later handled by EOS
    * tokens / attention masks — the zero-waste complement to
    * [[graft.ops.PrefixSum.packStream]]'s whole-chunk packs (which never
    * split a chunk but can leave packs short).
    *
    * Output per (doc, block): `id`, `n_tokens` (the whole document's
    * count), `block_id` (0-based global), `tok_start`/`tok_end` (the
    * document-relative half-open token span that lands in this block) and
    * `block_off` (where that span starts inside the block). Every block
    * except the last covers exactly `blockSize` tokens; re-assembling each
    * document's spans in block order recovers it exactly.
    *
    * Contracts: docs with NULL or non-positive `nTokens` are excluded (they
    * contribute no tokens to the stream); `id` must be unique (it orders
    * the stream). Block arithmetic is integral `div` end-to-end — a
    * float-division block id goes wrong past 2^53 stream tokens, well
    * inside a 100 TB corpus's token count.
    *
    * Scale shape: the global stream offset is [[graft.ops.PrefixSum]]'s
    * range-partitioned two-pass parallel scan (never a single-partition
    * window); everything after is scan-local — the block explode emits
    * ⌈n/blockSize⌉+1 ≤ n rows per doc, linear in corpus tokens.
    */
  def packContextSpans(df: DataFrame, id: Column, nTokens: Column,
      blockSize: Int): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val base = df.select(id.as("id"),
        coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"))
      .filter(col("n_tokens") > 0L)
    graft.ops.PrefixSum.withGlobalCumsum(base, col("n_tokens"), "__cum", col("id"))
      .withColumn("__start", col("__cum") - col("n_tokens"))
      .withColumn("block_id", explode(sequence(
        expr(s"__start div $blockSize"), expr(s"(__cum - 1) div $blockSize"))))
      .withColumn("__bstart", col("block_id") * blockSize)
      .select(col("id"), col("n_tokens"), col("block_id"),
        (greatest(col("__bstart"), col("__start")) - col("__start")).as("tok_start"),
        (least(col("__bstart") + blockSize, col("__cum")) - col("__start")).as("tok_end"),
        (greatest(col("__bstart"), col("__start")) - col("__bstart")).as("block_off"))
  }
}
