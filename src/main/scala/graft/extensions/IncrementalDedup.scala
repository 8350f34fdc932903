package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomMightContain

/** Incremental deduplication: filter a new batch against the key set of an
  * already-ingested corpus — the "don't re-ingest what last month's run
  * already took" step of a continuously-fed training pipeline.
  *
  * The naive formulation joins the ENTIRE batch against the prior key set —
  * a full shuffle of both sides on every incremental run. Here the prior keys
  * compress into a Bloom filter (built with one map-side-combined pass,
  * merged associatively like any sketch), which probes the batch IN THE SCAN
  * via a native codegen'd expression: rows the filter rejects are definitely
  * new (no false negatives) and never shuffle at all. Only the filter's hits
  * — true overlap plus an `fpp` sliver of the batch — reach the exact verify
  * join that rescues false positives. At 100 TB with a low-overlap batch
  * that's the difference between shuffling the corpus and shuffling ~nothing.
  *
  * The batch is scanned twice (once per branch of the maybe-split); scans are
  * the cheap part of the plan and the alternative — persisting the batch —
  * doesn't exist at corpus scale.
  */
object IncrementalDedup {

  /** Build a Bloom filter of `key` over `prior` (distributed, mergeable). */
  def keyBloom(prior: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    prior.select(key.cast("string").as("k")).filter(col("k").isNotNull)
      .rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (bf, row) => { bf.putBinary(row.getString(0).getBytes("UTF-8")); bf },
        (a, b) => { a.mergeInPlace(b); a })
  }

  /** Rows of `df` whose `key` is NOT present in `prior`'s `priorKey` set —
    * exact semantics (bloom accelerates, the verify join corrects). */
  def dropSeen(df: DataFrame, key: Column, prior: DataFrame, priorKey: Column,
      fpp: Double = 0.01): DataFrame = {
    val priorKeys = prior.select(priorKey.cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    // expected size from a cheap metadata-scale count; sizing the filter from
    // measured data (not hope) keeps the realized fpp at the requested value
    val expected = math.max(priorKeys.count(), 1L)
    val bloom = keyBloom(prior, priorKey, expected, fpp)
    // null keys probe to null; anti-join semantics keeps them (null never
    // equals a prior key), so coalesce routes them to the new side
    val flagged = df.withColumn("__maybe",
      coalesce(BloomMightContain.mightContain(key.cast("string"), bloom),
        lit(false)))
    val definitelyNew = flagged.filter(!col("__maybe"))
    // candidates = true overlap + fpp sliver: the ONLY rows that shuffle;
    // hinted hash join — neither side carries stats after the aggregate
    val rescued = flagged.filter(col("__maybe"))
      .join(priorKeys.hint("shuffle_hash"), key.cast("string") === col("__k"),
        "left_anti")
    definitelyNew.unionByName(rescued).drop("__maybe")
  }
}
