package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data export: split a corpus into a fixed number of shards with a
  * content-independent, salt-keyed assignment, write one ordered file per
  * shard, and emit a verifiable manifest. This is the last mile of every
  * large-scale pipeline — the trainer consumes shard files, the manifest is
  * what lets two sides agree they are looking at the same bytes without
  * re-reading them.
  *
  * Determinism contract (the property everything here exists for):
  *  - shard(id) depends only on (id, salt, nShards) — re-runs, repartitions
  *    and engine versions can't move a document between shards;
  *  - within a shard, documents are ordered by id — the file bytes and the
  *    manifest hash are a pure function of the corpus;
  *  - the manifest hash is HASH-OF-HASHES (sha256 over the id-ordered
  *    per-document sha256s), the same scalable shape as
  *    [[Hashing.contentSha256Scalable]]: the combine state is 64 bytes per
  *    document, never the document bytes, so manifest verification of a
  *    multi-TB shard reads hashes, not content.
  *
  * Scale shape: assignment is a scan-local column; the manifest is one
  * groupBy(shard) whose collect_list buffers 64 B × docs-per-shard (size
  * `nShards` so that stays executor-bounded — 10M docs/shard ≈ 640 MB is the
  * practical ceiling, far above sane shard sizes); the writer sorts within
  * hash-partitioned shard groups so each shard file streams out of one task
  * in one pass (no driver-side data).
  */
object ShardedExport {

  /** Stable shard id in `[0, nShards)` — sha-keyed like
    * [[graft.extensions.Sampling]]'s buckets (first 8 hex chars of
    * sha256(id ⊕ salt) as an integer), so assignment survives anything short
    * of changing the salt or the shard count. */
  def shardOf(id: Column, nShards: Int, salt: String): Column = {
    require(nShards > 0, "nShards must be positive")
    conv(substring(sha2(concat(id.cast("string"), lit(salt)), 256), 1, 8), 16, 10)
      .cast("long") % nShards
  }

  /** The shared `(shard, id, text)` projection both the writer and the
    * manifest consume. NULL text is coalesced to `""` HERE, so the two
    * consumers cannot disagree on null handling (a raw null would NPE the
    * writer while `sha2(null)` silently vanished from the manifest's
    * `array_join` — two different answers for the same row). */
  private def projected(df: DataFrame, id: Column, text: Column, nShards: Int,
      salt: String): DataFrame =
    df.select(shardOf(id, nShards, salt).as("__shard"), id.as("__id"),
      coalesce(text, lit("")).as("__text"))

  private def manifestOf(proj: DataFrame): DataFrame =
    proj.groupBy(col("__shard").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("__text"))).as("total_chars"),
        sha2(array_join(
          transform(
            sort_array(collect_list(struct(col("__id"),
              sha2(col("__text"), 256).as("__sha")))),
            x => x.getField("__sha")),
          ""), 256).as("content_sha256"))

  /** Per-shard manifest: (shard, n_docs, total_chars, content_sha256) where
    * `content_sha256 = sha256(concat of per-doc sha256(text) in id order)`.
    * One row per NON-EMPTY shard. NULL text counts as `""` (the writer's
    * convention). */
  def manifest(df: DataFrame, id: Column, text: Column, nShards: Int,
      salt: String): DataFrame =
    manifestOf(projected(df, id, text, nShards, salt))

  /** Write one `shard_NNNNN.txt` per shard under `outDir` (documents in id
    * order, joined by `\n`), atomically (tmp file + rename per shard).
    * JSONL export is this same sink with `to_json(struct(...))` as `text` —
    * which is also the mode to use when documents may CONTAIN newlines
    * (`to_json` escapes them; raw multi-line text would make document
    * boundaries in the file ambiguous, though the manifest stays exact
    * either way since it hashes per-document).
    *
    * Distributed write: rows are hash-partitioned by shard and sorted within
    * partitions on (shard, id), so each task streams its shards sequentially
    * — one open file at a time, no buffering of shard content. Local-fs
    * semantics in local mode; a shared filesystem on a cluster.
    *
    * Returns the manifest, computed from the SAME materialization that
    * produced the files: the `(shard, id, text)` projection is
    * `localCheckpoint`ed once and drives both the write and the manifest.
    * Without that pin, a non-deterministic input (rand-derived columns, a
    * nondeterministic upstream recomputed after a shuffle) could hand the
    * manifest different rows than the writer saw — silently breaking the
    * integrity artifact this operator exists to produce. The checkpoint
    * blocks are GC-owned (no persist left behind, per the CacheHygiene
    * contract).
    *
    * Pre-existing `shard_NNNNN.txt` files in `outDir` are deleted first: a
    * re-export with a different `nShards`/`salt`/corpus only overwrites
    * COLLIDING names, so stale shards from the previous run would otherwise
    * survive next to the new ones and pass a naive consumer.
    */
  def writeShardedText(df: DataFrame, id: Column, text: Column, outDir: String,
      nShards: Int, salt: String): DataFrame = {
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val stale = Files.list(dir)
    try stale.filter(p => p.getFileName.toString.matches("shard_\\d{5}\\.txt"))
      .forEach(p => Files.delete(p))
    finally stale.close()
    val proj = projected(df, id, text, nShards, salt).localCheckpoint()
    proj
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions("__shard", "__id")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        var current = -1L
        var w: java.io.BufferedWriter = null
        var tmp: java.nio.file.Path = null
        def close(): Unit = if (w != null) {
          w.close()
          Files.move(tmp, Paths.get(outDir, f"shard_$current%05d.txt"),
            StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
          w = null
        }
        try {
          it.foreach { r =>
            val s = r.getLong(0)
            if (s != current) {
              close()
              current = s
              tmp = Files.createTempFile(Paths.get(outDir), ".tmp-shard-", null)
              w = Files.newBufferedWriter(tmp)
            } else w.write("\n")
            w.write(r.getString(2))
          }
          close()
        } catch { case e: Throwable =>
          // a dying task must not orphan its half-written temp file in
          // outDir — the retry opens a fresh one and the atomic rename means
          // a partial shard is never visible under its final name
          if (w != null) w.close()
          if (tmp != null) Files.deleteIfExists(tmp)
          throw e
        }
      }
    manifestOf(proj)
  }
}
