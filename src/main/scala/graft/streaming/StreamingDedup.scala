package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}

import graft.extensions.{Dedup, IncrementalDedup}

/** Streaming NEAR-duplicate detection — the ingest-time analogue of the batch
  * [[graft.extensions.Dedup.simhashPairs]]: as documents arrive, emit a pair
  * row for every prior document within SimHash Hamming distance `maxDist`,
  * so a 100 TB pipeline can drop (or down-weight) near-dups BEFORE they ever
  * hit storage, instead of re-scanning the corpus in batch later.
  *
  * Same candidate structure as the batch op: the 64-bit SimHash is split into
  * `nChunks` pigeonhole chunks (Hamming ≤ maxDist < nChunks ⇒ at least one
  * chunk identical), and each document registers in its `nChunks` bucket
  * groups. Verification is the exact 64-bit Hamming distance, so emitted
  * pairs are never false positives of the blocking scheme. A pair whose
  * sketches agree on several chunks is emitted once per agreeing bucket
  * (the `bucket` column tells them apart) — dedupe downstream on
  * `(doc_id, dup_of)` if the consumer needs uniqueness; cross-group
  * coordination inside the stream would need a second stateful stage.
  *
  * State design (the part that must survive an unbounded stream):
  *  - one state row per OBSERVED bucket, holding at most `maxPerBucket`
  *    (id, sketch) entries, newest-first FIFO — 16 bytes each, so the
  *    per-bucket ceiling is maxPerBucket × 16 B regardless of stream length.
  *    Overflow drops the OLDEST entry: recall against the far past decays
  *    first, which is the right failure mode for ingest dedup (recent
  *    re-crawls/re-uploads are the common duplicate source).
  *  - `idleTimeout` (ProcessingTimeTimeout) evicts buckets no document has
  *    touched for the duration, bounding the NUMBER of state rows on
  *    long-running streams; leave None for data-driven tests (a timeout makes
  *    the query run continuous timeout-check batches).
  *
  * Within a micro-batch, documents are processed in `(ts, id)` order (the
  * iterator order of `flatMapGroupsWithState` is not defined), so the
  * UNORDERED pair set is batch-composition-independent: a doc pairs against
  * every doc that sorts before it, whether that doc arrived in an earlier
  * batch or the same one. The `(doc_id, dup_of)` ORIENTATION is not: across
  * batches it follows arrival order (a later-arriving doc is emitted as
  * `doc_id` even if its `ts` sorts earlier than the state entry it matched),
  * while within a batch it follows `(ts, id)`. StreamingDedupSpec accordingly
  * pins stream≡batch equality on the unordered pair set.
  */
object StreamingDedup {

  /** Emitted pair: `doc_id` arrived, `dup_of` was already present (or sorts
    * earlier in the same micro-batch). */
  case class NearDupPair(doc_id: Long, dup_of: Long, hamming: Int, bucket: Long)

  /** Internal per-chunk row (public: Catalyst codegen instantiates it). */
  case class ChunkedDoc(bucket: Long, id: Long, sk: Long, tsMillis: Long)

  /** Internal bucket state (public: same reason). */
  case class BucketEntry(id: Long, sk: Long)
  case class BucketState(entries: List[BucketEntry])

  /** `docs` needs columns `doc_id` (castable to long), `ts` (timestamp),
    * `text` (string). Output mode: append.
    */
  def simhashPairsStream(docs: DataFrame, maxDist: Int = 3, nChunks: Int = 4,
      maxPerBucket: Int = 1024,
      idleTimeout: Option[String] = None): Dataset[NearDupPair] = {
    require(Set(2, 4, 8, 16, 32).contains(nChunks),
      s"nChunks must divide 64 evenly, got $nChunks")
    // same contract as the batch op: completeness is GUARANTEED only for
    // maxDist < nChunks (pigeonhole); larger maxDist is best-effort recall
    // through the same chunk agreement — a candidate must still share a chunk
    require(maxDist >= 0 && maxDist <= 63)
    val spark = docs.sparkSession
    import spark.implicits._
    val bits = 64 / nChunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    // bucket key = hash(chunkIdx, chunkValue): a 64-bit combine of the
    // pigeonhole coordinates. A hash collision only merges two buckets'
    // member lists — verification is the exact Hamming distance, so it can
    // cost a comparison, never a wrong pair.
    val chunkKeys = array((0 until nChunks).map(i =>
      xxhash64(lit(i), shiftright(col("__sk"), i * bits).bitwiseAND(lit(mask)))): _*)
    val chunked = docs
      .withColumn("__sk", Dedup.simhash(col("text")))
      .select(explode(chunkKeys).as("bucket"), col("doc_id").cast("long").as("id"),
        col("__sk").as("sk"), unix_millis(col("ts")).as("tsMillis"))
      .as[ChunkedDoc]
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    chunked
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), timeoutConf) {
        (bucket: Long, it: Iterator[ChunkedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toArray.sortBy(d => (d.tsMillis, d.id))
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = List.newBuilder[NearDupPair]
            batch.foreach { d =>
              entries.foreach { e =>
                val h = java.lang.Long.bitCount(d.sk ^ e.sk)
                if (h <= maxDist) out += NearDupPair(d.id, e.id, h, bucket)
              }
              entries = (BucketEntry(d.id, d.sk) :: entries).take(maxPerBucket)
            }
            state.update(BucketState(entries))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming EXACT dedup-before-store: each micro-batch keeps only rows
    * whose `key` has never been seen — not in any earlier batch (tracked in a
    * persistent parquet key registry at `registryDir`) and not earlier in the
    * same batch (first by `keep` order wins, [[Dedup.exact]]'s contract) —
    * then appends survivors to `survivorsDir` and their keys to the registry.
    * This is the composed "don't store what we already have" ingest stage:
    * [[graft.extensions.IncrementalDedup.dropSeen]] per micro-batch, so the
    * registry probe is a Bloom filter IN THE SCAN and only probable dups
    * shuffle — the registry is never joined wholesale against the batch.
    *
    * Unlike [[simhashPairsStream]] the seen-set lives in parquet, not stream
    * state: an exact-dedup registry grows with corpus cardinality (every
    * unique key, forever), which is exactly what executor state must NOT do;
    * as a side effect the registry survives stream restarts and is shared
    * with batch runs ([[graft.extensions.IncrementalDedup]] reads the same
    * layout).
    *
    * Delivery: foreachBatch is at-least-once — a batch retried after a
    * partial survivor write can append rows twice. Duplicate KEYS in the
    * registry are harmless (the probe semantics don't change); survivors are
    * exactly-once only under a transactional table format, which this
    * zero-dependency layout deliberately isn't. Downstream exact dedup (one
    * `dup_count > 0` filter) restores uniqueness if the sink needs it.
    */
  def dedupFilterStream(docs: DataFrame, key: Column, keep: Column,
      survivorsDir: String, registryDir: String, checkpointDir: String,
      fpp: Double = 0.01,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val withinBatch = Dedup.exact(batch, key, keep).drop("dup_count")
          val fs = new Path(registryDir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val survivors =
            if (fs.exists(new Path(registryDir))) {
              val registry = spark.read.parquet(registryDir)
              IncrementalDedup.dropSeen(withinBatch, key, registry, col("k"), fpp)
            } else withinBatch
          // checkpoint: survivors feed BOTH writes below; recomputing would
          // re-run the bloom probe + verify join (and re-invoke nothing
          // side-effecting — still, twice the work per batch)
          val s = survivors.localCheckpoint()
          s.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(survivorsDir)
          s.select(key.cast("string").as("k"))
            .write.mode("append").parquet(registryDir)
        }
        ()
      }
      .start()
}
