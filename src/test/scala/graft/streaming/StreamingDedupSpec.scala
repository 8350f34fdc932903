package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extensions.Dedup

case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** Ingest-time near-dup detection: cross-batch and within-batch pair
  * discovery, state bounding, and stream≡batch pair-set equality.
  */
class StreamingDedupSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  private val base = "the quick brown fox jumps over the lazy dog again and " +
    "again while the cat watches from the warm windowsill every single day"

  test("near-dup of an earlier batch's doc is flagged; unrelated doc is not") {
    val src = MemoryStream[Doc]
    val q = StreamingDedup.simhashPairsStream(src.toDF(), maxDist = 10)
      .writeStream.format("memory").queryName("ndp").outputMode("append").start()
    try {
      src.addData(Doc(1, t(0), base))
      q.processAllAvailable()
      src.addData(
        Doc(2, t(1), base.replace("fox", "wolf")), // near-dup of 1
        Doc(3, t(1), "completely different content about spark sql " +
          "catalyst optimizer rules and tungsten code generation internals"))
      q.processAllAvailable()
      val pairs = spark.table("ndp")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((2L, 1L)), s"got $pairs")
      assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }, s"got $pairs")
    } finally q.stop()
  }

  test("within-batch pairs found; ordering is (ts, id) not arrival") {
    val src = MemoryStream[Doc]
    val q = StreamingDedup.simhashPairsStream(src.toDF(), maxDist = 10)
      .writeStream.format("memory").queryName("ndp_batch").outputMode("append").start()
    try {
      // same batch, later ts listed first — the pair must still be (later, earlier)
      src.addData(Doc(11, t(5), base), Doc(10, t(2), base))
      q.processAllAvailable()
      val pairs = spark.table("ndp_batch")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((11L, 10L)), s"got $pairs")
    } finally q.stop()
  }

  test("stream over replayed corpus ≡ batch simhashPairs on the same corpus") {
    // 40 docs in 4 micro-batches: identical/near/far variants of two bases.
    // The streaming pair set (unordered, bucket-deduped) must equal the batch
    // op's — same sketch, same pigeonhole blocking, same exact verify.
    val other = "colorless green ideas sleep furiously while the machine " +
      "learns to separate signal from noise in very large text corpora daily"
    val docs = (0 until 40).map { i =>
      val b = if (i % 2 == 0) base else other
      val txt = if (i % 5 == 0) b else b.replace("the", s"the$i")
      Doc(i.toLong, t(i), txt)
    }
    val src = MemoryStream[Doc]
    val q = StreamingDedup.simhashPairsStream(src.toDF(), maxDist = 8)
      .writeStream.format("memory").queryName("ndp_eq").outputMode("append").start()
    try {
      docs.grouped(10).foreach { g => src.addData(g: _*); q.processAllAvailable() }
      val streamed = spark.table("ndp_eq")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.simhashPairs(docs.toDF(), col("doc_id"), col("text"),
          maxDist = 8)
        .select("id_a", "id_b")
        .collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet
      assert(streamed.nonEmpty, "no pairs — test is vacuous")
      assert(streamed == batch,
        s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
    } finally q.stop()
  }

  test("dedupFilterStream: cross-batch + within-batch exact dedup before store") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft-sdedup")
    val surv = work.resolve("survivors").toString
    val reg = work.resolve("registry").toString
    val ckpt = work.resolve("ckpt").toString
    val src = MemoryStream[Doc]
    val q = StreamingDedup.dedupFilterStream(src.toDF(),
      key = sha2(col("text"), 256), keep = col("doc_id"),
      survivorsDir = surv, registryDir = reg, checkpointDir = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      // batch 1: two uniques + an in-batch dup of doc 1 (doc 1 wins by keep)
      src.addData(Doc(1, t(0), "alpha beta"), Doc(2, t(0), "gamma delta"),
        Doc(3, t(0), "alpha beta"))
      q.processAllAvailable()
      // batch 2: one cross-batch dup, one new
      src.addData(Doc(4, t(1), "gamma delta"), Doc(5, t(1), "epsilon zeta"))
      q.processAllAvailable()
      // batch 3: all dups → nothing stored
      src.addData(Doc(6, t(2), "alpha beta"), Doc(7, t(2), "epsilon zeta"))
      q.processAllAvailable()
      val stored = spark.read.parquet(surv)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(stored == Map(1L -> "alpha beta", 2L -> "gamma delta",
        5L -> "epsilon zeta"), s"got $stored")
      // registry holds exactly the three survivor keys
      val keys = spark.read.parquet(reg).collect().map(_.getString(0)).toSet
      assert(keys.size == 3)
    } finally q.stop()
  }

  test("dedupFilterStream: registry survives a stream restart") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft-sdedup-restart")
    val surv = work.resolve("survivors").toString
    val reg = work.resolve("registry").toString
    val src1 = MemoryStream[Doc]
    val q1 = StreamingDedup.dedupFilterStream(src1.toDF(),
      key = sha2(col("text"), 256), keep = col("doc_id"),
      survivorsDir = surv, registryDir = reg,
      checkpointDir = work.resolve("ckpt1").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      src1.addData(Doc(1, t(0), "alpha beta"))
      q1.processAllAvailable()
    } finally q1.stop()
    // new query, new source, same registry: the dup must still be dropped
    val src2 = MemoryStream[Doc]
    val q2 = StreamingDedup.dedupFilterStream(src2.toDF(),
      key = sha2(col("text"), 256), keep = col("doc_id"),
      survivorsDir = surv, registryDir = reg,
      checkpointDir = work.resolve("ckpt2").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      src2.addData(Doc(2, t(1), "alpha beta"), Doc(3, t(1), "gamma delta"))
      q2.processAllAvailable()
      val stored = spark.read.parquet(surv).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(stored == Set(1L, 3L), s"got $stored")
    } finally q2.stop()
  }

  test("maxPerBucket bounds state: oldest entries stop matching") {
    val src = MemoryStream[Doc]
    // capacity 1: each bucket remembers only the newest doc
    val q = StreamingDedup.simhashPairsStream(src.toDF(), maxDist = 10,
        maxPerBucket = 1)
      .writeStream.format("memory").queryName("ndp_cap").outputMode("append").start()
    try {
      src.addData(Doc(1, t(0), base))
      q.processAllAvailable()
      src.addData(Doc(2, t(1), base)) // pairs with 1, then evicts it
      q.processAllAvailable()
      src.addData(Doc(3, t(2), base)) // pairs with 2 only — 1 was evicted
      q.processAllAvailable()
      val pairs = spark.table("ndp_cap")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs((2L, 1L)) && pairs((3L, 2L)) && !pairs((3L, 1L)), s"got $pairs")
    } finally q.stop()
  }
}
