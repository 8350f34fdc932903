package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Scd

case class CEv(event_id: Long, ts: Timestamp, user_id: Long,
  event_type: String)

/** Streaming SCD2 run compaction: close-on-change semantics, cross-batch
  * continuation, batching invariance, re-delivery idempotence, and
  * stream ≡ batch equality on closed runs.
  */
class StreamingScdSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def t(min: Int) = new Timestamp((min + 60) * 60000L)
  private def us(min: Int) = (min + 60) * 60000000L

  private def startQuery(src: MemoryStream[CEv], name: String) =
    StreamingScd.runCompactStream(src.toDF(), col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()

  private def runs(name: String) =
    spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((Option(r.getString(2)), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  private def batchClosed(evs: Seq[CEv]) =
    Scd.runCompact(evs.toDF(), col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .filter(!col("is_current"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.getString(2)), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("runs close on value change; open run stays in state; batch parity") {
    val src = MemoryStream[CEv]
    val q = startQuery(src, "scd1")
    try {
      src.addData(CEv(1, t(0), 7, "new"), CEv(2, t(5), 7, "new"))
      q.processAllAvailable()
      assert(spark.table("scd1").isEmpty, "open run must not emit")
      src.addData(CEv(3, t(10), 7, "active"), CEv(4, t(20), 7, "new"))
      q.processAllAvailable()
      val out = runs("scd1")
      assert(out == Map(
        (7L, 1L) -> ((Some("new"), us(0), us(10), 2L)),
        (7L, 2L) -> ((Some("active"), us(10), us(20), 1L))))
      // the batch operator agrees on every closed run of the same prefix
      val evs = Seq(CEv(1, t(0), 7, "new"), CEv(2, t(5), 7, "new"),
        CEv(3, t(10), 7, "active"), CEv(4, t(20), 7, "new"))
      assert(out == batchClosed(evs))
    } finally q.stop()
  }

  test("batching invariance: same closed runs however the stream is sliced") {
    val evs = (1 to 60).map { i =>
      CEv(i.toLong, t(i), 3L + i % 2, s"s${(i / 7) % 3}")
    }
    def closedVia(slices: Seq[Seq[CEv]], name: String) = {
      val src = MemoryStream[CEv]
      val q = startQuery(src, name)
      try {
        slices.foreach { s => src.addData(s: _*); q.processAllAvailable() }
        runs(name)
      } finally q.stop()
    }
    val oneGo = closedVia(Seq(evs), "scdb1")
    val sliced = closedVia(evs.grouped(7).toSeq, "scdb2")
    assert(oneGo == sliced)
    assert(oneGo == batchClosed(evs))
  }

  test("re-delivery is idempotent; late events cannot rewrite history") {
    val src = MemoryStream[CEv]
    val q = startQuery(src, "scd3")
    try {
      src.addData(CEv(1, t(0), 7, "a"), CEv(2, t(10), 7, "b"))
      q.processAllAvailable()
      // re-deliver both, plus a LATE event older than the high-water mark
      src.addData(CEv(1, t(0), 7, "a"), CEv(2, t(10), 7, "b"),
        CEv(99, t(5), 7, "z"))
      q.processAllAvailable()
      src.addData(CEv(3, t(20), 7, "c")) // closes run b
      q.processAllAvailable()
      val out = runs("scd3")
      assert(out == Map(
        (7L, 1L) -> ((Some("a"), us(0), us(10), 1L)),
        (7L, 2L) -> ((Some("b"), us(10), us(20), 1L))))
    } finally q.stop()
  }

  test("null attributes form their own runs, as in batch") {
    val src = MemoryStream[CEv]
    val q = startQuery(src, "scd4")
    try {
      src.addData(CEv(1, t(0), 7, "a"), CEv(2, t(5), 7, null),
        CEv(3, t(10), 7, null), CEv(4, t(15), 7, "a"))
      q.processAllAvailable()
      val out = runs("scd4")
      assert(out == Map(
        (7L, 1L) -> ((Some("a"), us(0), us(5), 1L)),
        (7L, 2L) -> ((None, us(5), us(15), 2L))))
    } finally q.stop()
  }

  test("keys never interleave: runs are per key") {
    val src = MemoryStream[CEv]
    val q = startQuery(src, "scd5")
    try {
      src.addData(CEv(1, t(0), 1, "a"), CEv(2, t(1), 2, "b"),
        CEv(3, t(2), 1, "a"), CEv(4, t(3), 2, "c"), CEv(5, t(4), 1, "b"))
      q.processAllAvailable()
      val out = runs("scd5")
      assert(out == Map(
        (1L, 1L) -> ((Some("a"), us(0), us(4), 2L)),
        (2L, 1L) -> ((Some("b"), us(1), us(3), 1L))))
    } finally q.stop()
  }
}
