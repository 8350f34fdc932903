package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Sessionize

case class SEv(event_id: Long, ts: Timestamp, user_id: Long,
  event_type: String, value: Double)

/** Streaming gap sessionization: watermark-driven session close,
  * cross-batch continuation, per-key numbering, stream≡batch equality on
  * closed sessions.
  */
class StreamingSessionizeSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  // +1h so the earliest event is strictly ABOVE the initial watermark
  // (epoch 0): a watermarkDelay=0 stream drops rows at/below the watermark,
  // and an event at exactly epoch 0 would silently vanish
  private def t(min: Int) = new Timestamp((min + 60) * 60000L)
  private def us(min: Int) = (min + 60) * 60000000L

  private def startQuery(src: MemoryStream[SEv], name: String,
      gapSeconds: Long = 600L) = {
    StreamingSessionize.sessionsStream(src.toDF(), col("user_id"), col("ts"),
        col("event_id"), gapSeconds, col("event_type"), col("value"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
  }

  private def sessions(name: String) =
    spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))).toMap

  test("sessions close when the watermark passes the gap; fields match batch") {
    val src = MemoryStream[SEv]
    val q = startQuery(src, "ss1")
    try {
      // user 7: two events 5 min apart (one session), then 20 min silence
      src.addData(
        SEv(1, t(0), 7, "view", 0.5),
        SEv(2, t(5), 7, "click", 1.25))
      q.processAllAvailable()
      assert(spark.table("ss1").isEmpty, "open session must not emit")
      // watermark jumps past t(5) + 10 min when a later event arrives
      src.addData(SEv(3, t(40), 7, "view", 2.0))
      q.processAllAvailable()
      src.addData(SEv(4, t(90), 8, "view", 0.0)) // push watermark further
      q.processAllAvailable()
      val out = sessions("ss1")
      assert(out.contains((7L, 1L)), s"got $out")
      assert(out((7L, 1L)) == ((2L, us(0), us(5), 300L, 2L, 1.75)))
      assert(out.contains((7L, 2L)), "second session closed by watermark")
      assert(out((7L, 2L)) == ((1L, us(40), us(40), 0L, 1L, 2.0)))
      // batch operator agrees on every closed session
      val batch = Sessionize.sessions(
          Seq(SEv(1, t(0), 7, "view", 0.5), SEv(2, t(5), 7, "click", 1.25),
            SEv(3, t(40), 7, "view", 2.0)).toDF(),
          col("user_id"), col("ts"), col("event_id"), 600L,
          col("event_type"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getDouble(7)))).toMap
      assert(batch((7L, 1L)) == out((7L, 1L)))
      assert(batch((7L, 2L)) == out((7L, 2L)))
    } finally q.stop()
  }

  test("a session spanning micro-batches stays ONE session; numbering continues") {
    val src = MemoryStream[SEv]
    val q = startQuery(src, "ss2")
    try {
      src.addData(SEv(1, t(0), 5, "view", 1.0))
      q.processAllAvailable()
      src.addData(SEv(2, t(5), 5, "click", 1.0)) // within gap: extends
      q.processAllAvailable()
      src.addData(SEv(3, t(60), 5, "view", 1.0)) // new session, closes #1
      q.processAllAvailable()
      src.addData(SEv(4, t(120), 5, "view", 1.0)) // closes #2
      q.processAllAvailable()
      val out = sessions("ss2")
      assert(out((5L, 1L))._1 == 2L, s"batch-spanning session merged: $out")
      assert(out((5L, 2L))._1 == 1L, s"numbering continues across close: $out")
      assert(!out.contains((5L, 3L)), "last session still open")
    } finally q.stop()
  }

  test("stream ≡ batch over interleaved keys fed in arbitrary batch splits") {
    val events = Seq(
      SEv(1, t(0), 1, "view", 0.25), SEv(2, t(2), 2, "view", 0.5),
      SEv(3, t(4), 1, "click", 0.25), SEv(4, t(30), 1, "view", 1.0),
      SEv(5, t(31), 2, "purchase", 2.5), SEv(6, t(33), 2, "view", 0.5),
      SEv(7, t(70), 1, "view", 0.0), SEv(8, t(71), 2, "view", 0.0))
    val src = MemoryStream[SEv]
    val q = startQuery(src, "ss3")
    try {
      events.grouped(3).foreach { g => src.addData(g: _*); q.processAllAvailable() }
      // sentinel far-future event closes everything still open
      src.addData(SEv(99, t(1000), 999, "view", 0.0))
      q.processAllAvailable()
      src.addData(SEv(100, t(2000), 999, "view", 0.0))
      q.processAllAvailable()
      val out = sessions("ss3").view.filterKeys(_._1 != 999L).toMap
      val batch = Sessionize.sessions(events.toDF(), col("user_id"),
          col("ts"), col("event_id"), 600L, col("event_type"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getDouble(7)))).toMap
      assert(out == batch, s"stream $out vs batch $batch")
    } finally q.stop()
  }

  test("sub-millisecond timestamps: close boundary ceils to ms; stream ≡ batch") {
    // last event at a NON-ms-aligned µs: the timeout timestamp must ceil
    // last_us to the next ms — a floored boundary could close the session up
    // to 999µs before last+gap (the sub-ms window batch would still merge)
    val subMs = new Timestamp(0) // container for µs-precision via setNanos
    subMs.setTime((60 + 0) * 60000L)
    subMs.setNanos(500500000) // +500.5 ms → µs component .5005 s, sub-ms µs
    val events = Seq(
      SEv(1, subMs, 7, "view", 1.0),
      SEv(2, t(60), 7, "view", 2.0), // > gap after event 1: closes session 1
      SEv(3, t(200), 8, "view", 0.0)) // watermark push: closes session 2
    val src = MemoryStream[SEv]
    val q = startQuery(src, "ss4")
    try {
      events.foreach { e => src.addData(e); q.processAllAvailable() }
      src.addData(SEv(9, t(900), 9, "view", 0.0))
      q.processAllAvailable()
      val out = sessions("ss4").view.filterKeys(k => k._1 == 7L).toMap
      val batch = Sessionize.sessions(events.toDF(), col("user_id"),
          col("ts"), col("event_id"), 600L, col("event_type"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getDouble(7)))).toMap
      val batch7 = batch.view.filterKeys(_._1 == 7L).toMap
      assert(out == batch7, s"stream $out vs batch $batch7")
      // the sub-ms start/last round-trips exactly (µs fidelity end to end)
      assert(out((7L, 1L))._2 == 60 * 60000000L + 500500L,
        s"sub-ms µs must survive: $out")
    } finally q.stop()
  }
}
