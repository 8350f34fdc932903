package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Event-time streaming semantics: watermarked windows, bounded-state dedup,
  * and custom progress state (§2.9 extensions).
  */
class EventTimeSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("watermarked tumbling window emits a window once closed, drops late rows") {
    val src = MemoryStream[Ev]
    val q = EventTimeOps.windowedCounts(src.toDF(), watermark = "2 minutes",
        windowDur = "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      src.addData(Ev(1, t(0), "click", 1.0), Ev(2, t(1), "click", 2.5), Ev(3, t(3), "view", 1.0))
      q.processAllAvailable()
      // watermark (1min) has not passed the [0,5) window end — nothing emitted yet
      assert(spark.table("win_counts").count() == 0)

      // an event at 10min advances the watermark to 8min, closing [0,5)
      src.addData(Ev(4, t(10), "click", 1.0))
      q.processAllAvailable()
      // watermark advances at batch end; the closed window flushes on the next batch
      src.addData(Ev(5, t(10), "view", 1.0))
      q.processAllAvailable()

      val rows = spark.table("win_counts")
        .collect().map(r => (r.getAs[Timestamp]("window_start").getTime / 60000L,
          r.getAs[String]("event_type"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
        .toSet
      assert(rows == Set((0L, "click", 2L, 3.5), (0L, "view", 1L, 1.0)))

      // a row 9 minutes late (ts=2min < watermark=8min) must be dropped, not
      // re-open the already-emitted [0,5) window
      src.addData(Ev(6, t(2), "click", 99.0))
      q.processAllAvailable()
      src.addData(Ev(7, t(11), "click", 1.0))
      q.processAllAvailable()
      val clickRows = spark.table("win_counts")
        .filter($"event_type" === "click" && $"window_start" === t(0)).collect()
      assert(clickRows.length == 1 && clickRows.head.getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }

  test("dedupStream drops duplicates within the watermark horizon") {
    val src = MemoryStream[Ev]
    val q = EventTimeOps.dedupStream(src.toDF(), "10 minutes", "event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      src.addData(Ev(1, t(0), "click", 1.0), Ev(1, t(1), "click", 1.0), Ev(2, t(1), "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)

      // cross-batch duplicate, still inside the watermark window → dropped
      src.addData(Ev(1, t(2), "click", 1.0), Ev(3, t(3), "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the window, bounded state") {
    val lSrc = MemoryStream[Ev]
    val rSrc = MemoryStream[Ev]
    val joined = EventTimeOps.intervalJoin(
      lSrc.toDF().selectExpr("event_id AS l_id", "event_type AS l_key", "ts AS l_ts"),
      rSrc.toDF().selectExpr("event_id AS r_id", "event_type AS r_key", "ts AS r_ts"),
      "l_key", "r_key", "l_ts", "r_ts", within = "5 minutes", watermark = "2 minutes")
    // enqueue BOTH sides before starting: separate addData calls can land in
    // separate micro-batches, and a left row whose window the watermark has
    // passed is (correctly) evicted before a late-batched right side arrives.
    // Times sit 1h past the epoch — a row AT the initial watermark (epoch 0)
    // is filtered as late by the join's strict state predicate.
    def h(min: Int) = t(60 + min)
    lSrc.addData(Ev(1, h(0), "click", 1.0), Ev(2, h(20), "view", 1.0))
    rSrc.addData(
      Ev(10, h(3), "click", 1.0),   // within [0, 5] of l1 → pair
      Ev(11, h(9), "click", 1.0),   // outside → no pair
      Ev(12, h(21), "view", 1.0))   // within [20, 25] of l2 → pair
    val q = joined.selectExpr("l_id", "r_id")
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val pairs = spark.table("interval_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 10L), (2L, 12L)))
    } finally q.stop()
  }

  test("trackProgress accumulates per-job state across micro-batches") {
    val src = MemoryStream[EventTimeOps.GroupDone]
    val q = EventTimeOps.trackProgress(src.toDS(), Map("job1" -> 3L))
      .writeStream.format("memory").queryName("progress_stream")
      .outputMode("update").start()
    try {
      src.addData(
        EventTimeOps.GroupDone("job1", "a.txt", t(0), isError = false),
        EventTimeOps.GroupDone("job1", "book1/", t(1), isError = true))
      q.processAllAvailable()
      src.addData(EventTimeOps.GroupDone("job1", "b.txt", t(2), isError = false))
      q.processAllAvailable()

      val updates = spark.table("progress_stream")
        .collect().map(r => (r.getAs[Long]("processed"), r.getAs[Long]("failed"),
          r.getAs[Long]("totalGroups")))
      // update-mode sink keeps one row per emitted update: batch1 then batch2;
      // the second proves state carried over (2+1 processed, not 1)
      assert(updates.toSet == Set((2L, 1L, 3L), (3L, 1L, 3L)))
    } finally q.stop()
  }
}
