package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class DrEv(grp: String, ts: Timestamp, value: Long)

/** Streaming windowed KS drift vs a fixed reference: watermark-driven
  * window close, integral statistic equality, per-group independence.
  */
class StreamingDriftSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  /** The batch operator's integral KS for a window vs reference. */
  private def ks(win: Map[Long, Long], ref: Map[Long, Long]): Long = {
    val nW = win.values.sum; val nR = ref.values.sum
    var cw = 0L; var cr = 0L; var d = 0L
    (win.keySet ++ ref.keySet).toSeq.sorted.foreach { k =>
      cw += win.getOrElse(k, 0L); cr += ref.getOrElse(k, 0L)
      d = math.max(d, math.abs(cw * nR - cr * nW))
    }
    d
  }

  test("windows close on watermark; KS matches the integral formula") {
    val ref = Map(1L -> 2L, 2L -> 2L) // uniform over {1,2}
    val src = MemoryStream[DrEv]
    val q = StreamingDrift.ksDriftStream(src.toDF(), col("grp"), col("ts"),
        col("value"), windowSeconds = 60L, reference = ref)
      .writeStream.format("memory").queryName("dr1").outputMode("append")
      .start()
    try {
      // window [0,60): group a matches the reference shape, group b is
      // all-2s (shifted); nothing closes until the watermark passes 60 s
      src.addData(DrEv("a", t(1), 1), DrEv("a", t(2), 2),
        DrEv("a", t(3), 1), DrEv("a", t(4), 2),
        DrEv("b", t(5), 2), DrEv("b", t(6), 2))
      q.processAllAvailable()
      assert(spark.table("dr1").count() == 0) // still open
      // an event at 130 s pushes the watermark past the window end
      src.addData(DrEv("a", t(130), 1))
      q.processAllAvailable()
      val out = spark.table("dr1").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(out("a") == ((0L, 4L, ks(Map(1L -> 2L, 2L -> 2L), ref))))
      assert(out("a")._3 == 0L)               // same shape: zero drift
      assert(out("b") == ((0L, 2L, ks(Map(2L -> 2L), ref))))
      assert(out("b")._3 == 4L)               // |2*4 - 2*2| at v=1
    } finally q.stop()
  }

  test("consecutive windows emit independently per group") {
    val ref = Map(0L -> 1L)
    val src = MemoryStream[DrEv]
    val q = StreamingDrift.ksDriftStream(src.toDF(), col("grp"), col("ts"),
        col("value"), windowSeconds = 10L, reference = ref)
      .writeStream.format("memory").queryName("dr2").outputMode("append")
      .start()
    try {
      src.addData(DrEv("g", t(1), 0), DrEv("g", t(12), 0), DrEv("g", t(13), 0))
      q.processAllAvailable()
      src.addData(DrEv("g", t(40), 0)) // watermark past both windows
      q.processAllAvailable()
      val out = spark.table("dr2").collect()
        .map(r => (r.getLong(1) / 1000000L, r.getLong(2), r.getLong(3)))
        .toSet
      assert(out == Set((0L, 1L, 0L), (10L, 2L, 0L))) // two closed windows
    } finally q.stop()
  }
}
