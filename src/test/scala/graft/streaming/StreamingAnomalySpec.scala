package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class NEv(event_id: Long, ts: Timestamp, event_type: String,
  value: Double)

/** Streaming rolling z-score anomalies: cross-batch ring carry, spike
  * detection, stream ≡ batch equality on in-order streams.
  */
class StreamingAnomalySpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private def t(i: Int) = new Timestamp(3600000L + i * 1000L)

  private def rows(name: String) =
    spark.table(name).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(6)))).toMap

  test("spike flags across batches; ring carries forward; batch parity") {
    val src = MemoryStream[NEv]
    val q = StreamingAnomaly.anomaliesStream(src.toDF(), col("event_type"),
        col("ts"), col("event_id"), col("value"),
        window = 50, z = 3, minPrev = 20)
      .writeStream.format("memory").queryName("sa1").outputMode("append")
      .start()
    val all = (1 to 30).map(i =>
      NEv(i.toLong, t(i), "m", 10.0 + (i % 3) * 0.5)) :+
      NEv(31L, t(31), "m", 100.0)
    try {
      // two batches: the ring must carry the first 15 into the second
      src.addData(all.take(15): _*)
      q.processAllAvailable()
      src.addData(all.drop(15): _*)
      q.processAllAvailable()
      val out = rows("sa1")
      assert(out(31L)._2, "spike must flag")
      assert(out.count(_._2._2) == 1, "only the spike flags")
      assert(out(16L)._1 == 15L, "ring carried across the batch boundary")
      // batch operator agrees row for row (in-order stream)
      val batch = graft.ops.Anomaly.rollingZScore(all.toDF(),
          col("event_type"), Seq(col("ts"), col("event_id")),
          Seq("event_id"), col("value"), window = 50, z = 3, minPrev = 20)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(3), r.getBoolean(6)))).toMap
      assert(rows("sa1") == batch)
    } finally q.stop()
  }

  test("independent keys keep independent rings") {
    val src = MemoryStream[NEv]
    val q = StreamingAnomaly.anomaliesStream(src.toDF(), col("event_type"),
        col("ts"), col("event_id"), col("value"),
        window = 50, z = 3, minPrev = 2)
      .writeStream.format("memory").queryName("sa2").outputMode("append")
      .start()
    try {
      // key a: constant 5.0 then a 9.0 jump; key b: constant 9.0 (no jump)
      val a = (1 to 5).map(i => NEv(i.toLong, t(i), "a", 5.0)) :+
        NEv(6L, t(6), "a", 9.0)
      val b = (11 to 16).map(i => NEv(i.toLong, t(i), "b", 9.0))
      src.addData(a ++ b: _*)
      q.processAllAvailable()
      val out = rows("sa2")
      assert(out(6L)._2, "jump on key a flags against a's ring")
      assert(!out(16L)._2, "9.0 is normal for key b")
    } finally q.stop()
  }
}
