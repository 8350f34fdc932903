package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming HLL distinct-count monitor: error envelope vs exact counts,
  * batching invariance (register max is order-independent), per-key
  * isolation, bounded state shape.
  */
class StreamingCardinalitySpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  /** Newest stamp per key (the documented consumer contract):
    * key -> (n_events, n_valued, approx_distinct).
    */
  private def latest(name: String): Map[String, (Long, Long, Long)] = {
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val newest = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter(t => t._2 == newest(t._1))
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  private def run(name: String, batches: Seq[Seq[(String, Long)]])
      : Map[String, (Long, Long, Long)] = {
    val src = MemoryStream[(String, Long)]
    val q = StreamingCardinality
      .distinctCountStream(src.toDF().toDF("key", "v"), col("key"), col("v"))
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      latest(name)
    } finally q.stop()
  }

  test("estimates track exact counts within the p=12 error envelope") {
    // key a: 1000 distinct over 3000 rows; key b: 1 distinct over 50 rows
    val a = (1 to 3000).map(i => ("a", (i % 1000).toLong))
    val b = (1 to 50).map(_ => ("b", 7L))
    val out = run("card1", Seq(a.take(1200) ++ b.take(20),
      a.slice(1200, 2400) ++ b.drop(20), a.drop(2400)))
    val (na, va, ea) = out("a")
    assert(na == 3000L && va == 3000L)
    assert(math.abs(ea - 1000L) <= 50L)   // ~3x the 1.6% rsd at p=12
    assert(out("b") == ((50L, 50L, 1L)))  // tiny sets are near-exact
  }

  test("batch composition does not change the final estimate") {
    val data = (1 to 2000).map(i => ("k", (i * 7 % 613).toLong))
    val one = run("card2", Seq(data))
    val three = run("card3", Seq(data.take(5), data.slice(5, 1500), data.drop(1500)))
    assert(one("k") == three("k")) // register max is batching-invariant
  }

  test("keys hold independent registers") {
    val out = run("card4", Seq(
      (1 to 100).map(i => ("x", i.toLong)) ++ Seq(("y", 1L), ("y", 1L))))
    assert(out("y") == ((2L, 2L, 1L)))
    assert(math.abs(out("x")._3 - 100L) <= 10L)
  }

  test("estimator helper: empty registers say 0") {
    assert(StreamingCardinality.estimate(new Array[Byte](4096)) == 0L)
  }

  test("NULL values count as events but never as a distinct value") {
    // xxhash64(NULL) would hash to the seed — without the null guard a NULL
    // value read as one distinct value, while the batch twin
    // (approx_count_distinct) ignores NULLs entirely. But n_events is a
    // throughput signal: every event for the key counts, NULL-valued or
    // not; n_valued carries the estimate's own denominator.
    val src = MemoryStream[(String, Option[Long])]
    val q = StreamingCardinality
      .distinctCountStream(src.toDF().toDF("key", "v"), col("key"), col("v"))
      .writeStream.format("memory").queryName("cardnull").outputMode("append")
      .start()
    try {
      src.addData(("k", Some(1L)), ("k", Some(2L)), ("k", None), ("k", None))
      q.processAllAvailable()
      // 4 events total, 2 non-NULL-valued, 2 distinct non-null values
      assert(latest("cardnull")("k") == ((4L, 2L, 2L)))
    } finally q.stop()
  }

  test("stream and batch estimates both land in the exact count's envelope") {
    // The stream estimator (classic HLL over xxhash64, p=12) and the batch
    // twin (Spark's HLL++ in approx_count_distinct) use DIFFERENT register
    // schemes — estimate EQUALITY is not the contract (COVERAGE documents
    // the divergence bound). What is pinned: each estimator independently
    // lands within ~3 standard errors (3·1.04/√4096 ≈ 4.9%) of the exact
    // distinct count, so their mutual divergence is bounded by the sum of
    // envelopes on ANY corpus, not just this one.
    val n = 5000
    val data = (1 to 3 * n).map(i => ("k", (i % n).toLong))
    val (events, valued, streamEst) = run("cardpar", Seq(data))("k")
    assert(events == 3L * n && valued == 3L * n)
    val batchEst = data.toDF("key", "v")
      .agg(approx_count_distinct(col("v"), 0.0163).as("e")) // rsd at p=12
      .collect()(0).getLong(0)
    val env = math.ceil(3 * 1.04 / math.sqrt(4096) * n).toLong
    assert(math.abs(streamEst - n) <= env,
      s"stream estimate $streamEst outside exact±$env")
    assert(math.abs(batchEst - n) <= env,
      s"batch estimate $batchEst outside exact±$env")
  }
}
