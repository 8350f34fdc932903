package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming bottom-k sketch: ELEMENT-WISE equality with the batch-built
  * sketch (the min-k fold is order/batching-invariant — the contract that
  * distinguishes this from the HLL monitor's envelope-only parity), KMV
  * estimate behavior, null stance, bounded state.
  */
class StreamingBottomKSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  private def latest(name: String): Map[String, (Long, Seq[Long], Long)] = {
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
    val newest = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter(t => t._2 == newest(t._1))
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  private def run(name: String, k: Int, batches: Seq[Seq[(String, Option[Long])]])
      : Map[String, (Long, Seq[Long], Long)] = {
    val src = MemoryStream[(String, Option[Long])]
    val q = StreamingBottomK
      .bottomKStream(src.toDF().toDF("key", "v"), col("key"), col("v"), k)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      latest(name)
    } finally q.stop()
  }

  /** The batch twin: k smallest xxhash64 of the distinct non-null items,
    * hashed over the STRING form — the exact hash stream
    * `Sketches.bottomKOverlap` draws from (`term.cast("string")`). The
    * items here are Longs, so this test is the non-string-item parity
    * check: if the stream hashed the raw typed value instead, every
    * element would differ and overlap comparability would silently break.
    */
  private def batchSketch(items: Seq[Long], k: Int): Seq[Long] =
    items.toDF("v").select(xxhash64(col("v").cast("string")).as("h")).distinct()
      .orderBy("h").limit(k).collect().map(_.getLong(0)).toSeq

  test("stream sketch == batch sketch element-wise, whatever the batching") {
    val k = 64
    val items = (1 to 2000).map(i => (i * 13 % 777).toLong) // 777 distinct
    val data = items.map(v => ("s", Some(v)))
    val expected = batchSketch(items, k)
    val one = run("bk1", k, Seq(data))
    val three = run("bk2", k, Seq(data.take(7), data.slice(7, 1500), data.drop(1500)))
    assert(one("s")._2 == expected)
    assert(three("s")._2 == expected)
    assert(one("s")._1 == 2000L && three("s")._1 == 2000L)
  }

  test("estimate: exact below k, inside the KMV envelope above") {
    val k = 256
    val small = run("bk3", k, Seq((1 to 100).map(i => ("a", Some(i.toLong)))))
    assert(small("a")._2.length == 100 && small("a")._3 == 100L)
    val n = 5000
    val big = run("bk4", k,
      Seq((1 to 3 * n).map(i => ("b", Some((i % n).toLong)))))
    val est = big("b")._3
    // KMV rsd ≈ 1/sqrt(k−2) ≈ 6.3%; 4 standard errors
    assert(math.abs(est - n) <= (4.0 * n / math.sqrt(k - 2)).toLong,
      s"estimate $est outside envelope of $n")
    assert(big("b")._2.length == k)
  }

  test("NULL items count as events but never enter the sketch") {
    val out = run("bk5", 16, Seq(Seq(
      ("k", Some(1L)), ("k", None), ("k", Some(2L)), ("k", None))))
    val (n, sk, est) = out("k")
    assert(n == 4L && sk.length == 2 && est == 2L)
  }

  test("insert helper: dedup, qualify, bounded length, sorted") {
    import StreamingBottomK.insert
    var hs = Array.emptyLongArray
    Seq(5L, 1L, 9L, 5L, 3L, 7L).foreach(h => hs = insert(hs, h, 4))
    assert(hs.toSeq == Seq(1L, 3L, 5L, 7L))         // 9 evicted, dup 5 ignored
    assert(insert(hs, 8L, 4).toSeq == Seq(1L, 3L, 5L, 7L)) // doesn't qualify
    assert(insert(hs, 0L, 4).toSeq == Seq(0L, 1L, 3L, 5L))
  }
}
