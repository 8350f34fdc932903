package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extensions.Similarity

/** Streaming IVF-SQ8 monitor: STRICT parity with the batch ivfSq8TopK on
  * the same rows (same cells, same min/max stats, same rounded asymmetric
  * distance), batching invariance, null/empty-vector stance, bounded
  * rank-sorted state — the [[StreamingIvfPqSpec]] contract applied to the
  * recall-critical 4x compression point.
  */
class StreamingIvfSq8Spec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  // 4-dim space, 3 coarse cells; SQ8 stats spanning the value range so
  // quantization is lossy-but-bounded (NOT grid-aligned — parity must hold
  // through real rounding error, both sides share the same expressions)
  private val cells: Seq[Seq[Double]] = Seq(
    Seq(0.0, 0.0, 0.0, 0.0), Seq(10.0, 10.0, 10.0, 10.0),
    Seq(0.0, 10.0, 0.0, 10.0))
  private val mins = Array(0.0, 0.0, 0.0, 0.0)
  private val maxs = Array(10.0, 10.0, 10.0, 10.0)

  /** Deterministic pseudo-random corpus: 48 vectors spread over the cells. */
  private val corpus: Seq[(Long, Seq[Double])] = (1L to 48L).map { i =>
    def c(j: Long) = ((i * 7 + j * 13) % 11).toDouble * 10.0 / 11.0
    (i, Seq(c(0), c(1), c(2), c(3)))
  }

  private val monitorQueries = Seq(
    (100L, Seq(1.0, 2.0, 3.0, 4.0)),
    (200L, Seq(9.0, 8.0, 7.0, 6.0)),
    (300L, Seq(0.0, 10.0, 1.0, 9.0)))

  private def latest(name: String): Map[Long, (Long, Seq[Long], Seq[Double])] = {
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2),
        r.getSeq[Double](3)))
    val newest = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter(t => t._2 == newest(t._1))
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  private def run(name: String, k: Int, nProbe: Int,
      batches: Seq[Seq[(Option[Long], Option[Seq[Double]])]])
      : Map[Long, (Long, Seq[Long], Seq[Double])] = {
    val src = MemoryStream[(Option[Long], Option[Seq[Double]])]
    val q = StreamingIvfSq8.ivfSq8Stream(
      src.toDF().toDF("id", "v"), col("id"), col("v"),
      monitorQueries.toDF("vec_id", "embedding"), k, cells, nProbe,
      mins, maxs)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      latest(name)
    } finally q.stop()
  }

  /** The batch twin over the same rows: per query, neighbors in rank order. */
  private def batchTopK(rows: Seq[(Long, Seq[Double])], k: Int, nProbe: Int)
      : Map[Long, (Seq[Long], Seq[Double])] =
    Similarity.ivfSq8TopK(monitorQueries.toDF("vec_id", "embedding"),
        rows.toDF("vec_id", "embedding"), k, cells, nProbe, mins, maxs)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(a => (a.map(_._2).toSeq, a.map(_._3).toSeq)).toMap

  test("stream monitor == batch ivfSq8TopK, whatever the batching") {
    val k = 5
    val data = corpus.map { case (i, v) => (Option(i), Option(v)) }
    val expected = batchTopK(corpus, k, nProbe = 2)
    val one = run("isq1", k, 2, Seq(data))
    val three = run("isq2", k, 2,
      Seq(data.take(5), data.slice(5, 30), data.drop(30)))
    for (qid <- expected.keys) {
      assert(one(qid)._2 == expected(qid)._1, s"ids, one batch, q$qid")
      assert(one(qid)._3 == expected(qid)._2, s"dists, one batch, q$qid")
      assert(three(qid)._2 == expected(qid)._1, s"ids, three batches, q$qid")
      assert(three(qid)._3 == expected(qid)._2, s"dists, three batches, q$qid")
    }
    // parity also on the prefix: the first 5 rows alone
    val prefix = batchTopK(corpus.take(5), k, nProbe = 2)
    val pfx = run("isq3", k, 2, Seq(data.take(5)))
    for (qid <- prefix.keys)
      assert(pfx(qid)._2 == prefix(qid)._1, s"prefix ids, q$qid")
  }

  test("nProbe=all degrades to the full asymmetric scan; k bounds state") {
    val k = 3
    val data = corpus.map { case (i, v) => (Option(i), Option(v)) }
    val expected = batchTopK(corpus, k, nProbe = cells.size)
    val got = run("isq4", k, cells.size, Seq(data))
    for (qid <- expected.keys) {
      assert(got(qid)._2 == expected(qid)._1)
      assert(got(qid)._2.length <= k)
    }
  }

  test("NULL id / NULL or empty vector drop; re-delivery is idempotent") {
    val k = 4
    val good = corpus.take(10).map { case (i, v) => (Option(i), Option(v)) }
    val noise: Seq[(Option[Long], Option[Seq[Double]])] = Seq(
      (None, Option(Seq(1.0, 1.0, 1.0, 1.0))),
      (Option(99L), None),
      (Option(98L), Option(Seq.empty[Double])))
    val clean = run("isq5", k, 2, Seq(good))
    val noisy = run("isq6", k, 2, Seq(good ++ noise ++ good))
    for (qid <- clean.keys) {
      assert(noisy(qid)._2 == clean(qid)._2, s"q$qid ids")
      assert(noisy(qid)._3 == clean(qid)._3, s"q$qid dists")
    }
  }

  test("guards: k, nProbe, mins/maxs validation") {
    val src = MemoryStream[(Option[Long], Option[Seq[Double]])]
    val df = src.toDF().toDF("id", "v")
    val q = monitorQueries.toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      StreamingIvfSq8.ivfSq8Stream(df, col("id"), col("v"), q, 0, cells, 1,
        mins, maxs)
    }
    intercept[IllegalArgumentException] {
      StreamingIvfSq8.ivfSq8Stream(df, col("id"), col("v"), q, 3, cells, 9,
        mins, maxs)
    }
    intercept[IllegalArgumentException] {
      StreamingIvfSq8.ivfSq8Stream(df, col("id"), col("v"), q, 3, cells, 1,
        mins, Array(1.0))
    }
  }
}
