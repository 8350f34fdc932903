package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extensions.Sampling

/** Streaming A-ES weighted sample: strict parity with the batch
  * Sampling.weightedSample selection (same sha-uniform, same key
  * arithmetic), batching invariance, re-delivery idempotence, exclusion
  * stances, bounded rank-sorted state.
  */
class StreamingWeightedSampleSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  private def latest(name: String): Map[String, (Long, Seq[String], Seq[Double])] = {
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2),
        r.getSeq[Double](3)))
    val newest = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter(t => t._2 == newest(t._1))
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  private def run(name: String, k: Int, salt: String,
      batches: Seq[Seq[(Option[String], Option[Long], Option[Double])]])
      : Map[String, (Long, Seq[String], Seq[Double])] = {
    val src = MemoryStream[(Option[String], Option[Long], Option[Double])]
    val q = StreamingWeightedSample
      .weightedSampleStream(src.toDF().toDF("s", "id", "w"),
        col("s"), col("id"), col("w"), k, salt)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      latest(name)
    } finally q.stop()
  }

  /** Driver replica of the portable A-ES key (SamplingSpec's formula). */
  private def aesKey(id: Long, w: Double, salt: String): Double = {
    val hex = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$id$salt".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    math.pow(u, 1.0 / w)
  }

  test("stream sample == batch selection, whatever the batching; rank order") {
    val k = 7
    val salt = "sws"
    val rows = (1 to 300).map { i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, (i % 17 + 1).toDouble)
    }
    val batch = Sampling.weightedSample(
        rows.toDF("s", "id", "w"), col("s"), col("id"), col("w"), k, salt)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val data = rows.map { case (s, id, w) => (Option(s), Option(id), Option(w)) }
    for ((name, bs) <- Seq(
        "ws1" -> Seq(data),
        "ws2" -> Seq(data.take(13), data.slice(13, 200), data.drop(200)))) {
      val got = run(name, k, salt, bs)
      for (s <- Seq("a", "b")) {
        val (n, ids, ws) = got(s)
        assert(n == 150L)
        assert(ids.map(_.toLong).zip(ws).toSet == batch(s), s"stratum $s")
        // emission is rank order: keys non-increasing down the sample
        val keys = ids.map(_.toLong).zip(ws).map { case (i, w) =>
          aesKey(i, w, salt)
        }
        assert(keys.sameElements(keys.sortBy(-_)), s"stratum $s order")
      }
    }
  }

  test("fewer eligible than k: the sample is exactly the eligible set") {
    val got = run("ws3", 10, "", Seq(Seq(
      (Some("s"), Some(1L), Some(2.0)), (Some("s"), Some(2L), Some(3.0)))))
    assert(got("s")._2.map(_.toLong).toSet == Set(1L, 2L))
  }

  test("ineligible events count in n_events but never sample; null stratum drops") {
    val got = run("ws4", 8, "", Seq(Seq(
      (Some("s"), Some(1L), Some(1.0)),
      (Some("s"), None, Some(1.0)),      // null id
      (Some("s"), Some(2L), Some(0.0)),  // non-positive weight
      (Some("s"), Some(3L), None),       // null weight
      (None, Some(4L), Some(1.0)))))     // null stratum: dropped entirely
    assert(got.keySet == Set("s"))
    val (n, ids, _) = got("s")
    assert(n == 4L && ids.toSeq == Seq("1"))
  }

  test("re-delivery is idempotent on the sample; events still count") {
    val rows = (1 to 50).map(i => (Option("s"), Option(i.toLong),
      Option((i % 5 + 1).toDouble)))
    val once = run("ws5", 6, "x", Seq(rows))
    val twice = run("ws6", 6, "x", Seq(rows, rows))
    assert(twice("s")._2.toSeq == once("s")._2.toSeq)
    assert(twice("s")._3.toSeq == once("s")._3.toSeq)
    assert(once("s")._1 == 50L && twice("s")._1 == 100L)
  }

  test("insert helper: qualify, evict, dedup, weight-change re-key, bound") {
    import StreamingWeightedSample.{insert, WsState}
    var st = WsState(Array.emptyDoubleArray, Array.empty[String],
      Array.emptyDoubleArray, 0L)
    st = insert(st, 0.5, "a", 1.0, 2)
    st = insert(st, 0.8, "b", 1.0, 2)
    st = insert(st, 0.3, "c", 1.0, 2) // does not qualify at k=2
    assert(st.ids.toSeq == Seq("b", "a"))
    st = insert(st, 0.9, "d", 1.0, 2) // evicts a
    assert(st.ids.toSeq == Seq("d", "b"))
    val same = insert(st, 0.9, "d", 1.0, 2) // identical re-delivery: no-op
    assert(same.ids.toSeq == Seq("d", "b"))
    // ...and a TRUE no-op: the short-circuit returns the state unchanged
    // without rebuilding the arrays (round-12 advisory: the old scan
    // stopped one slot past the identical entry, so this path never fired)
    assert(same eq st)
    val rekey = insert(st, 0.95, "b", 2.0, 2) // b re-keyed upward
    assert(rekey.ids.toSeq == Seq("b", "d") && rekey.ws.toSeq == Seq(2.0, 1.0))
    // a re-weighted id's STALE key never survives: the old entry is
    // dropped before qualification (round-12 advisory), so the id
    // re-enters the freed slot under its NEW (here: worse) key and
    // re-ranks accordingly instead of holding rank under the stale key
    val demoted = insert(st, 0.1, "d", 3.0, 2)
    assert(demoted.ids.toSeq == Seq("b", "d"))
    assert(demoted.as.toSeq == Seq(0.8, 0.1) && demoted.ws.toSeq == Seq(1.0, 3.0))
    // tie on key breaks by id ascending
    var t = WsState(Array.emptyDoubleArray, Array.empty[String],
      Array.emptyDoubleArray, 0L)
    t = insert(t, 0.7, "m", 1.0, 3)
    t = insert(t, 0.7, "k", 1.0, 3)
    assert(t.ids.toSeq == Seq("k", "m"))
  }
}
