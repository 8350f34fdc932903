package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming GK quantile monitor: the ε·n rank envelope against exact
  * driver ranks (the contract — estimate equality across batchings is
  * explicitly NOT promised), exactness below the first compression, NULL
  * stance, per-key isolation, bounded summary size, helper hand-traces.
  */
class StreamingQuantilesSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  private def latest(name: String): Map[String, (Long, Long, Seq[Double])] = {
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Double](3)))
    val newest = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter(t => t._2 == newest(t._1))
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  private def run(name: String, phis: Seq[Double], eps: Double,
      batches: Seq[Seq[(String, Option[Double])]])
      : Map[String, (Long, Long, Seq[Double])] = {
    val src = MemoryStream[(String, Option[Double])]
    val q = StreamingQuantiles
      .quantileStream(src.toDF().toDF("key", "v"), col("key"), col("v"),
        phis, eps)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      latest(name)
    } finally q.stop()
  }

  /** The pinned contract: est arrived, and its exact-rank interval
    * intersects [⌈φn⌉ − εn, ⌈φn⌉ + εn].
    */
  private def assertEnvelope(values: Seq[Double], est: Double, phi: Double,
      eps: Double): Unit = {
    assert(values.contains(est), s"estimate $est never arrived")
    val n = values.size
    val r = math.ceil(phi * n)
    val t = eps * n
    val rLo = values.count(_ < est) + 1 // smallest rank est can claim
    val rHi = values.count(_ <= est)    // largest
    assert(rHi >= r - t && rLo <= r + t,
      s"phi=$phi: est $est rank interval [$rLo,$rHi] misses [${r - t},${r + t}]")
  }

  test("rank envelope holds on 5000 values, whatever the batching") {
    val phis = Seq(0.1, 0.5, 0.9, 0.99)
    val eps = 0.02
    // deterministic pseudo-random stream with duplicates and a heavy tail
    val values = (1 to 5000).map(i =>
      ((i * 2654435761L) % 997).toDouble + (if (i % 13 == 0) 5000.0 else 0.0))
    val data = values.map(v => ("s", Option(v)))
    val one = run("gk1", phis, eps, Seq(data))
    val three = run("gk2", phis, eps,
      Seq(data.take(11), data.slice(11, 3200), data.drop(3200)))
    for (out <- Seq(one, three); (phi, est) <- phis.zip(out("s")._3))
      assertEnvelope(values, est, phi, eps)
    assert(one("s")._1 == 5000L && one("s")._2 == 5000L)
  }

  test("exact order statistics before the first compression") {
    // 9 values < compress cadence (1/(2·0.05) = 10); all interior Δ are
    // ⌊2εn⌋−1 = 0 for n ≤ 10, so the summary is the exact sorted multiset
    val values = Seq(7.0, 1.0, 9.0, 3.0, 5.0, 2.0, 8.0, 4.0, 6.0)
    val out = run("gk3", Seq(0.5), 0.05, Seq(values.map(v => ("k", Option(v)))))
    val est = out("k")._3.head
    val n = values.size
    val r = math.ceil(0.5 * n) // 5; t = 0.45 → exact rank-5 value
    assert(est == values.sorted.apply(r.toInt - 1), s"got $est")
  }

  test("NULL values count in n_events, never in the summary") {
    val out = run("gk4", Seq(0.5), 0.05, Seq(Seq(
      ("k", Option(1.0)), ("k", None), ("k", Option(3.0)), ("k", None))))
    val (nEv, nVal, qs) = out("k")
    assert(nEv == 4L && nVal == 2L)
    assert(qs.head == 1.0 || qs.head == 3.0)
    val allNull = run("gk5", Seq(0.5), 0.05,
      Seq(Seq(("z", Option.empty[Double]))))
    assert(allNull("z")._2 == 0L && allNull("z")._3.head.isNaN)
  }

  test("keys are isolated") {
    val a = (1 to 200).map(i => ("a", Option(i.toDouble)))
    val b = (1 to 200).map(i => ("b", Option(i * 100.0)))
    val out = run("gk6", Seq(0.5), 0.02, Seq(a ++ b))
    assert(math.abs(out("a")._3.head - 100.0) <= 10.0)
    assert(math.abs(out("b")._3.head - 10000.0) <= 1000.0)
  }

  test("summary stays bounded under compression") {
    import StreamingQuantiles.{insert, compress, GkState}
    val eps = 0.02
    var st = GkState(Array.emptyDoubleArray, Array.emptyLongArray,
      Array.emptyLongArray, 0L, 0L)
    val cadence = math.ceil(1.0 / (2.0 * eps)).toInt
    (1 to 20000).foreach { i =>
      st = insert(st, ((i * 48271L) % 9973).toDouble, eps)
      if (st.n % cadence == 0) st = compress(st, eps)
    }
    // GK bound is O((1/ε)·log(εn)) ≈ 50·log2(400) ≈ 430; assert a loose cap
    assert(st.vs.length <= 1500, s"summary grew to ${st.vs.length}")
    assert(st.n == 20000L)
    // tuples sorted; ends exact
    assert(st.vs.toSeq == st.vs.toSeq.sorted)
    assert(st.ds(0) == 0L && st.ds(st.ds.length - 1) == 0L)
  }

  test("insert/compress/query hand-traces") {
    import StreamingQuantiles.{insert, compress, query, GkState}
    var st = GkState(Array.emptyDoubleArray, Array.emptyLongArray,
      Array.emptyLongArray, 0L, 0L)
    Seq(5.0, 1.0, 9.0).foreach(v => st = insert(st, v, 0.1))
    assert(st.vs.toSeq == Seq(1.0, 5.0, 9.0))
    assert(st.gs.toSeq == Seq(1L, 1L, 1L))
    assert(st.n == 3L)
    // n=3, eps=0.1: query(0.5) → r=2, t=0.3; rmin walk: 1(+0)≤2.3,
    // 2(+Δ₂=0)≤2.3, 3>2.3 → previous tuple = 5.0
    assert(query(st, 0.5, 0.1) == 5.0)
    // compress with a huge eps merges interior tuples into the max but
    // keeps both ends
    val c = compress(st.copy(n = 100L), 0.2) // cap = 40
    assert(c.vs.head == 1.0 && c.vs.last == 9.0 && c.vs.length <= 3)
    assert(c.gs.sum == st.gs.sum) // ranks preserved under merges
  }
}
