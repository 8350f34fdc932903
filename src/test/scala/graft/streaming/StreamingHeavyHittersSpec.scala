package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming SpaceSaving heavy hitters: bounded state, cross-batch carry,
  * the coverage + bracket guarantees against exact batch counts.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  /** The documented consumer contract: per partition, keep only the rows
    * of the NEWEST stamp (earlier emissions may reference since-evicted
    * items), then index by item. */
  private def latest(name: String): Map[String, (Long, Long)] = {
    val rows = spark.table(name).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val newest = rows.groupBy(_._1).view.mapValues(_.map(_._5).max).toMap
    rows.filter(t => t._5 == newest(t._1))
      .map(t => t._2 -> ((t._3, t._4))).toMap
  }

  test("heavy item survives eviction pressure; bounds bracket true count") {
    val src = MemoryStream[String]
    val q = StreamingHeavyHitters
      .spaceSavingStream(src.toDF().toDF("item"), col("item"),
        partitions = 1, capacity = 8)
      .writeStream.format("memory").queryName("hh1").outputMode("append")
      .start()
    // 60x "big", 30x "mid", 40 distinct one-off fillers, two batches
    val batch1 = Seq.fill(30)("big") ++ (1 to 20).map(i => s"f$i") ++
      Seq.fill(15)("mid")
    val batch2 = Seq.fill(30)("big") ++ (21 to 40).map(i => s"f$i") ++
      Seq.fill(15)("mid")
    try {
      src.addData(batch1: _*); q.processAllAvailable()
      src.addData(batch2: _*); q.processAllAvailable()
      val out = latest("hh1")
      // state bound: never more than capacity tracked items per partition
      assert(out.size <= 8)
      // coverage: anything above n/capacity (130/8) must be tracked
      assert(out.contains("big") && out.contains("mid"))
      val (bigEst, bigErr) = out("big")
      assert(bigEst >= 60L && bigEst - bigErr <= 60L) // est ≥ true ≥ est−err
      val (midEst, midErr) = out("mid")
      assert(midEst >= 30L && midEst - midErr <= 30L)
    } finally q.stop()
  }

  test("merged summaries match the batch hitter set on the x36 corpus") {
    // batch↔stream parity on the SAME corpus x36 audits: the documents
    // token stream (31 real tokens, counts ~900) plus a 5000-item one-off
    // tail for genuine eviction pressure. Per partition p with total n_p
    // and threshold T_p = n_p/capacity, SpaceSaving guarantees
    //   {true > T_p} ⊆ tracked,   est ≥ true ≥ est − err,   err ≤ T_p,
    // so the sketch's GUARANTEED set {est − err > T_p} is sandwiched:
    //   {true > 2·T_p} ⊆ guaranteed ⊆ {true > T_p}.
    // Here every real token has true > 2·T_p and every tail item true = 1,
    // so the guaranteed set must EQUAL the exact batch hitter set.
    val partitions = 4
    val capacity = 64
    val toks = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(graft.extensions.TextAnalysis.tokens(col("text")))
        .as("item"))
    val tail = (1 to 5000).map(i => s"rare$i").toDF("item")
    val corpus = toks.unionByName(tail)
      .select(col("item"),
        pmod(xxhash64(col("item")), lit(partitions)).cast("int").as("part"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val trueCnt = corpus.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nPart = corpus.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def thresh(p: Int): Double = nPart(p).toDouble / capacity

    val src = MemoryStream[String]
    val q = StreamingHeavyHitters
      .spaceSavingStream(src.toDF().toDF("item"), col("item"),
        partitions = partitions, capacity = capacity)
      .writeStream.format("memory").queryName("hh3").outputMode("append")
      .start()
    try {
      // three interleaved batches so hitters and tail mix across batches
      val items = corpus.map(_._1)
      items.grouped((items.length + 2) / 3).foreach { b =>
        src.addData(b.toSeq: _*); q.processAllAvailable()
      }
      val merged = latest("hh3") // item -> (est, err), newest stamp per part
      val partOf = corpus.map { case (i, p) => i -> p }.toMap
      // bracket + err bound on every tracked item
      for ((item, (est, err)) <- merged) {
        val t = trueCnt(item)
        assert(est >= t && t >= est - err, s"$item: $est/$err vs true $t")
        assert(err <= thresh(partOf(item)) + 1e-9, s"$item err above n_p/cap")
      }
      // coverage: every exact hitter is tracked
      val exactHitters = trueCnt.filter { case (i, c) =>
        c > thresh(partOf(i)) }.keySet
      assert(exactHitters.subsetOf(merged.keySet))
      // the sandwich, collapsing to EQUALITY on this corpus
      val guaranteed = merged.collect { case (i, (est, err))
        if est - err > thresh(partOf(i)) => i }.toSet
      val overTwice = trueCnt.filter { case (i, c) =>
        c > 2 * thresh(partOf(i)) }.keySet
      assert(overTwice.subsetOf(guaranteed))
      assert(guaranteed.subsetOf(exactHitters))
      assert(guaranteed == exactHitters,
        s"guaranteed ${guaranteed.size} vs exact ${exactHitters.size}")
      assert(guaranteed.forall(!_.startsWith("rare")) && guaranteed.size >= 25)
    } finally q.stop()
  }

  test("items hash to stable partitions; per-partition totals stamp rows") {
    val src = MemoryStream[String]
    val q = StreamingHeavyHitters
      .spaceSavingStream(src.toDF().toDF("item"), col("item"),
        partitions = 4, capacity = 4)
      .writeStream.format("memory").queryName("hh2").outputMode("append")
      .start()
    try {
      src.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b"): _*)
      q.processAllAvailable()
      val rows = spark.table("hh2").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(4)))
      // each item lives in exactly one partition
      assert(rows.groupBy(_._2).forall(_._2.map(_._1).distinct.size == 1))
      // a partition's stamp equals the events it actually processed
      val byPart = rows.groupBy(_._1)
      assert(byPart.forall { case (_, rs) =>
        rs.map(_._4).distinct.size == 1 && rs.map(_._3).sum <= rs.head._4
      })
    } finally q.stop()
  }
}
