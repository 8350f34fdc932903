package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extensions.Classify

/** Streaming NB scorer: STRICT stream ≡ batch parity (same rows, same model,
  * identical prediction tuples — the scorer is stateless exact-integer
  * arithmetic, so nothing may drift), batching invariance, and the
  * tie/OOV/token-less edges inherited from the batch contract.
  */
class StreamingClassifySpec extends AnyFunSuite with SparkTestSession {

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  import spark.implicits._

  private def model = Classify.nbTrain(
    Seq((1L, "en", "the cat"), (2L, "en", "the dog"), (3L, "de", "der hund"))
      .toDF("doc_id", "lang", "text"), col("lang"), col("text"))

  private def run(name: String, batches: Seq[Seq[(Long, String)]])
      : Map[Long, (Long, String, Long, String, Long)] = {
    val src = MemoryStream[(Long, String)]
    val q = StreamingClassify.classifyStream(
        src.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"), model)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3),
          r.getString(4), r.getLong(5)))).toMap
    } finally q.stop()
  }

  private val docs = Seq(
    10L -> "the cat", 11L -> "zzz", 12L -> "", 13L -> "der hund",
    14L -> "the the der", 15L -> "cat dog hund")

  test("stream predictions are IDENTICAL to the batch scorer's") {
    val streamed = run("scls1", Seq(docs.take(2), docs.slice(2, 5), docs.drop(5)))
    val batch = Classify.nbClassify(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3),
          r.getString(4), r.getLong(5)))).toMap
    assert(streamed == batch && streamed.size == docs.size)
  }

  test("batch composition never changes a prediction (stateless)") {
    val one = run("scls2", Seq(docs))
    val many = run("scls3", docs.map(Seq(_)))
    assert(one == many)
  }

  test("hand-traced edge rows: OOV, token-less priors-only") {
    val out = run("scls4", Seq(docs))
    assert(out(11L) == ((1L, "en", -2602690L, "de", 441832L)))
    assert(out(12L) == ((0L, "en", -405465L, "de", 693147L)))
  }
}
