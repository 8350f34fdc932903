package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The GK quantile monitor driven through a REAL parquet file source over
  * the sf0.01 events table (round-13 verdict ask #5): the MemoryStream
  * suite pins the math on driver-built values; this one exercises the
  * operator end-to-end the way production would run it — schema'd
  * readStream, maxFilesPerTrigger-paced micro-batches, state carried
  * across batches by the store — and envelope-checks the final estimates
  * per key against exact ranks from a batch read of the SAME files.
  */
class StreamingQuantilesFileSourceSpec extends AnyFunSuite with SparkTestSession {

  test("sf0.01 events as a 4-batch file stream: counts exact, ranks in envelope") {
    val eps = 0.01
    val phis = Seq(0.1, 0.5, 0.9)
    val batch = spark.read.parquet("/root/testdata/sf0.01/events.parquet")

    // stage as 4 files so maxFilesPerTrigger=1 forces the state to survive
    // multiple real micro-batches (a single batch would never exercise the
    // cross-batch merge the monitor exists for)
    val in = Files.createTempDirectory("graft-qstream-in").toString
    batch.repartition(4).write.mode("overwrite").parquet(in)

    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingQuantiles
      .quantileStream(src, col("event_type"), col("value"), phis, eps)
      .writeStream.format("memory").queryName("gk_file_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val emitted = spark.table("gk_file_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Double](3)))
    // one emission per (micro-batch, key present) — with 5 keys spread
    // across 4 files there must be strictly more rows than keys, or the
    // stream degenerated to a single batch
    assert(emitted.length > 5, s"only ${emitted.length} emissions — " +
      "expected multiple micro-batches over 4 staged files")

    // final row per key = the emission with the highest cumulative count
    val latest = emitted.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val exact = batch.filter(col("event_type").isNotNull)
      .select(col("event_type"), col("value").cast("double"))
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_ =>
        r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(latest.keySet === exact.keySet)

    exact.foreach { case (key, vs) =>
      val (_, nEvents, nValued, ests) = latest(key)
      assert(nEvents === vs.size.toLong, s"$key: n_events")
      assert(nValued === vs.flatten.size.toLong, s"$key: n_valued")
      val values = vs.flatten.sorted
      phis.zip(ests).foreach { case (phi, est) =>
        assert(values.contains(est), s"$key phi=$phi: $est never arrived")
        val n = values.size
        val r = math.ceil(phi * n)
        val t = eps * n
        val rLo = values.count(_ < est) + 1
        val rHi = values.count(_ <= est)
        assert(rHi >= r - t && rLo <= r + t,
          s"$key phi=$phi: est $est rank interval [$rLo,$rHi] misses " +
            s"[${r - t},${r + t}]")
      }
    }
  }
}
