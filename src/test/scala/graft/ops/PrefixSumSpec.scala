package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PrefixSumSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("global cumsum == driver-side scan, across many partitions and orders") {
    val rng = new scala.util.Random(41)
    val rows = (1 to 5000).map(i => (i.toLong, rng.nextInt(100).toLong))
    // shuffled input over 16 partitions — the op must impose the global order
    val df = spark.createDataFrame(rng.shuffle(rows)).toDF("k", "v").repartition(16)
    val got = PrefixSum.withGlobalCumsum(df, col("v"), "cum", col("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    var acc = 0L
    for ((k, v) <- rows) {
      acc += v
      assert(got(k) == acc, s"k=$k")
    }
    // and the plan is not a single-partition window
    val plan = PrefixSum.withGlobalCumsum(df, col("v"), "cum", col("k"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Window"), plan)
  }

  test("stratum cumsum == per-stratum driver scan, hot stratum included") {
    val rng = new scala.util.Random(43)
    // stratum "hot" holds 80% of rows — the shape a per-stratum window would
    // buffer in one task; the parallel scan must still match the driver scan
    val rows = (1 to 5000).map { i =>
      val s = if (rng.nextInt(10) < 8) "hot" else s"s${rng.nextInt(4)}"
      (i.toLong, s, rng.nextInt(100).toLong)
    }
    val df = spark.createDataFrame(rng.shuffle(rows)).toDF("k", "s", "v").repartition(16)
    val got = PrefixSum.withStratumCumsum(df, col("s"), col("v"), "cum", col("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    for ((k, s, v) <- rows.sortBy(_._1)) {
      acc(s) = acc.getOrElse(s, 0L) + v
      assert(got(k) == acc(s), s"k=$k s=$s")
    }
    val plan = PrefixSum.withStratumCumsum(df, col("s"), col("v"), "cum", col("k"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Window"), plan)
  }

  test("null weight counts as 0, null stratum forms its own stratum (no NPE)") {
    val df = spark.createDataFrame(Seq(
      (1L, Some("a"), Some(5L)),
      (2L, Some("a"), None), // null weight: contributes 0
      (3L, Some("a"), Some(7L)),
      (4L, None, Some(3L)), // null stratum: own group, not a crash
      (5L, None, Some(4L))
    )).toDF("k", "s", "v")
    val got = PrefixSum.withStratumCumsum(df, col("s"), col("v"), "cum", col("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 12L, 4L -> 3L, 5L -> 7L))
    val g = PrefixSum.withGlobalCumsum(df, col("v"), "cum", col("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    assert(g == Map(1L -> 5L, 2L -> 5L, 3L -> 12L, 4L -> 15L, 5L -> 19L))
  }

  test("packStream: stream positions contiguous, packs cut at the budget") {
    val chunks = Seq(
      (1L, 0L, 10), (1L, 1L, 10), (2L, 0L, 7), (3L, 0L, 10), (3L, 1L, 3)
    ).toDF("id", "chunk_idx", "n_tokens")
    val out = PrefixSum.packStream(chunks, col("n_tokens"), budget = 16,
        col("id"), col("chunk_idx"))
      .orderBy("stream_pos").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("stream_pos"), r.getAs[Long]("pack_id")))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L), // tokens [0,10) → pack 0
      (1L, 1L, 10L, 0L), // starts at 10 < 16 → pack 0
      (2L, 0L, 20L, 1L), // starts at 20 → pack 1
      (3L, 0L, 27L, 1L),
      (3L, 1L, 37L, 2L)))
  }
}
