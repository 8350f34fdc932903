package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("backward as-of: latest earlier right row, <= ties, per-key isolation") {
    val left = Seq(
      (1L, "a", t(15)),  // between right rows at t10 and t20 → r10
      (2L, "a", t(10)),  // exactly at r10 → <= semantics picks r10
      (3L, "a", t(0)),   // before any right row → null
      (4L, "b", t(50)),  // key isolation: only b's rows eligible
      (5L, "c", t(50))   // key with no right rows at all → null
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, "a", t(10), 1.5),
      (20L, "a", t(20), 2.5),
      (30L, "b", t(10), 9.0),
      (31L, "b", t(10), 9.5)  // (key, ts) tie → greater rightOrd (31) wins
    ).toDF("r_id", "k", "ts", "v")

    val out = AsOfJoin.backward(left, right, "k", "ts", "ts",
        rightPayload = Seq("r_id", "v"), rightOrd = "r_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("r_id")).map(_.toLong), Option(r.getAs[Any]("v"))))
      .toMap

    assert(out(1L)._1.contains(10L))
    assert(out(2L)._1.contains(10L)) // <= not <
    assert(out(3L)._1.isEmpty)
    assert(out(4L) == (Some(31L), Some(9.5)))
    assert(out(5L)._1.isEmpty)
    assert(out.size == 5)
  }

  test("randomized: union+carry equals the naive range-join formulation") {
    val rng = new scala.util.Random(17)
    val left = (1 to 400).map(i => (i.toLong, s"k${i % 5}", t(rng.nextInt(300))))
      .toDF("event_id", "k", "ts")
    val right = (1 to 150).map(i =>
      (1000L + i, s"k${i % 5}", t(rng.nextInt(300)), rng.nextInt(100).toDouble))
      .toDF("r_id", "k", "ts", "v")

    val fast = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("r_id", "v"), "r_id")
      .select("event_id", "r_id", "v")
    // naive oracle: range join, keep the latest right (ties: max r_id) per left
    val naive = left.join(right.withColumnRenamed("ts", "r_ts"), Seq("k"), "left")
      .filter(col("r_ts").isNull || col("r_ts") <= col("ts"))
      .groupBy("event_id")
      .agg(max_by(struct(col("r_id"), col("v")), struct(col("r_ts"), col("r_id")))
        .as("best"))
      .select(col("event_id"), col("best.r_id").as("r_id"), col("best.v").as("v"))
    // rows whose every candidate was filtered out vanish from the naive join —
    // re-add them as null matches
    val naiveAll = left.select("event_id").join(naive, Seq("event_id"), "left")

    assert(fast.count() == 400 && naiveAll.count() == 400)
    assert(fast.exceptAll(naiveAll).isEmpty && naiveAll.exceptAll(fast).isEmpty)
  }

  test("bucketed carry == plain carry on a 90%-one-key skewed feed, both directions") {
    // the skew shape the bucketed variant exists for: key "hot" carries 90%
    // of both sides; ties and sparse-bucket boundaries included
    val rng = new scala.util.Random(29)
    def k(i: Int) = if (i % 10 != 0) "hot" else s"cold${i % 3}"
    val left = (1 to 500).map(i => (i.toLong, k(i), t(rng.nextInt(600))))
      .toDF("event_id", "k", "ts")
    val right = (1 to 200).map(i =>
      (1000L + i, k(i), t(rng.nextInt(600)), rng.nextInt(50).toDouble))
      .toDF("r_id", "k", "ts", "v")

    for (widthMinutes <- Seq(1L, 7L, 100L, 100000L)) { // tiny buckets ... one bucket
      val micros = widthMinutes * 60L * 1000000L
      val plainB = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("r_id", "v"), "r_id")
      val buckB = AsOfJoin.backwardBucketed(left, right, "k", "ts", "ts",
        Seq("r_id", "v"), "r_id", micros)
      assert(buckB.exceptAll(plainB).isEmpty && plainB.exceptAll(buckB).isEmpty,
        s"backward width=${widthMinutes}m")

      val plainF = AsOfJoin.forward(left, right, "k", "ts", "ts", Seq("r_id", "v"), "r_id")
      val buckF = AsOfJoin.forwardBucketed(left, right, "k", "ts", "ts",
        Seq("r_id", "v"), "r_id", micros)
      assert(buckF.exceptAll(plainF).isEmpty && plainF.exceptAll(buckF).isEmpty,
        s"forward width=${widthMinutes}m")
    }
  }

  test("bucketed carry fans a hot key out over (key, bucket) partitions") {
    val left = (1 to 100).map(i => (i.toLong, "hot", t(i))).toDF("event_id", "k", "ts")
    val right = (1 to 50).map(i => (1000L + i, "hot", t(2 * i), i.toDouble))
      .toDF("r_id", "k", "ts", "v")
    val plan = AsOfJoin.backwardBucketed(left, right, "k", "ts", "ts",
        Seq("r_id", "v"), "r_id", 10L * 60L * 1000000L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the segmented scan partitions its big window by (key, bucket)
    assert(plan.contains("__b"), plan)
  }

  test("as-of plan shuffles once on the key — no join node, no cartesian") {
    val left = spark.range(10).select(col("id").as("event_id"),
      lit("k").as("k"), col("id").cast("timestamp").as("ts"))
    val right = spark.range(10).select(col("id").as("r_id"),
      lit("k").as("k"), col("id").cast("timestamp").as("ts"), lit(1.0).as("v"))
    val plan = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("r_id", "v"), "r_id")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Union"), plan)
  }
}
