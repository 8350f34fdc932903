package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SeqMiningSpec extends AnyFunSuite with SparkTestSession {

  private def events(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "sec", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  test("bigram supports, distinct-key counts and deterministic rank") {
    val df = events(
      (1L, 0L, 1L, "view"), (1L, 1L, 2L, "click"), (1L, 2L, 3L, "view"),
      (1L, 3L, 4L, "click"),
      (2L, 0L, 5L, "view"), (2L, 1L, 6L, "click"),
      (3L, 0L, 7L, "buy"))
    val out = SeqMining.frequentSeqs(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 2, minSupport = 1L, k = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    // user 1: view>click ×2, click>view ×1; user 2: view>click ×1; user 3: none
    assert(out.size == 2)
    assert(out("view>click").getLong(1) == 3 && out("view>click").getLong(2) == 2)
    assert(out("click>view").getLong(1) == 1 && out("click>view").getLong(2) == 1)
    assert(out("view>click").getInt(3) == 1 && out("click>view").getInt(3) == 2)
  }

  test("windows never cross keys; short histories emit no partial grams") {
    val df = events(
      (1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"),
      (2L, 2L, 3L, "c")) // a>b must not chain into user 2's c
    val out = SeqMining.frequentSeqs(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 3, minSupport = 1L, k = 10)
      .collect()
    assert(out.isEmpty) // no key has 3 consecutive events
    val bi = SeqMining.frequentSeqs(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 2, minSupport = 1L, k = 10)
      .collect().map(_.getString(0)).toSet
    assert(bi == Set("a>b"))
  }

  test("null items poison their windows instead of emitting short grams") {
    val df = events((1L, 0L, 1L, "a"), (1L, 2L, 3L, "b"))
      .union(events((1L, 1L, 2L, "x"))
        .withColumn("event_type", lit(null: String)))
    val out = SeqMining.frequentSeqs(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 2, minSupport = 1L, k = 10)
      .collect()
    assert(out.isEmpty) // a>NULL and NULL>b both vanish
  }

  test("minSupport filters before rank; k cuts after; ties break on gram") {
    val rows = Seq.tabulate(6)(i => (10L + i, i.toLong, 100L + i, "a")) ++
      Seq.tabulate(6)(i => (10L + i, i.toLong + 10, 200L + i, "b")) ++
      Seq((99L, 0L, 300L, "c"), (99L, 1L, 301L, "d"))
    // per key 10..15: a then b → gram a>b ×6; key 99: c>d ×1
    val df = events(rows: _*)
    val top = SeqMining.frequentSeqs(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 2, minSupport = 2L, k = 5)
      .collect()
    assert(top.map(_.getString(0)).toSeq == Seq("a>b")) // c>d below support
    assert(top.head.getLong(1) == 6 && top.head.getLong(2) == 6)
    val k1 = SeqMining.frequentSeqs(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), n = 2, minSupport = 1L, k = 1)
      .collect()
    assert(k1.length == 1 && k1.head.getString(0) == "a>b")
  }

  test("result is independent of input partitioning and row order") {
    val base = (1 to 500).map { i =>
      (i % 7L, i.toLong, i.toLong, s"t${(i * 31) % 4}")
    }
    val a = SeqMining.frequentSeqs(events(base: _*), col("user_id"),
      col("ts"), col("event_id"), col("event_type"), 3, 2L, 20)
    val b = SeqMining.frequentSeqs(events(scala.util.Random.shuffle(base): _*)
        .repartition(13), col("user_id"), col("ts"), col("event_id"),
      col("event_type"), 3, 2L, 20)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("transitionMatrix: exact counts, totals, micro probabilities, ranks") {
    val df = events(
      (1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 2L, 3L, "a"),
      (1L, 3L, 4L, "b"),
      (2L, 0L, 5L, "a"), (2L, 1L, 6L, "c"))
    val out = SeqMining.transitionMatrix(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    // from a: a>b x2, a>c x1 (total 3); from b: b>a x1 (total 1)
    assert(out == Map(
      ("a", "b") -> ((2L, 3L, 666666L, 1)),
      ("a", "c") -> ((1L, 3L, 333333L, 2)),
      ("b", "a") -> ((1L, 1L, 1000000L, 1))))
  }

  test("transitionMatrix: null items and key boundaries emit no transition") {
    val df = events((1L, 0L, 1L, "a"), (1L, 2L, 3L, "b"), (2L, 3L, 4L, "c"))
      .union(events((1L, 1L, 2L, "x"))
        .withColumn("event_type", lit(null: String)))
    val out = SeqMining.transitionMatrix(df, col("user_id"), col("ts"),
      col("event_id"), col("event_type")).collect()
    assert(out.isEmpty) // a>NULL, NULL>b dropped; c is key 2's only event
  }

  test("transitionMatrix rank ties break on to_item; probabilities sum <= 1e6") {
    val df = events(
      (1L, 0L, 1L, "s"), (1L, 1L, 2L, "x"), (1L, 2L, 3L, "s"),
      (1L, 3L, 4L, "y"), (1L, 4L, 5L, "s"), (1L, 5L, 6L, "z"))
    val rows = SeqMining.transitionMatrix(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .filter(col("from_item") === "s")
      .collect().map(r => (r.getString(1), r.getInt(5))).toSeq.sorted
    assert(rows == Seq(("x", 1), ("y", 2), ("z", 3))) // equal n -> to asc
    val ps = SeqMining.transitionMatrix(df, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .groupBy("from_item").agg(sum("p_micro")).collect()
      .map(_.getLong(1))
    assert(ps.forall(_ <= 1000000L)) // floor division never oversums
  }

  test("r18: rank window runs over the take-ordered k rows, not the gram table") {
    // frequentSeqs' gram relation grows with the corpus; the rank must come
    // from TakeOrderedAndProject (per-partition heaps) with the global
    // window above it bounded at k rows — never a single-partition pass
    // over every gram (the r17 VERDICT #6 scale-killer class).
    val df = events(
      (1L, 0L, 1L, "a"), (1L, 1L, 2L, "b"), (1L, 2L, 3L, "a"), (1L, 3L, 4L, "b"),
      (2L, 0L, 5L, "b"), (2L, 1L, 6L, "c"), (2L, 2L, 7L, "d"),
      (3L, 0L, 8L, "c"), (3L, 1L, 9L, "d"))
    val out = SeqMining.frequentSeqs(df, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), n = 2, minSupport = 1L, k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n$plan")
    assert(plan.indexOf("Window") >= 0 &&
      plan.indexOf("Window") < plan.indexOf("TakeOrderedAndProject"),
      "the rank window must sit ABOVE the k-row TakeOrdered relation")
    // value check at the k boundary: a>b sup2 and c>d sup2 (users 2+3) beat
    // the sup-1 grams; equal supports order by gram asc
    val rows = out.collect().map(r => (r.getString(0), r.getInt(3))).toSeq
    assert(rows == Seq(("a>b", 1), ("c>d", 2)))
  }
}
