package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for Similarity.tripletMarginMine (x142): positive pick,
  * margin-band membership, hinge-loss rollup, and the no-positive /
  * no-violation edges — all on hand-traced 2-d vectors.
  */
class TripletMarginSpec extends AnyFunSuite with SparkTestSession {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f), 0),            // anchor A
      (2L, Array(0.6f, 0.8f), 0),            // same label, cos .600000
      (3L, Array(1.0f, 1.0f), 0),            // same label, cos .707107 -> positive
      (4L, Array(2.0f, 0.0f), 1),            // neg, cos 1.000000 (hard)
      (5L, Array(0.7f, 0.7f), 1),            // neg, cos .707107 (== pos sim)
      (6L, Array(0.5f, 0.866f), 2),          // neg, cos .500215 — outside band
      (7L, Array(0.8660254f, 0.5f), 1),      // neg, cos .866025 (semi-hard)
      (8L, Array(0.0f, 1.0f), 9),            // anchor B: label 9 is unique -> no positive
      (9L, Array(-1.0f, 0.0f), 5),           // anchor C
      (10L, Array(-1.0f, -0.1f), 5)          // C's positive, cos .995037
    ).toDF("vec_id", "embedding", "label")
  }

  test("positive pick, margin band, hinge-loss sum — hand-traced") {
    val out = Similarity.tripletMarginMine(
        vecs.filter(col("vec_id").isin(1L, 8L, 9L)), vecs, marginMicro = 50000L)
      .collect().map(r => r.getLong(0) -> r).toMap

    // anchor 8 has no same-label other vector -> dropped entirely
    assert(out.keySet == Set(1L, 9L))

    // anchor 1: positive = id 3 at .707107 (beats id 2's .600000)
    val a = out(1L)
    assert(a.getLong(2) == 3L && a.getLong(3) == 707107L)
    // band = sim > 657107: ids 4 (1000000), 5 (707107), 7 (866025); id 6 out
    assert(a.getLong(4) == 3L)
    assert(a.getLong(5) == 4L && a.getLong(6) == 1000000L)
    // loss = (1000000-707107+50000) + (707107-707107+50000) + (866025-707107+50000)
    assert(a.getLong(7) == 342893L + 50000L + 208918L)

    // anchor 9: positive exists, but every negative is far outside the band
    val c = out(9L)
    assert(c.getLong(2) == 10L && c.getLong(3) == 995037L)
    assert(c.getLong(4) == 0L && c.isNullAt(5) && c.isNullAt(6))
    assert(c.getLong(7) == 0L)
  }

  test("positive tie on similarity breaks to the LOWER vector id") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(3.0f, 0.0f), 0),            // cos 1.000000
      (3L, Array(2.0f, 0.0f), 0),            // cos 1.000000 — same sim, higher id
      (4L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletMarginMine(df.filter(col("vec_id") === 1L),
      df, marginMicro = 50000L).collect()
    assert(out.length == 1 && out(0).getLong(2) == 2L)
  }

  test("band boundary is STRICT: sim == pos_sim - margin is excluded") {
    import spark.implicits._
    // margin 0 makes the boundary exactly representable: the band is
    // sim > pos_sim, so a negative at exactly pos_sim must NOT count
    // (the x101 ceil-boundary lesson applied to this operator's threshold)
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 1.0f), 0),           // positive, cos .707107
      (3L, Array(0.7f, 0.7f), 1),           // neg at exactly .707107
      (4L, Array(0.8f, 0.6f), 1)            // neg at .8 > boundary -> in
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletMarginMine(df.filter(col("vec_id") === 1L),
      df, marginMicro = 0L).collect()(0)
    assert(out.getLong(4) == 1L && out.getLong(5) == 4L)
  }

  test("zero-norm vectors score 0 and the band test stays exact") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.01f), 0),          // positive, sim near 1
      (3L, Array(0.0f, 0.0f), 1)             // zero vector: sim defined as 0
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.tripletMarginMine(df.filter(col("vec_id") === 1L),
      df, marginMicro = 50000L).collect()
    assert(out.length == 1)
    assert(out(0).getLong(4) == 0L)          // sim 0 is far below pos - margin
  }
}
