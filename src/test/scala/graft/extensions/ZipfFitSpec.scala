package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** zipfFit semantics on hand-computable fixtures: the exact micro-log OLS
  * pipeline (rank window → 6-dp ln micros → exact sums → pinned double
  * closing arithmetic), the NULL guards, the maxRank cap, and determinism.
  */
class ZipfFitSpec extends AnyFunSuite with SparkTestSession {

  private def microLn(v: Double): Long = math.round(math.log(v) * 1e6)

  /** Reference replication of the engine's pinned closing arithmetic. */
  private def fit(pts: Seq[(Long, Long)]): (Long, Long, Long) = {
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val num = n * sxy.toDouble - sx.toDouble * sy.toDouble
    val denX = n * sxx.toDouble - sx.toDouble * sx.toDouble
    val denY = n * syy.toDouble - sy.toDouble * sy.toDouble
    val slope = num / denX
    (math.round(slope * 1e6),
      math.round((sy.toDouble - slope * sx.toDouble) / n),
      math.round(num * num / (denX * denY) * 1e6))
  }

  test("zipfFit: hand-traced 3-rank fit matches the pinned arithmetic") {
    import spark.implicits._
    // counts a:4 b:2 c:1 → ranks 1,2,3; a perfect-ish Zipf-half corpus
    val d = Seq((1L, "a a b c", "en"), (2L, "a a b", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.zipfFit(d, col("lang"), col("text")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "en" && r.getLong(1) == 3L)
    val pts = Seq(
      (microLn(1), microLn(4)), (microLn(2), microLn(2)),
      (microLn(3), microLn(1)))
    val (slope, intercept, r2) = fit(pts)
    assert(r.getLong(2) == slope)
    assert(r.getLong(3) == intercept)
    assert(r.getLong(4) == r2)
    // counts halve as rank doubles → exponent near −1, strong fit
    assert(slope < -900000L && slope > -1400000L)
    assert(r2 > 900000L)
  }

  test("zipfFit: rank ties broken by term; maxRank caps the fit relation") {
    import spark.implicits._
    // four terms, counts 3,2,2,1 → ranks a:1, b:2, c:3 (tie on 2 broken by
    // term), d:4; maxRank=2 keeps only ranks 1–2
    val d = Seq((1L, "a a a b b c c d", "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.zipfFit(d, col("lang"), col("text"), maxRank = 2)
      .collect()
    assert(out.head.getLong(1) == 2L)
    val pts = Seq((microLn(1), microLn(3)), (microLn(2), microLn(2)))
    val (slope, _, _) = fit(pts)
    assert(out.head.getLong(2) == slope)
  }

  test("zipfFit: NULL guards — single rank, flat counts, NULL group") {
    import spark.implicits._
    val d = Seq(
      (1L, "solo solo solo", "one"),      // single distinct term → denX = 0
      (2L, "p q r", "flat"),              // all counts 1 → denY = 0, slope 0
      (3L, "x y z", null)                 // NULL group → no row
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.zipfFit(d, col("lang"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("one", "flat"))
    assert(out("one").isNullAt(2) && out("one").isNullAt(3) &&
      out("one").isNullAt(4))
    assert(out("flat").getLong(2) == 0L, "flat counts → zero slope")
    assert(out("flat").isNullAt(4), "zero y-variance → NULL r2")
  }

  test("zipfFit: deterministic under repartitioning") {
    import spark.implicits._
    val d = Seq((1L, "the the the of of and to in a a b c d e f", "en"),
      (2L, "the of and and to to to g h i", "fr"))
      .toDF("doc_id", "text", "lang")
    val a = TextAnalysis.zipfFit(d, col("lang"), col("text")).orderBy("group")
      .collect()
    val b = TextAnalysis.zipfFit(d.repartition(13), col("lang"), col("text"))
      .orderBy("group").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq && a.length == 2)
  }

  test("zipfFit: maxRank validation") {
    import spark.implicits._
    val d = Seq((1L, "a", "en")).toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfFit(d, col("lang"), col("text"), maxRank = 1)
    }
  }
}
