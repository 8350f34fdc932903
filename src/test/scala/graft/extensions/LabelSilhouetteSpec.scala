package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for Similarity.labelSilhouette (x152): hand-traced a/b/s
  * on axis-aligned 2-d vectors, the b-tie → smaller label, the singleton
  * convention, and the all-identical (max = 0) guard.
  */
class LabelSilhouetteSpec extends AnyFunSuite with SparkTestSession {

  test("a, b, s, nearest-other-label, singleton — hand-traced") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0),  // cluster 0
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 3.0f), 1),  // cluster 1
      (5L, Array(-1.0f, 0.0f), 7)                              // singleton
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelSilhouette(df)
      .collect().map(r => r.getLong(0) -> r).toMap

    // anchor 1: a = 0 (cos 1 to id 2); label-1 mean d = 1e6, label-7 = 2e6
    val v1 = out(1L)
    assert(v1.getLong(2) == 1L && v1.getLong(3) == 0L)
    assert(v1.getLong(4) == 1000000L && v1.getInt(5) == 1)
    assert(v1.getLong(6) == 1000000L && !v1.getBoolean(7))

    // anchor 3: label-0 and label-7 means TIE at 1e6 -> b_label = 0
    val v3 = out(3L)
    assert(v3.getLong(3) == 0L && v3.getLong(4) == 1000000L)
    assert(v3.getInt(5) == 0)

    // anchor 5: singleton label -> no a, s = 0 by convention, b still real
    val v5 = out(5L)
    assert(v5.getLong(2) == 0L && v5.isNullAt(3) && v5.getBoolean(7))
    assert(v5.getLong(4) == 1000000L && v5.getInt(5) == 1)
    assert(v5.getLong(6) == 0L)
  }

  test("all points identical in direction: max(a,b) = 0 -> s = 0, no blow-up") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0),
      (3L, Array(3.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelSilhouette(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(3) == 0L && out(1L).getLong(4) == 0L)
    assert(out(1L).getLong(6) == 0L && !out(1L).getBoolean(7))
  }
}
