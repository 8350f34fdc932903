package graft.extensions

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Specs for k-center farthest-point sampling and per-group OLS trends. */
class KCenterTrendSpec extends AnyFunSuite with SparkTestSession {

  test("kCenters greedy sequence, selection profile, covering radius") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 0.0)),
      (3L, Seq(5.0, 0.0)), (4L, Seq(0.0, 1.0)), (5L, Seq(9.0, 0.0)))
      .toDF("id", "v")
    val (centers, r2) = Similarity.kCentersDetail(df, col("id"), col("v"), 3)
    assert(centers.map(_._2) == Seq(1L, 2L, 3L)) // seed=min id, then farthest
    assert(centers.map(_._3) == Seq(None, Some(100.0), Some(25.0)))
    assert(r2 == 1.0) // ids 4 and 5 both sit at dist² 1 from a center
    val rel = Similarity.kCenters(df, col("id"), col("v"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rel.toSeq == Seq((1L, 1L, 1.0), (2L, 2L, 1.0), (3L, 3L, 1.0)))
  }

  test("kCenters pairwise separation >= covering radius on real vectors") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (centers, r2) = Similarity.kCentersDetail(e, col("vec_id"),
      col("embedding"), 8)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      val aa = a.map(x => x * x).sum; val bb = b.map(x => x * x).sum
      aa + bb - 2.0 * a.zip(b).map { case (x, y) => x * y }.sum
    }
    val vecs = centers.map(_._4)
    val minPair = (for { i <- vecs.indices; j <- i + 1 until vecs.size }
      yield d2(vecs(i), vecs(j))).min
    assert(minPair >= r2 - 1e-9) // the Gonzalez separation guarantee
    val sel = centers.flatMap(_._3)
    assert(sel.zip(sel.tail).forall { case (a, b) => a >= b })
    assert(centers.map(_._2).distinct.size == 8)
  }

  test("groupTrend recovers an exact line; single-bucket group is NULL") {
    import spark.implicits._
    def t(day: Int) = new Timestamp(86400000L * day + 1000L)
    // grp a: y_milli = 2 + 3x over days 0..4 -> slope 0.003/bucket? no:
    // slope is in MILLI units per bucket: slope_milli = 3, r2 = 1
    val a = (0 to 4).map(x => ("a", t(x), (2 + 3 * x) / 1000.0))
    val b = Seq(("b", t(0), 5.0), ("b", t(0), 9.0)) // one bucket only
    val out = graft.ops.TimeSeries.groupTrend((a ++ b).toDF("g", "ts", "v"),
        col("g"), col("ts"), col("v"), 86400L)
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = out("a")
    assert(ra.getLong(1) == 5L)
    assert(ra.getDouble(4) == 3.0 && ra.getDouble(5) == 1.0)
    val rb = out("b")
    assert(rb.isNullAt(4) && rb.isNullAt(5)) // den_x = 0: no time spread
  }
}
