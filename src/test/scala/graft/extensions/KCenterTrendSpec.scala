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

  test("kCenters rejects empty/all-null input; stops early under k positions") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.kCentersDetail(empty, col("id"), col("v"), 3)
    }
    assert(e1.getMessage.contains("no rows with a non-null vector"))
    val allNull = Seq((1L, null.asInstanceOf[Seq[Double]])).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.kCentersDetail(allNull, col("id"), col("v"), 3)
    }
    assert(e2.getMessage.contains("no rows with a non-null vector"))
    // 5 rows but only 2 distinct positions: k=4 must yield 2 DISTINCT
    // centers (never a re-selected id with sel_dist2 = 0) and radius² 0
    val dup = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)),
      (3L, Seq(7.0, 0.0)), (4L, Seq(7.0, 0.0)), (5L, Seq(0.0, 0.0)))
      .toDF("id", "v")
    val (centers, r2) = Similarity.kCentersDetail(dup, col("id"), col("v"), 4)
    assert(centers.map(_._2) == Seq(1L, 3L))
    assert(centers.map(_._1) == Seq(1, 2))
    assert(r2 == 0.0)
  }

  test("kCenters chained-least stage compiles under codegen at k=64") {
    import spark.implicits._
    // the round-64 min-distance column is a 63-deep chained `least` over
    // literal center vectors; assert Janino actually COMPILES it (no
    // silent interpreted fallback, no 64KB method-limit failure) by
    // disabling the whole-stage fallback for the duration of the run
    val dim = 8
    val pts = (0 until 80).map { i =>
      (i.toLong, Seq.tabulate(dim)(d =>
        ((i * 31 + d * 17) % 97).toDouble + i * 100.0 * (if (d == 0) 1 else 0)))
    }
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val (centers, r2) =
        Similarity.kCentersDetail(pts.toDF("id", "v"), col("id"), col("v"), 64)
      assert(centers.size == 64)
      assert(centers.map(_._2).distinct.size == 64)
      val sel = centers.flatMap(_._3)
      assert(sel.zip(sel.tail).forall { case (a, b) => a >= b })
      assert(r2 >= 0.0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
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
