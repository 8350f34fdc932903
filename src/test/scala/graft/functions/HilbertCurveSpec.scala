package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Layout

/** Hilbert index: bijectivity + exact decode roundtrip on a full grid,
  * the unit-step locality property that distinguishes it from Z-order,
  * range/null semantics, codegen path.
  */
class HilbertCurveSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fullGrid(order: Int) = {
    val n = 1 << order
    (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
  }

  test("order-4 grid: bijective, decode roundtrips exactly, via codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = fullGrid(4)
        .withColumn("d", Layout.hilbert2(col("x"), col("y"), 4))
        .withColumn("xy", Layout.hilbert2Decode(col("d"), 4))
        .collect()
      assert(out.length == 256)
      assert(out.map(_.getLong(2)).toSet == (0L until 256L).toSet) // bijection
      out.foreach { r =>
        assert(r.getSeq[Long](3) == Seq(r.getLong(0), r.getLong(1)),
          s"roundtrip broke at (${r.getLong(0)},${r.getLong(1)})")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("consecutive keys are always grid neighbors; Z-order is not") {
    val cells = fullGrid(4)
      .withColumn("h", Layout.hilbert2(col("x"), col("y"), 4))
      .withColumn("z", Layout.zorder2(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def steps(key: ((Long, Long, Long, Long)) => Long) = {
      val byKey = cells.sortBy(key)
      byKey.sliding(2).map { case Array(a, b) =>
        math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
      }.toSeq
    }
    val hSteps = steps(_._3)
    assert(hSteps.forall(_ == 1L), "hilbert walk took a non-unit step")
    // same grid under Z-order: the diagonal jumps exist (this is the whole
    // locality argument — if Z ever becomes unit-step the claim is stale)
    assert(steps(_._4).exists(_ > 1L))
  }

  test("known order-1 and order-2 anchor values") {
    // order 1: the canonical U — (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
    val o1 = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(Layout.hilbert2(col("x"), col("y"), 1)).collect().map(_.getLong(0))
    assert(o1.toSeq == Seq(0L, 1L, 2L, 3L))
    val o2 = Seq((2L, 3L)).toDF("x", "y")
      .select(Layout.hilbert2(col("x"), col("y"), 2)).collect().head.getLong(0)
    assert(o2 == 9L)
  }

  test("out-of-range and null semantics") {
    val df = Seq((Some(16L), Some(0L)), (Some(-1L), Some(0L)),
      (Option.empty[Long], Some(1L))).toDF("x", "y")
    val out = df.select(Layout.hilbert2(col("x"), col("y"), 4)).collect()
    assert(out.forall(_.isNullAt(0))) // 16 ≥ 2^4, negative, null
    val dec = Seq(Some(256L), Some(-1L), Option.empty[Long]).toDF("d")
      .select(Layout.hilbert2Decode(col("d"), 4)).collect()
    assert(dec.forall(_.isNullAt(0)))
  }

  test("order guard") {
    intercept[IllegalArgumentException] {
      Layout.hilbert2(col("x"), col("y"), 0)
    }
    intercept[IllegalArgumentException] {
      Layout.hilbert2(col("x"), col("y"), 32)
    }
  }
}
