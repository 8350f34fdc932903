package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order clustering keys and deterministic range-partition bounds. */
class LayoutSpec extends AnyFunSuite with SparkTestSession {

  /** Reference Morton interleave, bit by bit. */
  private def morton(x: Long, y: Long): Long =
    (0 until 32).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zorder2 equals the bitwise reference; locality; range contract") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 1L),
      (2147483647L, 2147483647L), (123456789L, 987654321L))
    val out = pts.toDF("x", "y")
      .withColumn("z", Layout.zorder2(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(out((x, y)) == morton(x, y), s"($x,$y)")
    }
    // out-of-range inputs are NULL, never wrapped
    val bad = Seq((-1L, 0L), (2147483648L, 0L)).toDF("x", "y")
      .withColumn("z", Layout.zorder2(col("x"), col("y"))).collect()
    assert(bad.forall(_.isNullAt(2)))
  }

  test("zorder2 clusters a 2-D grid: same-quadrant keys are contiguous") {
    import spark.implicits._
    // 4x4 grid: sorting by z-key must visit each 2x2 quadrant as one block
    val grid = for { x <- 0 to 3; y <- 0 to 3 } yield (x.toLong, y.toLong)
    val ordered = grid.toDF("x", "y")
      .withColumn("z", Layout.zorder2(col("x"), col("y")))
      .orderBy("z").collect()
      .map(r => (r.getLong(0) / 2, r.getLong(1) / 2))
    // each quadrant's 4 cells appear consecutively
    assert(ordered.grouped(4).forall(_.distinct.size == 1))
  }

  test("rangeBounds: quartiles of 1..100, null exclusion, determinism") {
    import spark.implicits._
    val df = ((1 to 100).map(i => Some(i.toDouble)) :+ None)
      .toDF("v")
    val out = Layout.rangeBounds(df, col("v"), 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // exact interpolated percentiles of 1..100 at 1/4, 1/2, 3/4
    assert(out.toSeq == Seq((1L, 0.25, 25.75), (2L, 0.5, 50.5),
      (3L, 0.75, 75.25)))
  }
}
