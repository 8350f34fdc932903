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

  /** Reference d-way interleave: bit i of dim j lands at position d*i+j. */
  private def mortonN(dims: Seq[Long], bits: Int): Long =
    dims.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a | ((v >> i) & 1L) << (dims.size * i + j)
      }
    }

  test("zorder3/zorder4 equal the bitwise reference; NULL out of range") {
    import spark.implicits._
    val pts3 = Seq((0L, 0L, 0L), (1L, 2L, 4L), (2097151L, 2097151L, 2097151L),
      (123456L, 654321L, 999999L), (1L, 0L, 2097150L))
    val out3 = pts3.toDF("x", "y", "z")
      .withColumn("k", Layout.zorder3(col("x"), col("y"), col("z")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    pts3.foreach { case (x, y, z) =>
      assert(out3((x, y, z)) == mortonN(Seq(x, y, z), 21), s"($x,$y,$z)")
      assert(out3((x, y, z)) >= 0L) // BIGINT order must be Z-curve order
    }
    val pts4 = Seq((0L, 0L, 0L, 0L), (1L, 2L, 4L, 8L),
      (32767L, 32767L, 32767L, 32767L), (12345L, 321L, 9999L, 31000L))
    val out4 = pts4.toDF("a", "b", "c", "d")
      .withColumn("k", Layout.zorder4(col("a"), col("b"), col("c"), col("d")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getLong(4)).toMap
    pts4.foreach { case (a, b, c, d) =>
      assert(out4((a, b, c, d)) == mortonN(Seq(a, b, c, d), 15), s"($a,$b,$c,$d)")
      assert(out4((a, b, c, d)) >= 0L)
    }
    // out-of-range dims are NULL, never wrapped
    val bad3 = Seq((-1L, 0L, 0L), (2097152L, 0L, 0L), (0L, 0L, 2097152L))
      .toDF("x", "y", "z")
      .withColumn("k", Layout.zorder3(col("x"), col("y"), col("z"))).collect()
    assert(bad3.forall(_.isNullAt(3)))
    val bad4 = Seq((-1L, 0L, 0L, 0L), (0L, 32768L, 0L, 0L))
      .toDF("a", "b", "c", "d")
      .withColumn("k", Layout.zorder4(col("a"), col("b"), col("c"), col("d"))).collect()
    assert(bad4.forall(_.isNullAt(4)))
    // zorderN dispatch + arity guard
    val viaN = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zorderN(Seq(col("x"), col("y"))).as("k"))
      .collect()(0).getLong(0)
    assert(viaN == morton(3L, 5L))
    intercept[IllegalArgumentException] {
      Layout.zorderN(Seq(col("x")))
    }
  }

  test("zorderDecode round-trips every arity; NULL keys stay NULL") {
    import spark.implicits._
    // pseudo-random in-range tuples per arity, plus the max corner
    def vals(bits: Int, n: Int): Seq[Long] = {
      val lim = 1L << bits
      (1 to n).map(i => ((i * 2654435761L) ^ (i << 7)) & (lim - 1)) :+ (lim - 1)
    }
    val t2 = vals(31, 40).zip(vals(31, 40).reverse)
    val dec2 = t2.toDF("x", "y")
      .select(Layout.zorderDecode(Layout.zorder2(col("x"), col("y")), 2).as("d"),
        col("x"), col("y")).collect()
    dec2.foreach(r => assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2))))
    val t3 = vals(21, 40).lazyZip(vals(21, 40).reverse).lazyZip(vals(21, 40).map(v => (v * 31) & 0x1FFFFF)).toSeq
    val dec3 = t3.toDF("x", "y", "z")
      .select(Layout.zorderDecode(
        Layout.zorder3(col("x"), col("y"), col("z")), 3).as("d"),
        col("x"), col("y"), col("z")).collect()
    dec3.foreach(r => assert(r.getSeq[Long](0) ==
      Seq(r.getLong(1), r.getLong(2), r.getLong(3))))
    val t4 = vals(15, 40).map(v =>
      (v, (v * 7) & 0x7FFFL, (v * 31) & 0x7FFFL, (v * 127) & 0x7FFFL))
    val dec4 = t4.toDF("a", "b", "c", "e")
      .select(Layout.zorderDecode(
        Layout.zorder4(col("a"), col("b"), col("c"), col("e")), 4).as("d"),
        col("a"), col("b"), col("c"), col("e")).collect()
    dec4.foreach(r => assert(r.getSeq[Long](0) ==
      Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    // a NULL key (out-of-range encode) decodes to NULL, not garbage
    val nul = Seq((-1L, 0L)).toDF("x", "y")
      .select(Layout.zorderDecode(Layout.zorder2(col("x"), col("y")), 2).as("d"))
      .collect()
    assert(nul(0).isNullAt(0))
    intercept[IllegalArgumentException] { Layout.zorderDecode(col("x"), 5) }
  }

  test("zorder3 clusters a 3-D grid: same-octant keys are contiguous") {
    import spark.implicits._
    val grid = for { x <- 0 to 3; y <- 0 to 3; z <- 0 to 3 }
      yield (x.toLong, y.toLong, z.toLong)
    val ordered = grid.toDF("x", "y", "z")
      .withColumn("k", Layout.zorder3(col("x"), col("y"), col("z")))
      .orderBy("k").collect()
      .map(r => (r.getLong(0) / 2, r.getLong(1) / 2, r.getLong(2) / 2))
    // each 2x2x2 octant's 8 cells appear consecutively
    assert(ordered.grouped(8).forall(_.distinct.size == 1))
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

  test("zoneMaps: file assignment follows the layout order; stats are exact") {
    import spark.implicits._
    // 10 rows, layout = value order, 4 rows/file → files 0,1,2 (2 rows tail)
    val df = (1 to 10).map(i => (i.toLong, (11 - i).toLong)).toDF("id", "v")
    val zm = Layout.zoneMaps(df, col("v"), col("id"), rowsPerFile = 4,
        dims = Seq("v" -> col("v"), "id" -> col("id")))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(zm.size == 3)
    // v ascending = id descending: file 0 holds v 1..4 (ids 10..7)
    assert(zm(0L).getLong(1) == 4 && zm(0L).getLong(2) == 1L &&
      zm(0L).getLong(3) == 4L && zm(0L).getLong(4) == 7L &&
      zm(0L).getLong(5) == 10L)
    assert(zm(1L).getLong(2) == 5L && zm(1L).getLong(3) == 8L)
    assert(zm(2L).getLong(1) == 2 && zm(2L).getLong(2) == 9L &&
      zm(2L).getLong(3) == 10L)
  }

  test("pruningStats: box overlap, NULL = unconstrained, exact micro frac") {
    import spark.implicits._
    val zm = Seq(
      (0L, 4L, 1L, 4L, 7L, 10L),
      (1L, 4L, 5L, 8L, 3L, 6L),
      (2L, 2L, 9L, 10L, 1L, 2L))
      .toDF("file_id", "n_rows", "min_v", "max_v", "min_id", "max_id")
    val probes = Seq(
      (1L, Some(5L), Some(8L), None: Option[Long], None: Option[Long]),
      (2L, None: Option[Long], None: Option[Long], Some(1L), Some(2L)),
      (3L, Some(9L), Some(10L), Some(5L), Some(6L)), // v hits file 2, id misses
      (4L, Some(100L), Some(200L), None: Option[Long], None: Option[Long]))
      .toDF("probe_id", "lo_v", "hi_v", "lo_id", "hi_id")
    val out = Layout.pruningStats(zm, probes, Seq("v", "id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((3L, 1L, 4L, 333333L)))      // only file 1 overlaps v∈[5,8]
    assert(out(2L) == ((3L, 1L, 2L, 333333L)))      // only file 2 holds id≤2
    assert(out(3L) == ((3L, 0L, 0L, 0L)))           // conjunctive: both dims must hit
    assert(out(4L) == ((3L, 0L, 0L, 0L)))           // out of domain: full prune
  }

  test("a sorted layout prunes range probes that arrival order cannot") {
    import spark.implicits._
    // values arrive shuffled; probe a narrow value band. SEEDED (r16
    // ADVICE): this test asserts a statistical property of the permutation
    // (arrivalFrac > 50%), so an unseeded shuffle had a ~1e-4 flake rate —
    // the other specs' unseeded shuffles assert order-invariance and stay
    // unseeded on purpose.
    val rows = new scala.util.Random(42).shuffle((1 to 1000).toList)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }
    val df = rows.toDF("arrival", "v").repartition(7)
    val probes = Seq((1L, Some(100L), Some(140L)))
      .toDF("probe_id", "lo_v", "hi_v")
    def frac(key: org.apache.spark.sql.Column): Long =
      Layout.pruningStats(
        Layout.zoneMaps(df, key, col("arrival"), 50, Seq("v" -> col("v"))),
        probes, Seq("v")).collect()(0).getLong(4)
    val sortedFrac = frac(col("v"))
    val arrivalFrac = frac(col("arrival"))
    // [100,140] spans the 51..100 / 101..150 file boundary → 2 of 20 files
    assert(sortedFrac == 100000L)
    assert(arrivalFrac > 500000L)  // shuffled arrival: most files overlap
  }
}
