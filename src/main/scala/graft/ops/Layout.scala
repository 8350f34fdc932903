package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout planning for 100 TB writes — the two decisions that shape
  * every downstream scan: WHICH rows co-locate (multi-dimensional
  * clustering via Z-order keys) and WHERE the range-partition boundaries
  * fall (equal-mass splits from exact percentiles). Both are pure
  * plan-level arithmetic here; the caller feeds the keys to
  * `repartitionByRange` / `sortWithinPartitions` at write time.
  */
object Layout {

  /** Morton (Z-order) interleave of two dimensions into one clustering
    * key: bit i of x lands at even position 2i, y at odd — points close in
    * BOTH dimensions get close keys, so min/max pruning works on two
    * filter columns at once (the Delta/Iceberg OPTIMIZE ZORDER idea,
    * computed as a column). Pure integer magic-mask arithmetic (the
    * classic bit-spread chain), bit-identical in any engine; inputs
    * outside [0, 2³¹) yield NULL (out-of-contract, never silently
    * wrapped).
    */
  def zorder2(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      var v = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
      v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
      v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
      v
    }
    val xl = x.cast("long")
    val yl = y.cast("long")
    when(xl >= 0L && xl < 2147483648L && yl >= 0L && yl < 2147483648L,
      spread(xl).bitwiseOR(shiftleft(spread(yl), 1)))
  }

  /** Morton interleave of THREE dimensions (21 bits each: bit i of dim j
    * lands at position 3i+j, keys stay in [0, 2⁶³) — non-negative, so
    * BIGINT ordering is Z-curve ordering). Same magic-mask bit-spread
    * idiom as [[zorder2]] with the 3-way gap masks; inputs outside
    * [0, 2²¹) yield NULL (out-of-contract, never silently wrapped —
    * real table layouts cluster bucketed/quantized keys, 21 bits = 2M
    * distinct values per dimension).
    */
  def zorder3(x: Column, y: Column, z: Column): Column = {
    def spread(c: Column): Column = {
      var v = c.bitwiseAND(lit(0x1FFFFFL))
      v = (v.bitwiseOR(shiftleft(v, 32))).bitwiseAND(lit(0x1F00000000FFFFL))
      v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x1F0000FF0000FFL))
      v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x100F00F00F00F00FL))
      v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x10C30C30C30C30C3L))
      v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x1249249249249249L))
      v
    }
    val (xl, yl, zl) = (x.cast("long"), y.cast("long"), z.cast("long"))
    val lim = 1L << 21
    when(xl >= 0L && xl < lim && yl >= 0L && yl < lim &&
        zl >= 0L && zl < lim,
      spread(xl).bitwiseOR(shiftleft(spread(yl), 1))
        .bitwiseOR(shiftleft(spread(zl), 2)))
  }

  /** Morton interleave of FOUR dimensions (15 bits each: bit i of dim j →
    * position 4i+j, max position 59 — keys non-negative). Inputs outside
    * [0, 2¹⁵) yield NULL; 15 bits = 32k distinct values per dimension,
    * the right grain for the bucketed keys a 4-column layout clusters.
    */
  def zorder4(a: Column, b: Column, c: Column, d: Column): Column = {
    def spread(col0: Column): Column = {
      var v = col0.bitwiseAND(lit(0x7FFFL))
      v = (v.bitwiseOR(shiftleft(v, 24))).bitwiseAND(lit(0x000000FF000000FFL))
      v = (v.bitwiseOR(shiftleft(v, 12))).bitwiseAND(lit(0x000F000F000F000FL))
      v = (v.bitwiseOR(shiftleft(v, 6))).bitwiseAND(lit(0x0303030303030303L))
      v = (v.bitwiseOR(shiftleft(v, 3))).bitwiseAND(lit(0x1111111111111111L))
      v
    }
    val ls = Seq(a, b, c, d).map(_.cast("long"))
    val lim = 1L << 15
    val inRange = ls.map(l => l >= 0L && l < lim).reduce(_ && _)
    when(inRange, ls.zipWithIndex.map { case (l, j) =>
      shiftleft(spread(l), j): Column }.reduce(_.bitwiseOR(_)))
  }

  /** Dimension-dispatching Z-order key: 2, 3, or 4 clustering columns
    * ([[zorder2]]/[[zorder3]]/[[zorder4]] — 31/21/15 bits per dimension).
    */
  def zorderN(cols: Seq[Column]): Column = cols match {
    case Seq(x, y)       => zorder2(x, y)
    case Seq(x, y, z)    => zorder3(x, y, z)
    case Seq(a, b, c, d) => zorder4(a, b, c, d)
    case _ => throw new IllegalArgumentException(
      s"zorderN supports 2-4 dimensions, got ${cols.size}")
  }

  /** Inverse of [[zorderN]]: recover the `dims` original values from a
    * Z-order key as `array<long>` — the audit/debug direction (verify a
    * table's layout key, map a pruning range back to dimension bounds).
    * Same magic-mask arithmetic run in reverse (bit-compact instead of
    * bit-spread); `zorderDecode(zorderN(cols), cols.size)` round-trips
    * exactly for in-range inputs (LayoutSpec pins the property). NULL key
    * (an out-of-range encode) decodes to NULL.
    */
  def zorderDecode(key: Column, dims: Int): Column = {
    require(dims >= 2 && dims <= 4, s"dims must be in [2,4], got $dims")
    def c2(c: Column): Column = {
      var v = c.bitwiseAND(lit(0x5555555555555555L))
      v = (v.bitwiseOR(shiftright(v, 1))).bitwiseAND(lit(0x3333333333333333L))
      v = (v.bitwiseOR(shiftright(v, 2))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = (v.bitwiseOR(shiftright(v, 4))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = (v.bitwiseOR(shiftright(v, 8))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      (v.bitwiseOR(shiftright(v, 16))).bitwiseAND(lit(0xFFFFFFFFL))
    }
    def c3(c: Column): Column = {
      var v = c.bitwiseAND(lit(0x1249249249249249L))
      v = (v.bitwiseOR(shiftright(v, 2))).bitwiseAND(lit(0x10C30C30C30C30C3L))
      v = (v.bitwiseOR(shiftright(v, 4))).bitwiseAND(lit(0x100F00F00F00F00FL))
      v = (v.bitwiseOR(shiftright(v, 8))).bitwiseAND(lit(0x1F0000FF0000FFL))
      v = (v.bitwiseOR(shiftright(v, 16))).bitwiseAND(lit(0x1F00000000FFFFL))
      (v.bitwiseOR(shiftright(v, 32))).bitwiseAND(lit(0x1FFFFFL))
    }
    def c4(c: Column): Column = {
      var v = c.bitwiseAND(lit(0x1111111111111111L))
      v = (v.bitwiseOR(shiftright(v, 3))).bitwiseAND(lit(0x0303030303030303L))
      v = (v.bitwiseOR(shiftright(v, 6))).bitwiseAND(lit(0x000F000F000F000FL))
      v = (v.bitwiseOR(shiftright(v, 12))).bitwiseAND(lit(0x000000FF000000FFL))
      (v.bitwiseOR(shiftright(v, 24))).bitwiseAND(lit(0xFFFFL))
    }
    val compact: Column => Column = dims match {
      case 2 => c2
      case 3 => c3
      case 4 => c4
    }
    // array(null, null) is not a NULL array — gate on the key itself so an
    // out-of-range encode decodes to NULL, not a vector of nulls
    when(key.isNotNull,
      array((0 until dims).map(j => compact(shiftright(key, j))): _*))
  }

  /** 2-D Hilbert index — the locality-first sibling of [[zorder2]]: same
    * cell→key contract, but consecutive keys are always grid NEIGHBORS (no
    * Z-diagonal jumps), so min/max-zoned range scans touch fewer files for
    * the same 2-D box. Native expression pair
    * ([[graft.functions.HilbertCurve]]) — the per-plane rotation has no
    * magic-mask closed form. Out-of-range/negative inputs → NULL.
    */
  def hilbert2(x: Column, y: Column, order: Int = 16): Column =
    graft.functions.HilbertCurve.hilbert2(x, y, order)

  /** Exact inverse of [[hilbert2]]: key → [x, y]; NULL key → NULL. */
  def hilbert2Decode(key: Column, order: Int = 16): Column =
    graft.functions.HilbertCurve.hilbert2Decode(key, order)

  /** Equal-mass range-partition boundaries: the `n − 1` exact interpolated
    * percentiles of `value` at fractions i/n — the bounds a
    * `repartitionByRange(n, col)` write should land on when the planner
    * must be DETERMINISTIC and auditable (Spark's own range partitioner
    * samples nondeterministically). Output: `bound_idx` (1..n−1), `frac`,
    * `bound` (round-6).
    *
    * Scale design: one exact-percentile aggregate (per-VALUE histogram
    * memory — range-bounded signals, not row-bounded) producing a single
    * n-element array row, exploded to the bounds relation. The 1-row
    * aggregate is the only SinglePartition, bounded by construction.
    */
  def rangeBounds(df: DataFrame, value: Column, n: Int): DataFrame = {
    require(n >= 2 && n <= 100000, s"n must be in [2,100000], got $n")
    val fracs = (1 until n).map(i => i.toDouble / n)
    val fracsSql = fracs.mkString("array(", ", ", ")")
    df.select(value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .agg(expr(s"percentile(__v, $fracsSql)").as("__b"))
      .select(posexplode(col("__b")).as(Seq("__i", "bound")))
      .select((col("__i") + 1L).cast("long").as("bound_idx"),
        ((col("__i") + 1L).cast("double") / n).as("frac"),
        round(col("bound"), 6).as("bound"))
  }
}
