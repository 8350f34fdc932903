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

  /** Per-file min/max zone maps for a SIMULATED write: rows land in files
    * of `rowsPerFile` in (`layoutKey`, `tieBreak`) order — exactly what a
    * `repartitionByRange(layoutKey).sortWithinPartitions` write produces —
    * and each file reports `n_rows` plus `min_<d>`/`max_<d>` for every
    * named stat dimension. This is the parquet/Delta/Iceberg file-footer
    * statistic AS DATA, so a layout decision ([[zorder2]] vs a single-column
    * sort vs arrival order) can be graded on the pruning it actually buys
    * BEFORE paying for a 100 TB rewrite.
    *
    * Scale shape: the global file assignment is [[PrefixSum]]'s two-pass
    * parallel scan (a distributed range sort — the same cost the real write
    * pays; never a single-partition `row_number`), and the zone-map
    * aggregate is one map-combined `groupBy(file_id)` whose output is
    * `n_rows / rowsPerFile` files — the driver-scale footer relation every
    * table format already keeps in its metadata layer.
    *
    * `layoutKey` and `tieBreak` must be non-null and totally order rows;
    * stat dimensions are cast to long (zone maps on banded/bucketed signals
    * — the footer convention).
    */
  def zoneMaps(df: DataFrame, layoutKey: Column, tieBreak: Column,
      rowsPerFile: Int, dims: Seq[(String, Column)]): DataFrame = {
    require(rowsPerFile >= 1, s"rowsPerFile must be >= 1, got $rowsPerFile")
    require(dims.nonEmpty, "at least one stat dimension required")
    val keyed = df.select(layoutKey.as("__k") +: tieBreak.as("__tb") +:
      dims.map { case (n, c) => c.cast("long").as(s"__d_$n") }: _*)
    val ranked = PrefixSum.withGlobalCumsum(keyed, lit(1L), "__rank",
      col("__k"), col("__tb"))
    val statAggs = dims.flatMap { case (n, _) => Seq(
      min(col(s"__d_$n")).as(s"min_$n"), max(col(s"__d_$n")).as(s"max_$n")) }
    ranked
      // exact integer division (r16 ADVICE): Column `/` on longs is double
      // division, so floor-exactness would silently depend on row counts
      // staying below ~2^53/rowsPerFile — DIV matches transitionMatrix's
      // no-float-near-a-hash idiom and is exact at any count
      .withColumn("file_id", expr(s"(__rank - 1) DIV $rowsPerFile"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"), statAggs: _*)
  }

  /** Grade a zone-mapped layout against a PROBE workload: for each probe —
    * a row of `probe_id` plus optional `lo_<d>`/`hi_<d>` bounds per stat
    * dimension (NULL = unconstrained) — count the files whose min/max
    * ranges overlap the probe box (the files a data-skipping scan must
    * read) and the rows they hold. Output per probe: `n_files`,
    * `files_scanned`, `rows_scanned`, `scan_frac_micro`
    * (files_scanned/n_files in exact integer micros — no float division to
    * wiggle a hash).
    *
    * Scale shape: zone maps and probes are both metadata-scale relations;
    * the cross join is files × probes (what every query planner evaluates
    * per query, here batched), never touching the data itself.
    */
  def pruningStats(zoneMaps: DataFrame, probes: DataFrame,
      dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "at least one stat dimension required")
    val overlap = dims.map { d =>
      (col(s"lo_$d").isNull || col(s"max_$d") >= col(s"lo_$d")) &&
      (col(s"hi_$d").isNull || col(s"min_$d") <= col(s"hi_$d"))
    }.reduce(_ && _)
    zoneMaps.crossJoin(broadcast(probes))
      .withColumn("__scan", when(overlap, 1L).otherwise(0L))
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("__scan")).as("files_scanned"),
        sum(col("__scan") * col("n_rows")).as("rows_scanned"))
      // integer floor-division (n_files ≤ 10⁶ by the metadata-scale
      // contract, so the double quotient is ≥ 1e-6 away from the next
      // integer — floor is exact, matching DuckDB's BIGINT `//`)
      .withColumn("scan_frac_micro",
        floor(col("files_scanned") * 1000000L / col("n_files")).cast("long"))
  }
}
