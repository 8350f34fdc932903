package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-window anomaly detection over an event stream — the monitoring
  * primitive a pipeline runs over its own telemetry (ingest rates, doc
  * sizes, reject ratios): flag an observation whose deviation from the
  * trailing-window mean exceeds `z` standard deviations.
  *
  * Engine-reproducible by the repo's integer idiom: the value is fixed to
  * MILLI units once, and the z-test is evaluated as the cross-multiplied
  * integer inequality
  * {{{ (n·v − S)² > z² · (n·Q − S²)   // population variance, ddof=0 }}}
  * over exact BIGINT window sums `S = Σv`, `Q = Σv²` — no floating mean or
  * stddev whose summation order could differ between engines, so the flag
  * is bit-identical anywhere. Overflow envelope (ENFORCED, not advisory):
  * the largest product is bounded by `(max(2,z)·window·|v_milli|)²`
  * (dev² ≤ (2·W·M)², thr_sq = z²(nQ−S²) ≤ z²·W²·M²), so safety needs
  * `max(2,z)·window·|v_milli| ≤ floor(√(2⁶³−1)) = 3037000499` — at the
  * defaults (window=50, z=3) that is |value| ≤ ~2·10⁴, NOT the ~2·10⁶ a
  * previous revision claimed. Every row is checked with a codegen'd
  * `raise_error` guard: an out-of-envelope value fails the job loudly
  * (exactly as ANSI mode and the DuckDB oracle would) instead of silently
  * wrapping to a wrong `is_anomaly` flag.
  *
  * Scale design: one hash partition per `part` key, one sort per partition,
  * a bounded ROWS frame (never RANGE, never unbounded) — the canonical
  * streaming-compatible shape. The trailing frame EXCLUDES the current row
  * (`[-window, -1]`): an anomaly must not shift the baseline it is judged
  * against. Rows with fewer than `minPrev` predecessors are emitted with
  * `is_anomaly = false` (no baseline, no verdict).
  *
  * Output: one row per input row: the `part`/`order` keys, `v_milli`,
  * `n_prev`, `dev_sq` = (n·v−S)², `thr_sq` = z²(n·Q−S²), `is_anomaly`.
  */
object Anomaly {

  /** floor(sqrt(2^63 - 1)): the largest m with m*m representable in a Long. */
  private val SqrtLongMax = 3037000499L

  /** Largest |v_milli| for which every product in the cross-multiplied
    * z-test provably fits in a signed 64-bit integer (see class doc).
    */
  def vMilliBound(window: Int, z: Int): Long =
    SqrtLongMax / (math.max(2, z).toLong * window)

  def rollingZScore(df: DataFrame, part: Column, order: Seq[Column],
      idCols: Seq[String], value: Column, window: Int = 50, z: Int = 3,
      minPrev: Int = 20): DataFrame = {
    require(window >= 2 && window <= 10000,
      s"window must be in [2,10000], got $window")
    require(z >= 1 && z <= 100, s"z must be in [1,100], got $z")
    require(minPrev >= 2 && minPrev <= window,
      s"minPrev must be in [2,$window], got $minPrev")
    val vmMax = vMilliBound(window, z)
    val vmRaw = round(value * 1000).cast("long")
    val vmChecked = when(vmRaw.isNull || abs(vmRaw) <= vmMax, vmRaw)
      .otherwise(raise_error(concat(
        lit(s"Anomaly.rollingZScore: |round(value*1000)| exceeds the " +
          s"overflow-safe bound $vmMax for window=$window, z=$z; got "),
        vmRaw.cast("string"))))
    val base = df.select(
      (idCols.map(col) :+ part.as("__part") :+
        vmChecked.as("v_milli")) ++
        order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val w = Window.partitionBy(col("__part"))
      .orderBy(order.indices.map(i => col(s"__o$i")): _*)
      .rowsBetween(-window, -1)
    val scored = base
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("__s", coalesce(sum(col("v_milli")).over(w), lit(0L)))
      .withColumn("__q",
        coalesce(sum(col("v_milli") * col("v_milli")).over(w), lit(0L)))
    val dev = col("n_prev") * col("v_milli") - col("__s")
    val varn = col("n_prev") * col("__q") - col("__s") * col("__s")
    scored.select(
      idCols.map(col) ++ Seq(
        col("__part").as("part"), col("v_milli"), col("n_prev"),
        (dev * dev).as("dev_sq"), (lit(z.toLong * z) * varn).as("thr_sq"),
        (col("n_prev") >= minPrev && dev * dev > lit(z.toLong * z) * varn)
          .as("is_anomaly")): _*)
  }
}
