package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-rate time-series diagnostics — the stream-health checks a
  * continuous ingest pipeline runs over its own telemetry: bucket events
  * into fixed-width time bins (DENSE — an empty minute is a real zero, not
  * a missing row) and measure the series' lag-k autocorrelation to expose
  * periodicity (a daily crawl cycle shows up as a spike at the day lag) or
  * loss of it (a stuck upstream flattens the series).
  *
  * Arithmetic contract: Pearson r at each lag is computed from the six
  * EXACT integer sums (n, Σx, Σy, Σxy, Σx², Σy²) of the paired series, so
  * the only float op is the final ratio of exact integers — bit-identical
  * in any engine, whatever the summation order. Overflow envelope
  * (ENFORCED driver-side from the same bounded aggregate that sizes the
  * dense range, before any heavy work): the largest product is
  * n·Σxy ≤ (B·max(c))², so the operator requires
  * `B·max(c) ≤ ⌊√(2⁶³−1)⌋ = 3037000499` (10⁶ buckets of ≤3000 events, or
  * 10⁹ buckets of ≤3 — a previous revision documented B·max(c)² < 2⁶³,
  * which is both insufficient for the n·Σxy cross product and violated by
  * its own example). Out-of-envelope series fail loudly; quantize counts
  * or widen buckets to re-enter the envelope.
  *
  * Scale design: the corpus collapses to per-bucket counts in one
  * aggregate; everything after runs on the BUCKET relation (time-range /
  * width rows, not event rows). Densification is a range join against
  * `spark.range`, lag pairing is a shuffle-hash equi-join on bucket+k —
  * no global-order window, no single partition.
  */
object TimeSeries {

  /** Lag-k autocorrelations of the per-bucket event count series.
    *
    * Output: one row per lag: `lag`, `n_pairs`, `num` (n·Σxy − Σx·Σy),
    * `den_x`, `den_y` (the two exact variance terms), `r` (round-6; NULL
    * when either variance term is 0 — a constant series has no
    * correlation). Rows with NULL timestamps are excluded.
    */
  def lagAutocorr(df: DataFrame, ts: Column, bucketSeconds: Long,
      lags: Seq[Int]): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be ≥1, got $bucketSeconds")
    require(lags.nonEmpty && lags.forall(l => l >= 1 && l <= 1000000),
      s"lags must be in [1,1e6], got $lags")
    val spark = df.sparkSession
    val wUs = bucketSeconds * 1000000L
    val counts = df.select(TimeCols.tsMicros(ts).as("__us"))
      .filter(col("__us").isNotNull)
      .select(floor(col("__us") / wUs).cast("long").as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
    // bounded collect: ONE row (bucket range + max count) — drives
    // spark.range AND the overflow-envelope check before any heavy work
    val r0 = counts.agg(min(col("b")).as("__lo"), max(col("b")).as("__hi"),
        max(col("c")).as("__cmax"))
      .collect()(0)
    val (lo, hi) =                      // empty input → empty dense series
      if (r0.isNullAt(0)) (0L, -1L) else (r0.getLong(0), r0.getLong(1))
    val maxC = if (r0.isNullAt(2)) 0L else r0.getLong(2)
    val nBuckets = hi - lo + 1
    // n·Σxy ≤ (B·max(c))² must stay under 2⁶³ (see class doc)
    require(nBuckets <= 0 || maxC <= 0 ||
        nBuckets <= 3037000499L / maxC,
      s"lagAutocorr: buckets($nBuckets)·max_count($maxC) exceeds " +
        "3037000499 = floor(sqrt(2^63-1)) — the exact integer cross " +
        "products would overflow; widen bucketSeconds or pre-band counts")
    val dense = spark.range(lo, hi + 1).select(col("id").as("b"))
      .join(counts.hint("shuffle_hash"), Seq("b"), "left")
      .na.fill(0L, Seq("c"))
      .localCheckpoint(eager = false)        // one scan feeds every lag pair
    val perLag = lags.distinct.sorted.map { k =>
      dense.as("x")
        .join(dense.as("y").hint("shuffle_hash"),
          col("x.b") + k === col("y.b"))
        .select(col("x.c").as("x"), col("y.c").as("y"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(lit(k).cast("long").as("lag"), col("n_pairs"),
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("den_x"),
          (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("den_y"))
    }
    perLag.reduce(_.unionAll(_))
      .withColumn("r",
        when(col("den_x") > 0 && col("den_y") > 0,
          round(col("num").cast("double") /
            sqrt(col("den_x").cast("double") * col("den_y")), 6)))
  }

  /** Per-group OLS trend of a signal over time buckets — "is this source's
    * quality drifting?" as a slope with an r² attached, the longitudinal
    * sibling of the point-in-time drift tests. Values are milli-quantized
    * and bucket indices re-origined to each GROUP's first bucket, so the
    * six regression sums (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT integers —
    * summation order cannot wiggle them. The closing slope/r² arithmetic
    * then runs in double on those exact sums (the cross products n·Σy² etc.
    * overflow 2⁶³ on realistic milli-quantized signals — the sf1 probe
    * caught exactly that under ANSI mode): every term is one fixed IEEE
    * expression over exact operands, so it stays bit-identical across
    * engines, without the integer-product range cliff.
    *
    * Output per group: `grp`, `n_rows`, `sx`, `sy` (exact longs),
    * `slope_milli_per_bucket` (round-6; NULL for a single-bucket group —
    * no time spread), `r2` (round-6; NULL when either variance term is 0).
    * Rows with NULL ts or value are excluded.
    *
    * Scale design: one enum-keyed min-bucket aggregate broadcast back, one
    * map-side-combined sum pass — no windows, no ordering.
    */
  def groupTrend(df: DataFrame, group: Column, ts: Column, value: Column,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be ≥1, got $bucketSeconds")
    val wUs = bucketSeconds * 1000000L
    val base = df.select(group.as("grp"),
        TimeCols.tsMicros(ts).as("__us"), value.cast("double").as("__v"))
      .filter(col("__us").isNotNull && col("__v").isNotNull)
      .select(col("grp"), floor(col("__us") / wUs).cast("long").as("b"),
        round(col("__v") * 1000).cast("long").as("y"))
    val origin = base.groupBy("grp").agg(min(col("b")).as("__b0"))
    val xy = base.join(broadcast(origin), Seq("grp"))
      .select(col("grp"), (col("b") - col("__b0")).as("x"), col("y"))
    // product sums in decimal(38,0): Σy² breaks 2⁶³ near 10⁸ milli-valued
    // rows per group — decimal keeps them EXACT (DuckDB's HUGEINT twin)
    val agg = xy.groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    // cross products in double over the exact sums — one fixed IEEE
    // expression per term, no 2⁶³ cliff, engine-identical
    val nD = col("n_rows").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy")
    val denX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx")
    val denY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy")
    agg.select(col("grp"), col("n_rows"), col("sx"), col("sy"),
      when(denX > 0, round(num / denX, 6)).as("slope_milli_per_bucket"),
      when(denX > 0 && denY > 0, round(num * num / (denX * denY), 6))
        .as("r2"))
  }
}
