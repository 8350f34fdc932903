package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension min/max) 8-bit quantization of embedding columns —
  * the storage-side companion of the ANN operators: a 64-dim FLOAT vector
  * (256 B) compresses to 64 uint8 codes (64 B), and IVF/LSH candidate
  * generation works unchanged on dequantized vectors while the exact re-rank
  * reads the full-precision column for only the survivors.
  *
  * Scale shape: the per-dimension corpus min/max is ONE map-side-combined
  * aggregate (dims × 16 bytes of state), collected driver-side at metadata
  * scale and shipped back in-plan as literal arrays (like the IVF centroids —
  * no model join against the corpus). Encoding is then a narrow per-row map.
  *
  * Codes use `floor(x·255 + 0.5)` (explicit half-up) so every engine
  * re-derives identical codes; a constant dimension (max == min) codes to 0.
  * Dequantized error is bounded by half a step per dimension:
  * |v − v̂| ≤ (max−min)/255/2 — pinned by [[quantizeWithError]].
  */
object Quantize {

  /** Per-dimension (min, max) over the corpus, 1-indexed dim order. */
  def dimStats(df: DataFrame, vec: Column): (Array[Double], Array[Double]) = {
    val rows = df.select(posexplode(vec).as(Seq("d", "v")))
      .select(col("d"), col("v").cast("double").as("v"))
      .groupBy("d").agg(min("v").as("mn"), max("v").as("mx"))
      .orderBy("d")
      .collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  private def litArr(a: Array[Double]): Column = array(a.map(lit).toSeq: _*)

  /** Adds `codes ARRAY<INT>` (0..255 per dimension).
    *
    * Round-15 advisory hardening: a vector whose length differs from the
    * fitted stats raises in-plan instead of zip-padding to NULL codes
    * (NULLs would sort FIRST under an ascending distance rank — silently
    * wrong top-k downstream); values outside the fitted [min,max] range
    * (e.g. stats fit on a sample) clamp to the uint8 contract [0,255].
    */
  def quantize(df: DataFrame, vec: Column, mins: Array[Double],
      maxs: Array[Double]): DataFrame = {
    require(mins.length == maxs.length && mins.nonEmpty)
    val mn = litArr(mins); val mx = litArr(maxs)
    val codesExpr = zip_with(vec, sequence(lit(1), lit(mins.length)),
      (v, d) => {
        val lo = element_at(mn, d); val hi = element_at(mx, d)
        when(hi > lo,
          greatest(lit(0), least(lit(255),
            floor((v.cast("double") - lo) / (hi - lo) * 255d + 0.5d)
              .cast("int"))))
          .otherwise(lit(0))
      })
    df.withColumn("codes",
      when(size(vec) =!= lit(mins.length),
        raise_error(concat(lit("quantize: vector dimension "),
          size(vec).cast("string"),
          lit(s" != fitted stats dimension ${mins.length}"))))
        .otherwise(codesExpr))
  }

  /** codes → approximate vector (`v_hat ARRAY<DOUBLE>`). */
  def dequantize(codes: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = litArr(mins); val mx = litArr(maxs)
    zip_with(codes, sequence(lit(1), lit(mins.length)), (c, d) => {
      val lo = element_at(mn, d); val hi = element_at(mx, d)
      lo + c.cast("double") / 255d * (hi - lo)
    })
  }

  /** One row per vector with code fingerprints and the reconstruction-error
    * bound check: `err_ok` TRUE iff every dimension's |v − v̂| is within half
    * a quantization step (plus float slack).
    */
  def quantizeWithError(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val (mins, maxs) = dimStats(df, vec)
    // per-dim half-step bound, precomputed driver-side like the stats
    val bounds = litArr(mins.zip(maxs).map { case (lo, hi) =>
      (hi - lo) / 255d / 2d + 1e-9 })
    val coded = quantize(df.select(id.as("id"), vec.as("v")), col("v"), mins, maxs)
    val vhat = dequantize(col("codes"), mins, maxs)
    val errs = zip_with(col("v").cast("array<double>"), vhat, (a, b) => abs(a - b))
    coded.select(col("id"), col("codes"),
        size(col("codes")).as("n_dims"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("sum_code"),
        array_min(col("codes")).as("min_code"),
        array_max(col("codes")).as("max_code"),
        forall(zip_with(errs, bounds, (e, b) => e <= b), x => x).as("err_ok"))
  }
}
