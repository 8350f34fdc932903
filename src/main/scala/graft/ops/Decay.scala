package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-decayed activity scoring — the recency-weighted reputation a crawl
  * scheduler or domain-prioritizer keeps per key (user, domain, source):
  * `score = Σ value · 2^(−Δt / halfLife)` with Δt measured back from the
  * corpus's latest event. A burst last week outranks steady noise from a
  * year ago, with the trade set by one interpretable knob (the half-life).
  *
  * Arithmetic contract (engine-portable): each event's decay weight is
  * quantized to integer MICROS (`floor(2^(−Δt/hl) · 1e6 + ½)`) and its
  * value to integer MILLIS before multiplying, so the per-key score is an
  * exact integer sum — summation order cannot wiggle the result, and any
  * SQL engine reproduces it bit-for-bit. Overflow envelope (ENFORCED, the
  * raise_error contract shared with Anomaly/Drift): the per-event product
  * needs `|value_milli| ≤ (2⁶³−1)/10⁶` (|value| ≤ ~9.2·10⁹ — checked per
  * row), the per-key SUM accumulates in decimal(38,0) (no row-count
  * cliff — a previous revision claimed a Long sum was safe to 10¹² rows,
  * which is off by orders of magnitude), and the final score is
  * range-checked back to BIGINT — a key whose exact score exceeds 2⁶³−1
  * fails loudly, exactly as the DuckDB oracle's HUGEINT→BIGINT cast would.
  *
  * Scale design: one max-timestamp aggregate broadcast as a scalar (the
  * repo's 1-row crossJoin idiom), then a single map-side-combined key
  * aggregate — no windows, no per-key sort, no driver loop.
  */
object Decay {

  /** Per-key decayed activity: `key`, `n_events`, `last_us` (the key's own
    * latest event), `score_micro_milli` (Σ value_milli · weight_micro —
    * exact integer; divide by 1e9 for the real-valued score). Rows with a
    * NULL timestamp or NULL value are excluded (no decay position). NULL
    * keys form their own group (a real bucket for unattributed events).
    */
  def decayedActivity(df: DataFrame, key: Column, ts: Column, value: Column,
      halfLifeSeconds: Long): DataFrame = {
    require(halfLifeSeconds >= 1 && halfLifeSeconds <= 3653L * 86400L,
      s"halfLifeSeconds must be in [1s, 10y], got $halfLifeSeconds")
    val base = df.select(key.as("key"), TimeCols.tsMicros(ts).as("__us"),
        value.cast("double").as("__v"))
      .filter(col("__us").isNotNull && col("__v").isNotNull)
    val tMax = base.agg(max(col("__us")).as("__tmax"))
    val hlUs = halfLifeSeconds.toDouble * 1e6
    val wMicro = floor(
      pow(lit(2.0), -(col("__tmax") - col("__us")).cast("double") / hlUs)
        * 1e6 + 0.5).cast("long")
    val vmMax = Long.MaxValue / 1000000L // weight_micro ≤ 1e6
    val vmRaw = round(col("__v") * 1000).cast("long")
    val vm = when(abs(vmRaw) <= vmMax, vmRaw)
      .otherwise(raise_error(concat(
        lit(s"Decay.decayedActivity: |round(value*1000)| exceeds the " +
          s"overflow-safe per-event bound $vmMax; got "),
        vmRaw.cast("string"))))
    base.crossJoin(broadcast(tMax))
      .select(col("key"), col("__us"),
        (vm * wMicro).cast("decimal(38,0)").as("__c"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"), max(col("__us")).as("last_us"),
        sum(col("__c")).as("__sd"))
      .select(col("key"), col("n_events"), col("last_us"),
        when(abs(col("__sd")) <= lit(Long.MaxValue), col("__sd"))
          .otherwise(raise_error(concat(
            lit("Decay.decayedActivity: exact score exceeds 2^63-1 for key "),
            col("key").cast("string"),
            lit(" — rescale value or shorten the half-life"))))
          .cast("long").as("score_micro_milli"))
  }
}
