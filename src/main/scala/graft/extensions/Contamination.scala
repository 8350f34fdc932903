package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora — the GPT-3/PaLM
  * decontamination shape: a document is contaminated to the degree its token
  * n-grams appear in a (much smaller) benchmark/eval set.
  *
  * Scale design: the benchmark n-gram set is bounded (eval suites are MBs,
  * not TBs) — it broadcasts, so the corpus side is one explode + broadcast
  * semi-join + per-doc aggregate: no corpus shuffle except the final doc-id
  * re-aggregation, which AQE-coalesces to the matched subset. Production runs
  * at n = 13 (the published operating point); tests use smaller n so the
  * synthetic word-soup corpus produces overlap at all.
  */
object Contamination {

  /** Per-document contamination: distinct token `n`-gram overlap with the
    * benchmark set. Output: (id, n_shingles, n_contaminated, contamination).
    * Docs without tokens are excluded (no shingles → no denominator).
    */
  def ngramContamination(docs: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int = 13): DataFrame = {
    val docSh = docs
      .filter(size(TextAnalysis.tokens(text)) > 0)
      .select(id.as("id"), explode(Dedup.shingles(text, n)).as("sh"))
    val benchSh = benchmark
      .filter(size(TextAnalysis.tokens(text)) > 0)
      .select(explode(Dedup.shingles(text, n)).as("sh"))
      .distinct()
    docSh
      .join(broadcast(benchSh.withColumn("__hit", lit(1))), Seq("sh"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }
}
