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

  /** [[ngramContamination]] behind a Bloom-filter prefilter — IDENTICAL
    * output (the filter is exact-confirmed, and Bloom filters have no false
    * negatives: an actually-contaminated shingle hashes to the same
    * positions the benchmark build set, so it always survives the
    * prefilter), but the benchmark's shingle STRINGS never broadcast.
    *
    * Why this exists at 100 TB: [[ngramContamination]] broadcasts the
    * benchmark's distinct shingles — fine for MB-scale eval suites,
    * impossible when the "benchmark" is itself corpus-scale (decontaminating
    * against an entire held-out split, or against last month's crawl). Here
    * the only broadcast is the Bloom BITMAP, represented as a sparse
    * (word_index → 64-bit word) relation of ≤ `mBits`/64 rows (4096 rows =
    * 32 KiB at the default 2^18 bits) regardless of benchmark size; corpus
    * shingles check membership with `kHashes` codegen'd hash probes against
    * that broadcast, and only the surviving sliver (true hits + the bounded
    * false-positive rate) reaches the exact confirm join — which therefore
    * joins small-vs-small on a shuffle instead of corpus-vs-broadcast.
    *
    * Construction: k seeded hashes — position_j = xxhash64(sh, j) mod m —
    * rather than the classic (h1 + j·h2) double-hashing form: the sum
    * overflows bigint for full-range hashes, which ANSI mode (the Spark 4
    * default) turns into a runtime error, and xxhash64's extra-argument
    * seeding gives independent probes at the same one-expression cost.
    * Both sides compute the same positions, which is all
    * no-false-negatives needs.
    * The bitmap build is one aggregate: explode k positions per distinct
    * benchmark shingle, `bit_or` the single-bit masks per 64-bit word.
    *
    * Output: exactly [[ngramContamination]]'s
    * (id, n_shingles, n_contaminated, contamination).
    */
  def bloomPrefilteredContamination(docs: DataFrame, benchmark: DataFrame,
      id: Column, text: Column, n: Int = 13, mBits: Int = 1 << 18,
      kHashes: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= (1 << 28),
      s"mBits must be a multiple of 64 in [64,2^28], got $mBits")
    require(kHashes >= 1 && kHashes <= 8,
      s"kHashes must be in [1,8], got $kHashes")
    val benchSh = benchmark
      .filter(size(TextAnalysis.tokens(text)) > 0)
      .select(explode(Dedup.shingles(text, n)).as("sh"))
      .distinct()
    def positions(sh: Column): Column =
      transform(sequence(lit(0), lit(kHashes - 1)),
        j => pmod(xxhash64(sh, j), lit(mBits.toLong)))
    // sparse bitmap: one row per 64-bit word that has any bit set
    val words = benchSh
      .select(explode(positions(col("sh"))).as("__pos"))
      .select(expr("__pos DIV 64").as("__w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").as("__mask"))
      .groupBy(col("__w"))
      .agg(expr("bit_or(__mask)").as("__word"))
    // per-instance shingles with a stable instance key (id, ordinal) so the
    // k-probe fan-out can collapse back to one verdict per OCCURRENCE
    // (ngramContamination counts occurrences, not distinct shingles)
    val inst = docs
      .filter(size(TextAnalysis.tokens(text)) > 0)
      .select(id.as("id"), posexplode(Dedup.shingles(text, n)).as(Seq("__ord", "sh")))
    val totals = inst.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    val survivors = inst
      .select(col("id"), col("__ord"), col("sh"),
        explode(positions(col("sh"))).as("__pos"))
      .select(col("id"), col("__ord"), col("sh"),
        expr("__pos DIV 64").as("__w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").as("__mask"))
      .join(broadcast(words), Seq("__w"))
      .filter((col("__mask").bitwiseAND(col("__word"))) =!= 0L)
      .groupBy(col("id"), col("__ord"), col("sh"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === kHashes)
    // exact confirm on the PRUNED set: small-vs-small, shuffled — the
    // benchmark side deliberately not broadcast (the whole point is that it
    // may be corpus-scale); post-aggregate relations carry no stats, so the
    // hint keeps Catalyst off sort-merge
    val confirmed = survivors
      .join(benchSh.hint("shuffle_hash"), Seq("sh"))
      .groupBy(col("id")).agg(count(lit(1)).as("__n_cont"))
    totals.join(confirmed, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("__n_cont"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
  }

  /** NEAR-dup decontamination: flag every `train` row within n-gram Jaccard
    * ≥ `threshold` of ANY `eval` row — the paraphrase-level leakage that
    * [[ngramContamination]]'s shingle-overlap score under-weights when an
    * eval item was lightly rewritten into the corpus. Output: every train
    * row (original columns) + `n_eval_matches`, `max_jaccard` (null if
    * clean), `is_contaminated`.
    *
    * Candidate generation is [[Dedup.ngramJaccardPairs]] over the TAGGED
    * UNION of both sides — one blocked self-join instead of a train×eval
    * join, so the same block/vocab machinery (and its measured bitset
    * cutover) applies unchanged; same-side pairs are discarded after the
    * side-resolution joins. `id` must be unique ACROSS both frames (pair
    * identity is id-based — same caller contract as [[exact]]'s keep order);
    * `block` must be computable on both (e.g. lang × length band).
    *
    * Scale shape: cross pairs are USUALLY corpus-sparse, so side resolution
    * and the final flag join run as broadcast joins against 2-column
    * projections — but the pair relation's size is data-dependent (a low
    * threshold or a heavily contaminated corpus makes it corpus-scale), so
    * the broadcast is gated on the MEASURED pair count (the same
    * measure-then-pick idiom as [[Dedup.resolveClusters]]' skew gate): the
    * generator returns an eagerly-checkpointed pair set, the count is a cheap
    * second action on it, and every pair-scale intermediate is bounded by
    * that count. Above `maxBroadcastPairs` the joins fall back to
    * `shuffle_hash` hints (post-aggregate relations have no stats, so
    * without the hint they would silently sort-merge) — degraded throughput,
    * never a driver OOM. For corpora where exact Jaccard pairs are too
    * expensive even blocked, swap [[Dedup.minhashPairs]] into the same
    * union-tag-resolve shape (estimated Jaccard, same orientation logic).
    */
  def nearDupContamination(train: DataFrame, eval: DataFrame,
      id: Column, text: Column, block: Column,
      n: Int = 3, threshold: Double = 0.5,
      maxDictVocab: Int = 4096,
      maxBroadcastPairs: Long = 5000000L): DataFrame = {
    // token-less rows are excluded from PAIR GENERATION only (their shingle
    // set is [""], so two empty docs in one block would spuriously "match" at
    // jaccard 1.0 — same exclusion as ngramContamination); they stay in the
    // OUTPUT, flagged clean, because the flag join is left outer on train
    val t = train.select(id.as("id"), text.as("__text"), block.as("__block"))
      .withColumn("__side", lit("train"))
    val e = eval.select(id.as("id"), text.as("__text"), block.as("__block"))
      .withColumn("__side", lit("eval"))
    val tagged = t.unionByName(e)
      .filter(size(TextAnalysis.tokens(col("__text"))) > 0)
    // materialize=true → eagerly-checkpointed pairs (GC-owned blocks), so the
    // gate's count() re-reads the checkpoint instead of re-running the
    // generator, and the downstream joins read it exactly once
    val pairs = Dedup.ngramJaccardPairs(tagged, col("id"), col("__text"),
      col("__block"), n, threshold, materialize = true, maxDictVocab)
    val mark: DataFrame => DataFrame =
      if (pairs.count() <= maxBroadcastPairs) broadcast
      else df => df.hint("shuffle_hash")
    val sides = tagged.select(col("id"), col("__side"))
    // hints don't survive joins — re-mark the (still pair-scale) intermediate
    val withA = mark(pairs)
      .join(sides.select(col("id").as("id_a"), col("__side").as("__side_a")), Seq("id_a"))
    val resolved = mark(withA)
      .join(sides.select(col("id").as("id_b"), col("__side").as("__side_b")), Seq("id_b"))
      .filter(col("__side_a") =!= col("__side_b"))
    val agg = resolved
      .select(when(col("__side_a") === "train", col("id_a")).otherwise(col("id_b")).as("__tid"),
        col("jaccard"))
      .groupBy("__tid")
      .agg(count(lit(1)).as("n_eval_matches"), max(col("jaccard")).as("max_jaccard"))
    train
      .join(mark(agg), id === col("__tid"), "left")
      .drop("__tid")
      .withColumn("n_eval_matches", coalesce(col("n_eval_matches"), lit(0L)))
      .withColumn("is_contaminated", col("n_eval_matches") > 0)
  }

  /** Per-document n-gram NOVELTY against a reference sub-corpus — the
    * inverse of contamination: instead of flagging overlap with a benchmark,
    * score how much of each candidate document is NOT already covered by
    * the reference partition (an earlier crawl snapshot, the retained
    * corpus, a high-quality seed set). The standard freshness/diversity
    * signal when deciding what a new crawl actually adds.
    *
    * `novelty_ppm = 10⁶ · |distinct grams unseen in ref| / |distinct grams|`
    * — integer parts-per-million so the score is bit-stable (the x72
    * no-float-division convention). Gram semantics are
    * [[graft.functions.NGrams]]'s set semantics (distinct windows, one
    * short window for docs under `n` tokens) — the same native shingle
    * every near-dup operator uses.
    *
    * Scale shape: one shuffle keyed by the gram string (reference set
    * `distinct` + left join — shuffle-hash hinted, the iterated side
    * carries no stats), then a per-doc aggregate. Grams are short token
    * windows, so the join key is the gram itself (exact, oracle-friendly);
    * a 100 TB deployment would pre-project sha2(gram) as the join key to
    * keep the shuffle narrow — same results, wider hash than any realistic
    * collision budget.
    *
    * Output: one row per NON-reference doc: `id`, `n_grams`, `n_unseen`,
    * `novelty_ppm`.
    */
  def ngramNovelty(df: DataFrame, id: Column, text: Column, isRef: Column,
      n: Int = 3): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1,8], got $n")
    val grams = df.select(id.as("id"), isRef.as("__ref"),
      explode(graft.functions.NGrams.ngrams(TextAnalysis.tokens(text), n))
        .as("g"))
    val ref = grams.filter(col("__ref")).select(col("g")).distinct()
      .withColumn("__hit", lit(1))
    grams.filter(!col("__ref"))
      .select(col("id"), col("g"))
      .join(ref.hint("shuffle_hash"), Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("novelty_ppm", expr("(n_unseen * 1000000) div n_grams"))
  }
}
