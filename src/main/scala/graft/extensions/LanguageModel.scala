package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics language scoring — the CCNet/Gopher "perplexity filter"
  * slot of a training-data pipeline (score every document by how typical its
  * tokens are of the corpus) plus BM25 keyword relevance (the retrieval
  * primitive behind targeted corpus audits: "find the documents most about
  * X" without an embedding index).
  *
  * Both operators are self-contained: the model IS the corpus (unigram
  * counts, document frequencies), so there is no external artifact to ship —
  * the same property that makes them reproducible by an independent SQL
  * engine for the oracle gate.
  *
  * Engine-stable float contract (same discipline as the quantize/prototype
  * operators): every per-token/per-term contribution is a pure double
  * expression with a FIXED association order, rounded to 6 dp, cast to
  * DECIMAL(18,6), and summed exactly — so the per-document sum is
  * bit-reproducible regardless of aggregation order, in this engine or any
  * other. Averages divide the exact decimal sum (as double) by the count in
  * one IEEE op.
  */
object LanguageModel {

  /** Unigram log-likelihood per document: each token scores
    * `round(ln(count(tok) / total_tokens), 6)`; a document's score is the
    * exact decimal sum and its length-normalized mean. Low `avg_logprob` =
    * tokens rare in this corpus = the "perplexity outlier" a CCNet-style
    * quality gate drops (gibberish, wrong-language, boilerplate-to-noise).
    *
    * Output: (id, n_tokens, sum_logprob, avg_logprob) — one row per input
    * row; token-less documents keep null scores and n_tokens = 0.
    *
    * Scale shape: ONE corpus scan builds the vocabulary counts (map-side
    * combined), one bounded 1-row aggregate reads the total token count onto
    * the driver, and the token→logprob join is gated on the MEASURED
    * vocabulary size: a natural-language vocabulary (even web-scale, ~10⁸
    * types) is far below corpus scale and broadcasts; above
    * `maxBroadcastVocab` the join falls back to a shuffle_hash equi-join on
    * the token (never sort-merge — the checkpointed counts carry no stats).
    * The vocabulary relation is checkpointed (GC-owned) so the probe count
    * and the join read one materialization of the same counts.
    */
  def unigramLogLikelihood(df: DataFrame, id: Column, text: Column,
      maxBroadcastVocab: Long = 4000000L): DataFrame = {
    val toks = df.select(id.as("id"), explode(TextAnalysis.tokens(text)).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("__n")).localCheckpoint()
    val nVocab = freq.count()
    // bounded: one scan, 1-row result (sum of per-row token counts)
    val total = df.select(sum(size(TextAnalysis.tokens(text))))
      .first().getLong(0)
    val lp = freq.select(col("tok"),
      round(log(col("__n").cast("double") / lit(total.toDouble)), 6)
        .cast("decimal(18,6)").as("__lp"))
    val mark: DataFrame => DataFrame =
      if (nVocab <= maxBroadcastVocab) broadcast
      else d => d.hint("shuffle_hash")
    val perDoc = toks.join(mark(lp), Seq("tok"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lp")).as("__sl"))
    df.select(id.as("id"))
      .join(perDoc.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("__sl").cast("double").as("sum_logprob"),
        round(col("__sl").cast("double") / col("n_tokens"), 6).as("avg_logprob"))
  }

  /** BM25 relevance of every document against a fixed bag of query `terms`
    * (Robertson/Spärck Jones, the `+1` idf form so scores stay positive for
    * terms in more than half the corpus). Per matched term:
    *
    * {{{
    *   idf  = ln((N - df + 0.5) / (df + 0.5) + 1)
    *   part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * }}}
    *
    * and the document's score is the exact decimal sum of
    * `round(idf·part, 6)`. Output: (id, n_terms_matched, score), matched
    * documents only.
    *
    * Scale shape: the exploded token stream is filtered to the query terms
    * IN THE SCAN (an `isin` over a literal set — tf rows are term-sparse from
    * that point on), corpus constants N/avgdl come from one bounded 1-row
    * aggregate, the ≤|terms|-row df/idf relation broadcasts, and the
    * tf⋈length join is a shuffle_hash equi-join on the document id. Nothing
    * quadratic, no corpus-wide shuffle except the per-doc re-aggregation of
    * term-sparse rows.
    */
  def bm25(df: DataFrame, id: Column, text: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = df.select(id.as("id"), TextAnalysis.tokens(text).as("__toks"))
    val dl = base.select(col("id"), size(col("__toks")).as("__dl"))
    // bounded: one scan, 1-row result
    val row = dl.agg(count(lit(1)), sum(col("__dl"))).first()
    val n = row.getLong(0)
    val avgdl = row.getLong(1).toDouble / n.toDouble
    val tf = base
      .select(col("id"), explode(col("__toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("id", "tok").agg(count(lit(1)).as("__tf"))
    val idf = tf.groupBy("tok").agg(count(lit(1)).as("__df"))
      .select(col("tok"),
        log((lit(n.toDouble) - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
          .as("__idf"))
    val contrib = tf
      .join(dl.hint("shuffle_hash"), Seq("id"))
      .join(broadcast(idf), Seq("tok"))
      .select(col("id"),
        round(col("__idf") * (col("__tf") * lit(k1 + 1.0) /
            (col("__tf") + lit(k1) * (lit(1.0 - b) +
              lit(b) * (col("__dl").cast("double") / avgdl)))),
          6).cast("decimal(18,6)").as("__c"))
    contrib.groupBy("id")
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("__c")).cast("double").as("score"))
  }
}
