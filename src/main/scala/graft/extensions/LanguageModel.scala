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

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every document by
    * how much more likely its tokens are under a TARGET distribution than
    * under the raw corpus, with both bag-of-words models compressed into
    * `nBuckets` hashed features so the model size is FIXED regardless of
    * corpus scale. High `avg_logratio` = looks like the target (keep /
    * up-weight when resampling toward it).
    *
    * Per bucket `b`: `lr_b = round(ln((ct_b+s)/(Nt+s·B)) − ln((cr_b+s)/(Nr+s·B)), 6)`
    * (add-`s` smoothed target vs raw log-probabilities), cast DECIMAL(18,6);
    * a document's `sum_logratio` is the exact decimal sum of its tokens'
    * bucket scores. The bucket is the engine-portable sha primitive
    * ([[Sampling.hashBucket]]'s trade): first 8 hex chars of sha256(token)
    * mod `nBuckets` — the DuckDB oracle re-derives every score.
    *
    * Scale shape: one corpus token scan feeds two map-side-combined
    * ≤`nBuckets`-row aggregates (the entire "model"); the score join is a
    * BROADCAST of that fixed-size table — that is the point of hashed
    * features — followed by one per-doc re-aggregation. No vocabulary-scale
    * state anywhere.
    */
  def hashedImportanceWeights(df: DataFrame, id: Column, text: Column,
      isTarget: Column, nBuckets: Int = 1024,
      smoothing: Double = 0.5): DataFrame = {
    require(nBuckets > 0 && nBuckets <= (1 << 24),
      s"nBuckets must be in [1, 2^24], got $nBuckets")
    require(smoothing > 0, s"smoothing must be positive, got $smoothing")
    val bucket =
      conv(substring(sha2(col("tok"), 256), 1, 8), 16, 10).cast("long") %
        nBuckets.toLong
    val toks = df
      .select(id.as("id"), isTarget.as("__t"),
        explode(TextAnalysis.tokens(text)).as("tok"))
      .select(col("id"), col("__t"), bucket.as("__b"))
    // ONE fused bucket-stat pass (raw + target counts together), eagerly
    // checkpointed at ≤ nBuckets rows: the previous shape ran FOUR serialized
    // corpus-tokenize jobs (raw agg, target agg, a 1-row totals aggregate,
    // then the per-doc join) — the serialized chain the round-8 driver bench
    // measured as a 4.4× driver-vs-local gap on x66. The totals now derive
    // from the tiny checkpointed relation (every token lands in exactly one
    // bucket, so Σ__cr ≡ total raw tokens and Σ__ct ≡ total target tokens),
    // leaving TWO corpus-scale jobs: bucket stats and the per-doc score.
    val bstats = toks.groupBy("__b")
      .agg(count(lit(1)).as("__cr"),
        sum(when(col("__t"), lit(1L)).otherwise(0L)).as("__ct"))
      .localCheckpoint()
    val row = bstats
      .agg(coalesce(sum(col("__cr")), lit(0L)),
        coalesce(sum(col("__ct")), lit(0L)))
      .first()
    val nr = row.getLong(0).toDouble
    val nt = row.getLong(1).toDouble
    val denomT = lit(nt) + lit(smoothing) * lit(nBuckets.toDouble)
    val denomR = lit(nr) + lit(smoothing) * lit(nBuckets.toDouble)
    val lr = bstats
      .select(col("__b"),
        round(
          log((col("__ct").cast("double") + lit(smoothing)) / denomT) -
          log((col("__cr").cast("double") + lit(smoothing)) / denomR),
          6).cast("decimal(18,6)").as("__lr"))
    val perDoc = toks.join(broadcast(lr), Seq("__b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr")).as("__sl"))
    df.select(id.as("id"))
      .join(perDoc.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("__sl").cast("double").as("sum_logratio"),
        round(col("__sl").cast("double") / col("n_tokens"), 6)
          .as("avg_logratio"))
  }

  /** Interpolated bigram log-likelihood — the CCNet "perplexity filter" slot
    * one Markov order up from [[unigramLogLikelihood]]: each bigram position
    * scores `round(ln(λ·p(w|v) + (1−λ)·p(w)), 6)` where `p(w|v)` is the
    * corpus bigram probability (count of "v w" over count of bigrams starting
    * with `v`) and `p(w)` the unigram fallback that keeps unseen-context
    * positions finite. Low `avg_logprob` = improbable token SEQUENCES — the
    * signal that catches shuffled/boilerplate text a unigram model scores as
    * perfectly typical.
    *
    * Output: (id, n_bigrams, sum_logprob, avg_logprob) — one row per input
    * row; docs with fewer than two tokens keep null scores and n_bigrams = 0.
    *
    * Engine-stable float contract as everywhere in this file: per-bigram-TYPE
    * contributions are rounded to 6 dp, cast DECIMAL(18,6), and decimal-summed
    * per document; `1−λ` is written as the IEEE subtraction on BOTH engines
    * (never the pre-computed constant — it differs in the last ulp).
    *
    * Scale shape: bigrams come from the native
    * [[graft.functions.NgramWindows]] expression (scan-local, codegen'd,
    * multiplicity-preserving); the bigram/context/unigram count
    * relations are all vocabulary-scale, joined to each other shuffle_hash on
    * their keys, and the corpus-stream score join is gated on the MEASURED
    * bigram vocabulary — broadcast below `maxBroadcastVocab`, shuffle_hash
    * equi-join above (never sort-merge; the checkpointed counts carry no
    * stats).
    */
  def bigramLogLikelihood(df: DataFrame, id: Column, text: Column,
      lambda: Double = 0.9, maxBroadcastVocab: Long = 4000000L): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, s"lambda must be in (0,1], got $lambda")
    val bg = df.select(id.as("id"),
      explode(graft.functions.NgramWindows.ngramWindows(TextAnalysis.tokens(text), 2))
        .as("bg"))
    val bgFreq = bg.groupBy("bg").agg(count(lit(1)).as("__cb")).localCheckpoint()
    val nVocab = bgFreq.count()
    // context count c(v·) = bigrams starting with v — the Markov denominator
    val ctxFreq = bgFreq
      .groupBy(substring_index(col("bg"), " ", 1).as("__v"))
      .agg(sum(col("__cb")).as("__cv"))
    val toks = df.select(explode(TextAnalysis.tokens(text)).as("tok"))
    val uniFreq = toks.groupBy("tok").agg(count(lit(1)).as("__cu"))
    // bounded: one scan, 1-row result (total unigram token count)
    val total = df.select(sum(size(TextAnalysis.tokens(text))))
      .first().getLong(0)
    val lp = bgFreq
      .join(ctxFreq.hint("shuffle_hash"),
        substring_index(col("bg"), " ", 1) === col("__v"))
      .join(uniFreq.hint("shuffle_hash"),
        substring_index(col("bg"), " ", -1) === col("tok"))
      .select(col("bg"),
        round(log(
          lit(lambda) * (col("__cb").cast("double") / col("__cv").cast("double")) +
          (lit(1.0) - lit(lambda)) *
            (col("__cu").cast("double") / lit(total.toDouble))),
          6).cast("decimal(18,6)").as("__lp"))
    val mark: DataFrame => DataFrame =
      if (nVocab <= maxBroadcastVocab) broadcast
      else d => d.hint("shuffle_hash")
    val perDoc = bg.join(mark(lp), Seq("bg"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__sl"))
    df.select(id.as("id"))
      .join(perDoc.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("__sl").cast("double").as("sum_logprob"),
        round(col("__sl").cast("double") / col("n_bigrams"), 6)
          .as("avg_logprob"))
  }

  /** Per-document top-`k` keywords by smoothed tf-idf
    * (`tf · (ln((1+N)/(1+df)) + 1)`, the sklearn smoothing so every term —
    * even corpus-universal ones — keeps a positive weight): the
    * no-embedding-needed document descriptor for corpus browsing, cluster
    * labeling, and topic drift checks between snapshots.
    *
    * Scores are rounded to 6 dp BEFORE ranking so the (tfidf desc, term asc)
    * order is identical across engines; `rank` is a dense per-document
    * row_number over that order.
    *
    * Output: (id, term, tf, tfidf, rank), rank ≤ k.
    *
    * Scale shape: tf is one (doc, term) map-side-combined aggregate of the
    * exploded scan; document frequency aggregates THE TF RELATION (term-
    * sparse, never the raw token stream); N comes from one bounded 1-row
    * count; the idf relation is vocabulary-sized and joins under the same
    * measured broadcast-vs-shuffle_hash gate as [[unigramLogLikelihood]].
    * The ranking window partitions by document — bounded by per-doc distinct
    * terms, never a global sort.
    */
  def tfIdfTopTerms(df: DataFrame, id: Column, text: Column, k: Int,
      maxBroadcastVocab: Long = 4000000L): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val tf = df.select(id.as("id"), explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df")).localCheckpoint()
    val nVocab = dfreq.count()
    // bounded: 1-row corpus size for the idf numerator
    val nDocs = df.select(count(lit(1))).first().getLong(0)
    val idf = dfreq.select(col("term"),
      (log((lit(1.0) + lit(nDocs.toDouble)) / (lit(1.0) + col("__df").cast("double")))
        + lit(1.0)).as("__idf"))
    val mark: DataFrame => DataFrame =
      if (nVocab <= maxBroadcastVocab) broadcast
      else d => d.hint("shuffle_hash")
    val scored = tf.join(mark(idf), Seq("term"))
      .withColumn("tfidf", round(col("tf").cast("double") * col("__idf"), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("id", "term", "tf", "tfidf", "rank")
  }

  /** Corpus-wide top-`topK` collocations by pointwise mutual information:
    * adjacent bigrams occurring ≥ `minCount` times, scored
    * `pmi = ln((c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)))` — the classic
    * collocation extractor (Church & Hanks 1990) for fixed-phrase detection,
    * tokenizer-merge candidates, and templated-text diagnosis (a corpus
    * whose top PMI list is navigation chrome is a boilerplate problem).
    *
    * `minCount` is the standard PMI sparsity guard: a hapax bigram of two
    * hapax unigrams scores ln(N_uni²/N_bi) — spectacular and meaningless.
    * Scores are rounded to 6 dp and the (pmi desc, bigram asc) order is
    * total, so the top-k boundary is engine-deterministic.
    *
    * Output: (bigram, n_pair, n_left, n_right, pmi), the top `topK` rows.
    *
    * Scale shape: bigrams come from the native codegen'd
    * [[graft.functions.NgramWindows]] scan; both count relations are
    * vocabulary-scale and join shuffle_hash on the token (stat-less
    * checkpoints would sort-merge unhinted); corpus totals are two bounded
    * 1-row aggregates of the SAME scan shape; the global top-k is a
    * TakeOrdered over the minCount-filtered (hence sparse) scored relation —
    * no single-partition window, no full sort.
    */
  def pmiCollocations(df: DataFrame, text: Column, minCount: Long = 5L,
      topK: Int = 100): DataFrame = {
    require(minCount >= 1, "minCount must be at least 1")
    require(topK >= 1, "topK must be at least 1")
    val bg = df.select(
      explode(graft.functions.NgramWindows.ngramWindows(TextAnalysis.tokens(text), 2))
        .as("bigram"))
    val bgFreq = bg.groupBy("bigram").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val uniFreq = df.select(explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__cu"))
    // bounded: two 1-row corpus totals (tokens; adjacent-bigram positions)
    val totals = df.select(
        sum(size(TextAnalysis.tokens(text))).as("u"),
        sum(greatest(size(TextAnalysis.tokens(text)) - 1, lit(0))).as("b"))
      .first()
    val nUni = totals.getLong(0).toDouble
    val nBi = totals.getLong(1).toDouble
    bgFreq
      .join(uniFreq.hint("shuffle_hash").select(col("tok"), col("__cu").as("n_left")),
        substring_index(col("bigram"), " ", 1) === col("tok")).drop("tok")
      .join(uniFreq.hint("shuffle_hash").select(col("tok"), col("__cu").as("n_right")),
        substring_index(col("bigram"), " ", -1) === col("tok")).drop("tok")
      .withColumn("pmi", round(log(
        (col("n_pair").cast("double") / lit(nBi)) /
          ((col("n_left").cast("double") / lit(nUni)) *
           (col("n_right").cast("double") / lit(nUni)))), 6))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(topK)
      .select("bigram", "n_pair", "n_left", "n_right", "pmi")
  }

  /** Per-group unigram KL divergence from the corpus distribution,
    * `KL(group ‖ corpus) = Σ_t p_t·ln(p_t/q_t)` — the domain-shift meter: a
    * source whose vocabulary distribution sits far from the corpus mix is
    * the one to re-weight (or investigate) before training. No smoothing is
    * needed: every group token is by construction in the corpus, so q > 0
    * wherever p > 0.
    *
    * Engine-reproducible by the [[graft.functions.TokenEntropy]] integer
    * idiom: each term's contribution is rounded to integer MICRO-nats and
    * the per-group sum is an exact BIGINT — no float-accumulation order
    * anywhere (a double sum of 10⁵ tiny terms differs run to run; the
    * micro-nat sum cannot). `kl` is the exact quotient micros/10⁶.
    *
    * Output: (group, n_tokens, n_types, kl_micros, kl).
    *
    * Scale shape: ONE token scan builds the (group, token) counts; the
    * corpus counts are a SECOND aggregate of that same relation (never a
    * second scan); group totals are enum-scale and broadcast; the
    * group⋈corpus count join is shuffle_hash on the token (vocab-scale,
    * stat-less). Nothing quadratic, no corpus-scale collect.
    */
  def vocabDivergence(df: DataFrame, group: Column, text: Column): DataFrame = {
    val gf = df.select(group.as("group"), explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy("group", "tok").agg(count(lit(1)).as("__cg"))
      .localCheckpoint(eager = false)
    val cf = gf.groupBy("tok").agg(sum(col("__cg")).as("__c"))
    val gTot = gf.groupBy("group").agg(sum(col("__cg")).as("__ng"),
      count(lit(1)).as("n_types"))
    // bounded: 1-row corpus token total
    val total = df.select(sum(size(TextAnalysis.tokens(text))))
      .first().getLong(0)
    val p = col("__cg").cast("double") / col("__ng").cast("double")
    val q = col("__c").cast("double") / lit(total.toDouble)
    gf.join(cf.hint("shuffle_hash"), Seq("tok"))
      .join(broadcast(gTot.select(col("group"), col("__ng"))), Seq("group"))
      .withColumn("__micros", round(p * log(p / q) * lit(1000000.0), 0).cast("long"))
      .groupBy("group").agg(sum(col("__micros")).as("kl_micros"))
      .join(broadcast(gTot), Seq("group"))
      .select(col("group"), col("__ng").as("n_tokens"), col("n_types"),
        col("kl_micros"),
        (col("kl_micros").cast("double") / lit(1000000.0)).as("kl"))
  }

  /** Source-pair vocabulary similarity via MinHash — the corpus-overlap
    * fingerprint: for every pair of groups (sources), an unbiased estimate
    * of the Jaccard similarity of their token VOCABULARIES (type overlap,
    * not frequency — [[vocabDivergence]] is the frequency-shift meter).
    * Answers "which sources say the same things" before mixture decisions:
    * two crawls of the same forum show sim ≈ 1 and deserve one mixture
    * slot, not two.
    *
    * The `nPerms` hash functions are 48-bit sha256 prefixes of `"p:token"`
    * — engine-rederivable, no RNG (the [[Similarity.randomProjection]]
    * convention), so the whole relation is HASH-comparable: the oracle
    * recomputes every min from scratch in long form while the engine runs
    * the wide form (`nPerms` min-aggregates in ONE group shuffle over the
    * distinct vocabulary — map-side combine collapses each partition to one
    * row per group before the shuffle; no per-permutation row blowup).
    * Pair expansion is a broadcast self-join over the enum-scale signature
    * relation (k sources → k² candidate pairs, dashboard-sized).
    *
    * Output: one row per unordered pair `(src_a < src_b)`: `n_agree` of
    * `nPerms` minima equal, `sim_est = n_agree / nPerms` rounded to 6 dp
    * (E[sim_est] = Jaccard(vocab_a, vocab_b); s.e. ≈ 1/√nPerms).
    */
  def vocabMinhashSim(df: DataFrame, group: Column, text: Column,
      nPerms: Int = 64): DataFrame = {
    require(nPerms >= 1 && nPerms <= 256,
      s"nPerms must be in [1,256], got $nPerms")
    val vocab = df
      .select(group.as("group"), explode(TextAnalysis.tokens(text)).as("tok"))
      .distinct()
      .localCheckpoint(eager = false)            // scanned by hash + join
    // hash each DISTINCT token once (not once per group it appears in), and
    // one sha256 yields FOUR independent 48-bit values (12-hex slices of
    // the 64-hex digest) — digest count is |global vocab|·nPerms/4, not
    // |group×vocab|·nPerms. The sha array materializes in its own projection
    // so each digest is computed once even without subexpression elimination.
    val nShas = (nPerms + 3) / 4
    val hashed = vocab.select(col("tok")).distinct()
      .select(col("tok"), array((0 until nShas).map(q =>
        sha2(concat(lit(s"$q:"), col("tok")), 256)): _*).as("__shas"))
      .select(col("tok"), array((0 until nPerms).map(p =>
        conv(substring(element_at(col("__shas"), p / 4 + 1),
          1 + 12 * (p % 4), 12), 16, 10).cast("long")): _*).as("__h"))
    val aggs = (0 until nPerms).map(p =>
      min(element_at(col("__h"), p + 1)).as(s"__h$p"))
    val sigs = vocab
      .join(hashed.hint("shuffle_hash"), Seq("tok"))
      .groupBy("group").agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(eager = false)            // read twice by the self-join
    val agree = (0 until nPerms).map(p =>
      when(col(s"a.__h$p") === col(s"b.__h$p"), 1L).otherwise(0L))
      .reduce(_ + _)
    sigs.as("a")
      .join(broadcast(sigs.as("b")), col("a.group") < col("b.group"))
      .select(col("a.group").as("src_a"), col("b.group").as("src_b"),
        agree.as("n_agree"))
      .withColumn("sim_est",
        round(col("n_agree").cast("double") / nPerms, 6))
  }

  /** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
    * merge-table induction a corpus-owned tokenizer needs, run as a
    * relational algorithm: per round, count every adjacent symbol pair over
    * the word-frequency relation, pick the global argmax (ties broken
    * `(count DESC, left, right)` — fully deterministic, no RNG), and apply
    * the merge with the native [[graft.functions.MergePair]] greedy scan.
    * Stops early when no pair reaches `minCount`.
    *
    * Character-level within words ([[TextAnalysis.tokens]] word split, no
    * end-of-word marker), pair counts weighted by word frequency with
    * overlap (`aaa` counts `(a,a)` twice) while application is
    * non-overlapping greedy — the reference BPE behavior. Chosen counts are
    * NON-INCREASING over steps (each new pair instance arises from one
    * merge instance, so a new pair's count never exceeds the count just
    * chosen) — the x97 invariant.
    *
    * Scale shape: training runs over the DISTINCT-WORD frequency relation,
    * not the corpus — one corpus token scan builds it, and every subsequent
    * round is a vocabulary-scale scan (map-side-combined pair counts, a
    * 1-row TakeOrdered argmax collect, a scan-local native merge), with a
    * lazy per-round `localCheckpoint` keeping lineage flat. `nMerges`
    * bounded collects of one row each are the only driver traffic.
    *
    * Output: the learned merge table, one row per step:
    * `step`, `left`, `right`, `merged`, `pair_count`.
    */
  def bpeTrain(df: DataFrame, text: Column, nMerges: Int = 16,
      minCount: Long = 2L): DataFrame = {
    require(nMerges >= 1 && nMerges <= 4096,
      s"nMerges must be in [1,4096], got $nMerges")
    require(minCount >= 1L, s"minCount must be positive, got $minCount")
    val spark = df.sparkSession
    val words = df.select(explode(TextAnalysis.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var syms = words.select(col("cnt"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("s"))
      .localCheckpoint(eager = false)
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (step <- 1 to nMerges if !done) {
      val top = syms
        .filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) done = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += ((step, a, b, c))
        syms = syms.select(col("cnt"),
            graft.functions.MergePair.mergePair(col("s"), a, b).as("s"))
          .localCheckpoint(eager = false)
      }
    }
    import spark.implicits._
    merges.toList.toDF("step", "left", "right", "pair_count")
      .select(col("step").cast("long").as("step"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** BPE tokenizer APPLICATION — the per-document token-count profile a
    * shipped tokenizer produces, the budgeting/packing input every training
    * run needs ([[bpeTrain]] learns the merges; this applies them).
    *
    * Per word: start from the character symbol sequence and apply each merge
    * in table order with the native [[graft.functions.MergePair]] greedy
    * scan (leftmost, non-overlapping — reference BPE application). Per doc:
    * sum of per-word symbol counts.
    *
    * Scale shape (the [[bpeTrain]] idiom): merges apply over the
    * DISTINCT-WORD relation, not the corpus — one corpus token scan builds
    * `(id, word)`, the vocabulary encodes once (`nMerges` chained scan-local
    * native merges), and per-doc counts come from a word-keyed shuffle-hash
    * join back plus one aggregate. No driver traffic at all: the merge
    * table is a compile-time constant of the query (a pretrained tokenizer,
    * the production deployment shape).
    *
    * Output: one row per input row: `id`, `n_words`, `n_word_chars`
    * (pre-merge symbol count), `n_tokens` (post-merge). Wordless docs get
    * zeros.
    */
  def bpeEncodeProfile(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 4096,
      s"merges must have 1..4096 entries, got ${merges.size}")
    val toks = df.select(id.as("id"),
      explode(TextAnalysis.tokens(text)).as("w"))
    val vocabSyms = toks.select(col("w")).distinct()
      .withColumn("s", transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))))
    val encoded = merges.foldLeft(vocabSyms) { case (v, (a, b)) =>
      v.withColumn("s", graft.functions.MergePair.mergePair(col("s"), a, b))
    }.select(col("w"), length(col("w")).cast("long").as("__chars"),
      size(col("s")).cast("long").as("__toks"))
    val perDoc = toks.join(encoded.hint("shuffle_hash"), Seq("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum(col("__chars")).as("n_word_chars"),
        sum(col("__toks")).as("n_tokens"))
    df.select(id.as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_word_chars"), lit(0L)).as("n_word_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Tokenizer-fertility audit — the "does this tokenizer fit this corpus?"
    * check a pipeline runs per language before committing a vocabulary:
    * under a FIXED merge table, fertility = encoded tokens per whitespace
    * word. High fertility for a language means the tokenizer fragments it
    * (under-represented in merge training — the classic multilingual
    * vocabulary-allocation failure); chars-per-token is the compression
    * view of the same signal. One row per group (language):
    * `(group, n_docs, n_words, n_word_chars, n_tokens, fertility_micro,
    * chars_per_token_micro)` — the two ratios are each ONE rounded IEEE
    * division of exact integer sums (NULL on a zero denominator).
    *
    * Scale shape: [[bpeEncodeProfile]]'s encode contract — the merge fold
    * runs once per DISTINCT word (vocabulary-scale, never corpus-scale),
    * the corpus token stream joins the encoded vocabulary with a shuffled
    * hash join, and the rollup is ONE map-side-combined groupBy onto an
    * enum-bounded group relation. Integer sums stay in BIGINT: even a
    * 100 TB corpus (~1e14 word chars) sits 4 decimal orders under 2⁶³,
    * and ANSI mode would throw rather than wrap beyond that.
    */
  def tokenizerFertility(df: DataFrame, group: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 4096,
      s"merges must have 1..4096 entries, got ${merges.size}")
    val base = df.filter(group.isNotNull)
    val toks = base.select(group.cast("string").as("g"),
      explode(TextAnalysis.tokens(text)).as("w"))
    val vocabSyms = toks.select(col("w")).distinct()
      .withColumn("s", transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))))
    val encoded = merges.foldLeft(vocabSyms) { case (v, (a, b)) =>
      v.withColumn("s", graft.functions.MergePair.mergePair(col("s"), a, b))
    }.select(col("w"), length(col("w")).cast("long").as("__chars"),
      size(col("s")).cast("long").as("__toks"))
    def microDiv(num: Column, den: Column): Column =
      when(den === 0L, lit(null).cast("long"))
        .otherwise(round(num.cast("double") / den * 1e6).cast("long"))
    val perGroup = toks.join(encoded.hint("shuffle_hash"), Seq("w"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_words"),
        sum(col("__chars")).as("n_word_chars"),
        sum(col("__toks")).as("n_tokens"))
    val nDocs = base.select(group.cast("string").as("g"))
      .groupBy("g").agg(count(lit(1)).as("n_docs"))
    nDocs.join(broadcast(perGroup), Seq("g"), "left")
      .select(col("g").as("group"), col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_word_chars"), lit(0L)).as("n_word_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        microDiv(col("n_tokens"), coalesce(col("n_words"), lit(0L)))
          .as("fertility_micro"),
        microDiv(col("n_word_chars"), coalesce(col("n_tokens"), lit(0L)))
          .as("chars_per_token_micro"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the hybrid
    * retrieval merge: given several independently-scored candidate lists for
    * the same queries (lexical BM25, a semantic index, a freshness prior,
    * ...), fuse them into one ranking with
    * `rrf(d) = Σ_lists 1/(rrfK + rank_list(d))`. Rank-based fusion needs no
    * score calibration between lists — the reason RRF is the standard first
    * fusion in hybrid search.
    *
    * Inputs: `lists` maps a list name to a DataFrame with columns
    * `(qid, id, score)` — one candidate relation per retrieval modality,
    * scored per query `qid`. Within each list, rank is `row_number` over
    * (round-6 score desc, id asc) per qid — scores are rounded BEFORE
    * ranking ([[tfIdfTopTerms]]'s engine-portability idiom) — and only
    * `rank ≤ topN` survives into the fusion.
    *
    * Engine-stable float contract: each surviving rank contributes
    * `round(1/(rrfK + rank), 6)` cast DECIMAL(18,6); the fused score is the
    * exact decimal sum, so aggregation order cannot wiggle it.
    *
    * Output: (qid, id, n_lists, best_rank, rrf_score) — one row per
    * candidate that survived any list's top-N, `n_lists` = how many lists
    * proposed it (the agreement signal), `best_rank` = its best per-list
    * rank.
    *
    * Scale shape: the per-list rank window partitions by qid and its
    * `rank ≤ topN` filter plans a WindowGroupLimit (PlanAuditSpec-enforced
    * shape) — every map task keeps ≤ topN rows per qid BEFORE the shuffle,
    * so even a single giant query cannot buffer a corpus-scale candidate
    * list in one window task. The fusion itself is one map-side-combined
    * (qid, id) aggregate over ≤ lists·topN rows per query; no joins.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], rrfK: Int = 60,
      topN: Int = 100): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one candidate list")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("__s6").desc, col("id").asc)
    val ranked = lists.map { case (name, df) =>
      df.select(col("qid"), col("id"), round(col("score"), 6).as("__s6"))
        .filter(col("qid").isNotNull && col("id").isNotNull &&
          col("score").isNotNull)
        .withColumn("__rank", row_number().over(w))
        .filter(col("__rank") <= topN)
        .select(col("qid"), col("id"), col("__rank"))
    }.reduce(_.unionByName(_))
    ranked
      .withColumn("__c", round(lit(1.0) / (lit(rrfK) + col("__rank")), 6)
        .cast("decimal(18,6)"))
      .groupBy("qid", "id")
      .agg(count(lit(1)).as("n_lists"), min(col("__rank")).as("best_rank"),
        sum(col("__c")).cast("double").as("rrf_score"))
  }

  /** Unigram-LM tokenizer seed vocabulary (the inventory step of
    * SentencePiece's unigram algorithm, Kudo 2018 — the OTHER major subword
    * family beside [[bpeTrain]]'s BPE): every substring of length
    * 1..`maxPieceLen` of every corpus word, counted with word-frequency
    * weights; kept = ALL single characters (the segmentation-completeness
    * floor) plus the top multi-char pieces by (count desc, piece asc) up to
    * `vocabSize`, with multi-char candidates below `minCount` dropped first.
    * Scores are corpus log-probabilities over the KEPT inventory:
    * `score_micro = round(ln(cnt / total_kept) · 10⁶)` as BIGINT — the one
    * libm call, rounded once, so every downstream Viterbi comparison is
    * exact integer arithmetic.
    *
    * Output: (piece, piece_len, cnt, score_micro, is_char), the piece table
    * [[unigramViterbiProfile]] consumes.
    *
    * Scale shape: one corpus token scan builds the DISTINCT-WORD frequency
    * relation; the substring explode multiplies VOCABULARY rows (never
    * corpus rows) by ≤ |w|·maxPieceLen; the multi-char top-k is a
    * rank ≤ k window (WindowGroupLimit-eligible: map tasks keep k rows
    * before the single-partition rank); total_kept is one 1-row aggregate.
    */
  def unigramSeedVocab(df: DataFrame, text: Column, vocabSize: Int = 64,
      maxPieceLen: Int = 4, minCount: Long = 2L): DataFrame =
    unigramSeedVocabFromWords(
      df.select(explode(TextAnalysis.tokens(text)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt")),
      vocabSize, maxPieceLen, minCount)

  /** [[unigramSeedVocab]] over an already-built distinct-word frequency
    * relation `(w, cnt)` — lets [[unigramTrain]] seed from the same corpus
    * scan its EM rounds use instead of tokenizing the corpus twice.
    */
  private[extensions] def unigramSeedVocabFromWords(words: DataFrame,
      vocabSize: Int, maxPieceLen: Int, minCount: Long): DataFrame = {
    require(vocabSize >= 2 && vocabSize <= (1 << 20),
      s"vocabSize must be in [2,1048576], got $vocabSize")
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen must be in [2,16], got $maxPieceLen")
    val sub = words.select(col("cnt"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        s => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - s + 1)),
          l => col("w").substr(s, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
    val chars = sub.filter(length(col("piece")) === 1)
      .withColumn("is_char", lit(true))
    // bounded 1-row driver read (alphabet size) so the rank bound is a
    // LITERAL — a column bound would forfeit the WindowGroupLimit pushdown
    val budget = math.max(vocabSize.toLong - chars.count(), 0L)
    val multi = sub.filter(length(col("piece")) > 1 && col("cnt") >= minCount)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("piece").asc)))
      .filter(col("__rk") <= budget)
      .select(col("piece"), col("cnt"), lit(false).as("is_char"))
    val kept = chars.unionByName(multi)
    val total = broadcast(kept.agg(sum(col("cnt")).as("__tot")))
    kept.crossJoin(total)
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("cnt"),
        round(log(col("cnt").cast("double") / col("__tot")) * 1e6)
          .cast("long").as("score_micro"),
        col("is_char"))
  }

  /** The ONE combined-unit Viterbi lattice both [[unigramViterbiProfile]]
    * and [[unigramTrain]]'s EM membership test fold — a single definition
    * so their tie resolution can never desynchronize. best[0..len(word)]
    * under piece map `m` with back-pointer range `maxPieceLen`.
    *
    * Unreachable cells carry a SENTINEL (MinValue/4) instead of NULL: a
    * NULL fold zero miscompiles under whole-stage codegen (primitive long
    * state defaults to 0, silently scoring uncoverable words 0). A
    * missing-piece lookup still yields a NULL term, which greatest skips;
    * sentinel-contaminated paths (≤ MinValue/4 + 24·|maxScore|) can never
    * beat a real path (≥ 24·minScore ≫ MinValue/8), so "cell below
    * MinValue/8" is exactly NULL-propagation's unreachable.
    */
  private def viterbiCells(word: Column, m: Column, maxPieceLen: Column)
      : Column = aggregate(
    sequence(lit(1), length(word)),
    array(lit(0L)),
    (acc, i) => concat(acc, array(
      aggregate(
        sequence(greatest(lit(0), i - maxPieceLen), i - 1),
        lit(Long.MinValue / 4),
        (mx, j) => greatest(mx,
          element_at(acc, j + 1) +
            element_at(m, word.substr(j + 1, i - j)) * 1024L - 1L)))))

  /** Unigram-LM Viterbi segmentation profile — applies a
    * [[unigramSeedVocab]]-style piece table to the corpus and reports, per
    * document, the token budget the tokenizer would produce: word count,
    * total piece count, and the total segmentation log-probability.
    *
    * Per word the DP maximizes the summed piece `score_micro` over all
    * segmentations, breaking score ties toward FEWER pieces, via one exact
    * integer lattice: each DP cell holds `score·1024 − n_pieces` (|n| < 1024
    * by the `maxWordLen` cap, so the lexicographic (score, −n) order is the
    * integer order). Equal-(score,n) segmentations are indistinguishable in
    * the output, so the profile is tie-independent — the reason the DP
    * reports (score, n) and never the piece sequence. The whole lattice is
    * a nested fold (`aggregate` over word positions, inner `aggregate` over
    * the ≤ maxPieceLen back-pointers): scan-local, codegen-free but exact
    * integer arithmetic an independent engine replays cell for cell.
    *
    * Contract edges: words longer than `maxWordLen` are NOT segmented —
    * they surface per-doc in `n_long_words` (never silently dropped); a
    * word the piece table cannot cover (only possible when some character
    * is missing from it) surfaces in `n_unsegmentable`.
    *
    * Scale shape ([[bpeEncodeProfile]]'s idiom): the DP runs once per
    * DISTINCT word, never per occurrence; the piece table folds into ONE
    * broadcast map row (vocab-bounded by contract); per-doc totals come
    * from a word-keyed shuffle_hash join back plus one aggregate.
    */
  def unigramViterbiProfile(df: DataFrame, id: Column, text: Column,
      pieces: DataFrame, maxWordLen: Int = 24): DataFrame = {
    require(maxWordLen >= 1 && maxWordLen <= 512,
      s"maxWordLen must be in [1,512], got $maxWordLen")
    val lenRow = pieces.agg(max(length(col("piece")))).first()
    require(!lenRow.isNullAt(0), "pieces must be non-empty")
    val L = lit(lenRow.getInt(0))
    val mp = broadcast(pieces.agg(map_from_entries(sort_array(
      collect_list(struct(col("piece"), col("score_micro"))))).as("__m")))
    val toks = df.select(id.as("id"),
      explode(TextAnalysis.tokens(text)).as("w"))
    val dp = toks.select("w").distinct()
      .filter(length(col("w")) <= maxWordLen)
      .crossJoin(mp)
      .withColumn("__bests", viterbiCells(col("w"), col("__m"), L))
      .select(col("w"),
        element_at(col("__bests"), length(col("w")) + 1).as("__raw"))
      .select(col("w"), when(col("__raw") < lit(Long.MinValue / 8),
        lit(null).cast("long")).otherwise(col("__raw")).as("__comb"))
      .select(col("w"),
        // comb = S·1024 − n with S ≤ 0, 1 ≤ n < 1024; exact integer decode
        (-((-col("__comb") - pmod(-col("__comb"), lit(1024L))) /
          lit(1024L)).cast("long")).as("__w_score"),
        pmod(-col("__comb"), lit(1024L)).as("__w_pieces"))
    val perDoc = toks
      .join(dp.hint("shuffle_hash"), Seq("w"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_words"),
        sum(when(length(col("w")) > maxWordLen, 1L).otherwise(0L))
          .as("n_long_words"),
        sum(when(length(col("w")) <= maxWordLen &&
          col("__w_pieces").isNull, 1L).otherwise(0L)).as("n_unsegmentable"),
        sum(col("__w_pieces")).as("n_pieces"),
        sum(col("__w_score")).as("score_micro"))
    df.select(id.as("id")).join(perDoc.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_long_words"), lit(0L)).as("n_long_words"),
        coalesce(col("n_unsegmentable"), lit(0L)).as("n_unsegmentable"),
        col("n_pieces"), col("score_micro"))
  }

  /** Unigram-LM tokenizer EM training (the iterate-and-prune step of
    * SentencePiece's unigram algorithm): starting from
    * [[unigramSeedVocab]], each round re-estimates every piece's usage
    * under the current scores and re-scores the surviving inventory.
    *
    * The E-step counts ALL-OPTIMAL-PATHS usage: piece occurrence (j, j+l)
    * of word w is used iff `fwd[j] + (score·1024 − 1) + bwd[j+l] =
    * fwd[|w|]` — the exact-integer membership test over the forward and
    * backward Viterbi lattices ([[unigramViterbiProfile]]'s combined
    * encoding, so score ties toward fewer pieces are resolved identically).
    * Counting every occurrence on ANY optimal path makes the round a pure
    * deterministic function of (corpus, pieces) — no argmax tie-break to
    * replicate across engines. Words the current vocabulary cannot cover
    * contribute nothing (their lattice never reaches the end).
    *
    * The M-step keeps every single character (usage floor 1 — the
    * completeness guarantee), drops multi-char pieces with zero usage
    * (the prune), and re-scores `round(ln(usage/total_kept)·10⁶)`.
    *
    * Output: the full per-round audit — `(round, piece, piece_len, cnt,
    * score_micro, is_char)` for round 0 (the seed, cnt = substring count)
    * through `rounds` (cnt = usage). EXACTLY `rounds` rounds run (kCore's
    * bounded-rounds contract): the result is a pure function of the
    * inputs an independent engine replays round for round.
    *
    * Scale shape: per round, ONE pass over the distinct-word relation
    * computes both lattices in the same projection (no fwd↔bwd join), the
    * candidate grid explodes vocabulary rows by ≤ |w|·maxPieceLen, usage is
    * a map-side-combined piece aggregate, and the new piece table (vocab-
    * bounded) is checkpointed before fanning into the next round's three
    * consumers (map, reversed map, char floor).
    */
  def unigramTrain(df: DataFrame, text: Column, vocabSize: Int = 64,
      maxPieceLen: Int = 4, minCount: Long = 2L, rounds: Int = 2,
      maxWordLen: Int = 24): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16], got $rounds")
    val wordsAll = df.select(explode(TextAnalysis.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .localCheckpoint(eager = false)
    val words = wordsAll.filter(length(col("w")) <= maxWordLen)
    val L = lit(maxPieceLen)
    // seed from the SAME word-frequency relation the EM rounds use (the
    // seed wants it uncapped, hence `wordsAll`) — never a second corpus
    // tokenization
    var pieces = unigramSeedVocabFromWords(
        wordsAll.withColumnRenamed("wcnt", "cnt"), vocabSize, maxPieceLen,
        minCount)
      .withColumn("round", lit(0L))
      .localCheckpoint(eager = false)
    val out = scala.collection.mutable.ListBuffer[DataFrame](pieces)
    for (r <- 1 to rounds) {
      val mp = broadcast(pieces.agg(
        map_from_entries(sort_array(collect_list(
          struct(col("piece"), col("score_micro"))))).as("__m"),
        map_from_entries(sort_array(collect_list(
          struct(reverse(col("piece")), col("score_micro"))))).as("__rm")))
      val lat = words.crossJoin(mp)
        .withColumn("__f", viterbiCells(col("w"), col("__m"), L))
        .withColumn("__b", viterbiCells(reverse(col("w")), col("__rm"), L))
        .filter(element_at(col("__f"), length(col("w")) + 1) >
          lit(Long.MinValue / 8))
      val usage = lat
        .select(col("w"), col("wcnt"), col("__f"), col("__b"), col("__m"),
          explode(flatten(transform(sequence(lit(0), length(col("w")) - 1),
            j => transform(
              sequence(lit(1), least(L, length(col("w")) - j)),
              l => struct(j.as("j"), l.as("l")))))).as("__jl"))
        .withColumn("__piece",
          col("w").substr(col("__jl.j") + 1, col("__jl.l")))
        .withColumn("__sc", element_at(col("__m"), col("__piece")))
        .filter(col("__sc").isNotNull &&
          element_at(col("__f"), col("__jl.j") + 1) +
            (col("__sc") * 1024L - 1L) +
            element_at(col("__b"),
              length(col("w")) - (col("__jl.j") + col("__jl.l")) + 1) ===
          element_at(col("__f"), length(col("w")) + 1))
        .groupBy(col("__piece").as("piece"))
        .agg(sum(col("wcnt")).as("use"))
      val chars = pieces.filter(col("is_char"))
        .select(col("piece"), col("is_char"))
      val kept = chars.join(usage, Seq("piece"), "left")
        .select(col("piece"), greatest(coalesce(col("use"), lit(0L)), lit(1L))
          .as("cnt"), col("is_char"))
        .unionByName(usage
          .join(pieces.filter(!col("is_char")).select("piece"), Seq("piece"))
          .select(col("piece"), col("use").as("cnt"), lit(false).as("is_char")))
      val total = broadcast(kept.agg(sum(col("cnt")).as("__tot")))
      pieces = kept.crossJoin(total)
        .select(col("piece"),
          length(col("piece")).cast("long").as("piece_len"), col("cnt"),
          round(log(col("cnt").cast("double") / col("__tot")) * 1e6)
            .cast("long").as("score_micro"),
          col("is_char"))
        .withColumn("round", lit(r.toLong))
        .localCheckpoint(eager = false)
      out += pieces
    }
    out.reduce(_.unionByName(_))
      .select(col("round"), col("piece"), col("piece_len"), col("cnt"),
        col("score_micro"), col("is_char"))
  }

  /** Self-BLEU diversity audit over a BOUNDED document sample (Zhu et al.
    * 2018 — the standard synthetic-data mode-collapse check: score each
    * sampled document as a BLEU hypothesis against ALL other sampled
    * documents as references; a high score means the document re-treads
    * n-grams the rest of the sample already covers).
    *
    * Per document, BLEU-2's exact integer components: multi-reference
    * clipped unigram/bigram counts (`p1_num/p1_den`, `p2_num/p2_den`, where
    * each hypothesis n-gram count is clipped at the MAX count of that gram
    * in any other sampled document), the hypothesis length `c_len`, and the
    * closest reference length `r_len` (ties break to the SHORTER reference,
    * the NIST convention). `geo2_micro` is the micro-scaled geometric mean
    * `√(p1·p2)` — one integer product, one IEEE division, one IEEE sqrt, so
    * it reproduces across engines; the exp-based brevity penalty is left to
    * the consumer from (c_len, r_len) so no non-correctly-rounded libm call
    * enters the hashed columns. `diverse` is an EXACT integer verdict:
    * geo2 < threshold‰ decided by cross-multiplication
    * (`p1_num·p2_num·10⁶ < p1_den·p2_den·threshold²`), never the float.
    * Documents with no bigram (`< 2` tokens) or no unigram are diverse by
    * convention (no evidence of reuse).
    *
    * The multi-reference clip needs, per (doc, gram), the max count among
    * the OTHER documents — computed WITHOUT a pairwise join from three
    * per-gram statistics (top count, how many docs attain it, runner-up):
    * `max_other = top1 if (own < top1 or n_top > 1) else top2`.
    *
    * Scale shape: the caller passes an already-bounded sample (same
    * contract as [[Similarity.tripletMarginMine]]'s anchors); grams, the
    * per-gram stats, and the length table are all sample-bounded, the stats
    * and lengths broadcast, and the only non-broadcast shuffles are
    * sample-bounded groupBys. Output drops nothing: one row per sampled
    * document that has at least one OTHER document to reference.
    */
  def selfBleu(sample: DataFrame, id: Column, text: Column,
      diverseThresholdPermille: Int = 300): DataFrame = {
    require(diverseThresholdPermille >= 0 && diverseThresholdPermille <= 1000,
      s"threshold must be a permille in [0,1000], got $diverseThresholdPermille")
    val toks = sample.select(id.as("doc_id"),
        TextAnalysis.tokens(text).as("toks"))
      .withColumn("c_len", size(col("toks")).cast("long"))
    val uni = toks.select(col("doc_id"), explode(col("toks")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val bi = toks
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    // per-doc clipped numerator/denominator from the 3-stat per-gram trick
    def clipStats(gc: DataFrame): DataFrame = {
      val st2 = gc.join(
          broadcast(gc.groupBy("g").agg(max(col("c")).as("top1"))), Seq("g"))
        .groupBy("g", "top1")
        .agg(sum(when(col("c") === col("top1"), 1L).otherwise(0L)).as("n_top"),
          max(when(col("c") < col("top1"), col("c"))).as("top2"))
      gc.join(broadcast(st2), Seq("g"))
        .withColumn("__maxref",
          when(col("c") < col("top1") || col("n_top") > 1L, col("top1"))
            .otherwise(coalesce(col("top2"), lit(0L))))
        .groupBy("doc_id")
        .agg(sum(least(col("c"), col("__maxref"))).as("num"),
          sum(col("c")).as("den"))
    }
    val p1 = clipStats(uni).withColumnRenamed("num", "p1_num")
      .withColumnRenamed("den", "p1_den")
    val p2 = clipStats(bi).withColumnRenamed("num", "p2_num")
      .withColumnRenamed("den", "p2_den")
    // closest OTHER length; tie -> shorter reference
    val lens = toks.select(col("doc_id").as("__rid"), col("c_len").as("__rl"))
    val rLen = toks.select(col("doc_id"), col("c_len"))
      .join(broadcast(lens), col("doc_id") =!= col("__rid"))
      .groupBy("doc_id")
      .agg(min(struct(abs(col("__rl") - col("c_len")).as("d"),
        col("__rl").as("r"))).as("m"))
      .select(col("doc_id"), col("m.r").as("r_len"))
    val t = lit(diverseThresholdPermille.toLong)
    // every side is sample-bounded by the caller contract -> broadcast
    toks.select("doc_id", "c_len").join(broadcast(rLen), Seq("doc_id"))
      .join(broadcast(p1), Seq("doc_id"), "left")
      .join(broadcast(p2), Seq("doc_id"), "left")
      .select(col("doc_id"), col("c_len"), col("r_len"),
        coalesce(col("p1_num"), lit(0L)).as("p1_num"),
        coalesce(col("p1_den"), lit(0L)).as("p1_den"),
        coalesce(col("p2_num"), lit(0L)).as("p2_num"),
        coalesce(col("p2_den"), lit(0L)).as("p2_den"))
      // overflow discipline: the n-gram counts are document-length-scale
      // (unbounded), so the products go through double (exact below 2⁵³ —
      // any real document) for geo2 and DECIMAL(38,0) for the verdict;
      // a BIGINT product would overflow on a multi-million-token doc.
      .withColumn("geo2_micro",
        when(col("p1_den") === 0L || col("p2_den") === 0L, lit(0L))
          .otherwise(round(sqrt(col("p1_num").cast("double") * col("p2_num") /
            (col("p1_den").cast("double") * col("p2_den"))) * 1e6)
            .cast("long")))
      .withColumn("len_penalized", col("c_len") < col("r_len"))
      .withColumn("diverse",
        when(col("p1_den") === 0L || col("p2_den") === 0L, lit(true))
          .otherwise(
            col("p1_num").cast("decimal(19,0)") * col("p2_num") *
              lit(1000000L) <
            col("p1_den").cast("decimal(19,0)") * col("p2_den") * t * t))
  }
}
