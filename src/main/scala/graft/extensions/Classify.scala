package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine text classification — multinomial Naive Bayes with Laplace
  * smoothing, the classic corpus-scale text classifier (lang-ID, source
  * routing, quality gating) whose TRAINING is pure counting and whose
  * SCORING is a sum of precomputed log-probabilities: both reproduce
  * exactly in any engine once each log-prob is rounded to integer micro
  * units, the discipline every graft scoring operator follows.
  *
  * The model is data (one DataFrame), not an opaque artifact: `prior` rows
  * (per label), `term` rows (per label×seen-term), and one `unseen` row per
  * label carrying the zero-count smoothed score — everything a scorer needs
  * to handle out-of-vocabulary and label-missing terms without any float
  * recomputation.
  */
object Classify {

  /** Train multinomial NB: P(t|c) = (cnt_c(t) + 1) / (tot_c + V) with V the
    * corpus-wide distinct-term count, P(c) = docs_c / docs. Output one model
    * relation: `(kind, label, term, cnt, logprob_micro)` where kind is
    * 'prior' (term NULL, cnt = docs_c), 'term' (cnt = cnt_c(t) ≥ 1), or
    * 'unseen' (term NULL, cnt = 0 — the smoothed score of any term the
    * label never saw, in- or out-of-vocabulary alike).
    *
    * Engine-stable float contract: each row's score is ONE ln call rounded
    * once to micro; scoring then never touches libm.
    *
    * Scale shape: one corpus token scan → map-side-combined (label, term)
    * counts; labels are enum-bounded so priors/totals broadcast; the only
    * driver reads are two bounded 1-row counts (total docs, vocab size).
    * NULL-label rows are excluded from training.
    */
  def nbTrain(df: DataFrame, label: Column, text: Column): DataFrame = {
    val base = df.select(label.as("label"), TextAnalysis.tokens(text).as("toks"))
      .filter(col("label").isNotNull)
    val tc = base.select(col("label"), explode(col("toks")).as("term"))
      .groupBy("label", "term").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val nDocs = base.count()
    require(nDocs > 0, "nbTrain needs at least one labeled document")
    val vocabV = tc.select("term").distinct().count()
    val totals = broadcast(tc.groupBy("label").agg(sum(col("cnt")).as("__tot")))
    def lnMicro(num: Column, den: Column): Column =
      round(log(num.cast("double") / den) * 1e6).cast("long")
    val priors = base.groupBy("label").agg(count(lit(1)).as("cnt"))
      .select(lit("prior").as("kind"), col("label"),
        lit(null).cast("string").as("term"), col("cnt"),
        lnMicro(col("cnt"), lit(nDocs)).as("logprob_micro"))
    val terms = tc.join(totals, Seq("label"))
      .select(lit("term").as("kind"), col("label"), col("term"), col("cnt"),
        lnMicro(col("cnt") + 1L, col("__tot") + lit(vocabV))
          .as("logprob_micro"))
    val unseen = totals
      .select(lit("unseen").as("kind"), col("label"),
        lit(null).cast("string").as("term"), lit(0L).as("cnt"),
        lnMicro(lit(1L), col("__tot") + lit(vocabV)).as("logprob_micro"))
    priors.unionByName(terms).unionByName(unseen)
  }

  /** Score every document against an [[nbTrain]] model and pick the argmax
    * label. Per (doc, label):
    *
    * {{{
    *   score = prior_c + Σ_matched logprob_c(t) + (n_tokens − n_matched)·unseen_c
    * }}}
    *
    * — the sparse-model identity: any token without a stored (label, term)
    * row (out-of-vocabulary OR merely unseen under that label) contributes
    * the label's smoothed zero-count score. Exact integer arithmetic
    * throughout; argmax ties break to the lexicographically smallest label.
    *
    * Output: `(id, n_tokens, pred_label, score_micro, runner_up,
    * margin_micro)` — margin is the confidence signal a routing/QC gate
    * thresholds on; token-less documents are scored on priors alone.
    *
    * Scale shape: the model is vocab×labels-bounded and broadcasts; the
    * corpus is scanned once for lengths and once for the term join; the
    * per-(id,label) partial is a map-side-combined aggregate over
    * term-sparse rows; the final argmax sorts |labels| (enum-bounded)
    * entries per doc inside one aggregate — no window, no second shuffle.
    */
  def nbClassify(df: DataFrame, id: Column, text: Column,
      model: DataFrame): DataFrame = {
    val priors = model.filter(col("kind") === "prior")
      .select(col("label"), col("logprob_micro").as("__prior"))
    val unseen = model.filter(col("kind") === "unseen")
      .select(col("label"), col("logprob_micro").as("__unseen"))
    val terms = model.filter(col("kind") === "term")
      .select(col("label"), col("term"), col("logprob_micro"))
    val lens = df.select(id.as("id"),
      size(TextAnalysis.tokens(text)).cast("long").as("n_tokens"))
    val matched = df.select(id.as("id"),
        explode(TextAnalysis.tokens(text)).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy("id", "label")
      .agg(sum(col("logprob_micro")).as("__s_match"),
        count(lit(1)).as("__n_match"))
    lens.crossJoin(broadcast(priors.join(unseen, Seq("label"))))
      .join(matched.hint("shuffle_hash"), Seq("id", "label"), "left")
      .withColumn("__score", col("__prior") +
        coalesce(col("__s_match"), lit(0L)) +
        (col("n_tokens") - coalesce(col("__n_match"), lit(0L))) *
          col("__unseen"))
      .groupBy("id", "n_tokens")
      .agg(sort_array(collect_list(struct((-col("__score")).as("ns"),
        col("label"), col("__score").as("s")))).as("__r"))
      .select(col("id"), col("n_tokens"),
        // get(), not getItem(): a single-label model has no runner-up and
        // ANSI mode makes an out-of-bounds getItem throw instead of NULL
        get(col("__r"), lit(0)).getField("label").as("pred_label"),
        get(col("__r"), lit(0)).getField("s").as("score_micro"),
        get(col("__r"), lit(1)).getField("label").as("runner_up"),
        (get(col("__r"), lit(0)).getField("s") -
          get(col("__r"), lit(1)).getField("s")).as("margin_micro"))
  }

  /** Multi-class classifier evaluation — one row per class that appears as
    * a truth OR a prediction: support, true/false positives, false
    * negatives, and precision/recall/F1 in micro units, plus the
    * corpus-level accuracy and macro-F1 repeated on every row (the flat
    * single-relation shape every graft profile emits).
    *
    * Exact arithmetic: counts are integers; each ratio is ONE IEEE division
    * rounded once to micro; F1 is computed from the INTEGER counts
    * (`2·tp·10⁶ / (2·tp + fp + fn)`), never from the rounded P/R micros —
    * so no compounding. A class with no predictions has NULL precision; a
    * class with no truths has NULL recall; F1 is 0 when tp = 0 but the
    * class occurs (the standard zero-division convention), NULL only if
    * the denominator is 0 (impossible for an occurring class). Rows with a
    * NULL truth label are excluded and counted in `n_unlabeled`.
    *
    * Scale shape: ONE map-side-combined (truth, pred) aggregate builds the
    * |classes|²-bounded confusion relation; everything after is arithmetic
    * over enum-bounded rows plus one broadcast of the 1-row corpus stats.
    */
  def classifierEval(df: DataFrame, truth: Column, pred: Column): DataFrame = {
    val conf = df.select(truth.as("t"), pred.as("p"))
      .withColumn("__labeled", col("t").isNotNull)
      .groupBy("t", "p", "__labeled").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val labeled = conf.filter(col("__labeled"))
    val classes = labeled.select(col("t").as("label"))
      .unionByName(labeled.select(col("p").as("label")))
      .filter(col("label").isNotNull).distinct()
    val byTruth = labeled.groupBy(col("t").as("label"))
      .agg(sum(col("n")).as("support"),
        sum(when(col("t") === col("p"), col("n")).otherwise(0L)).as("tp"))
    val byPred = labeled.filter(col("p").isNotNull)
      .groupBy(col("p").as("label")).agg(sum(col("n")).as("n_pred"))
    def microDiv(num: Column, den: Column): Column =
      when(den === 0L, lit(null).cast("long"))
        .otherwise(round(num.cast("double") / den * 1e6).cast("long"))
    val perClass = classes
      .join(broadcast(byTruth), Seq("label"), "left")
      .join(broadcast(byPred), Seq("label"), "left")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"))
      .withColumn("precision_micro",
        microDiv(col("tp"), col("tp") + col("fp")))
      .withColumn("recall_micro", microDiv(col("tp"), col("tp") + col("fn")))
      .withColumn("f1_micro",
        microDiv(col("tp") * 2L, col("tp") * 2L + col("fp") + col("fn")))
    val global = broadcast(conf.agg(
        sum(when(col("__labeled"), col("n")).otherwise(0L)).as("__n"),
        sum(when(!col("__labeled"), col("n")).otherwise(0L))
          .as("n_unlabeled"),
        sum(when(col("__labeled") && col("t") === col("p"), col("n"))
          .otherwise(0L)).as("__correct"))
      .withColumn("accuracy_micro", microDiv(col("__correct"), col("__n")))
      .select(col("n_unlabeled"), col("accuracy_micro")))
    val macroF1 = broadcast(perClass.agg(
      round(avg(coalesce(col("f1_micro"), lit(0L)))).cast("long")
        .as("macro_f1_micro")))
    perClass.crossJoin(global).crossJoin(macroF1)
  }

  /** Margin-reliability profile — the calibration check a pipeline runs
    * before using a classifier's confidence margin as a routing / filter
    * threshold ("only auto-accept predictions with margin ≥ T"): bucket
    * predictions into fixed-width INTEGER margin bands and report, per
    * band, how often the prediction was actually right, plus the
    * cumulative keep-everything-above-this-band accuracy — the exact curve
    * a threshold is read off. Bands, not raw probabilities: [[nbClassify]]
    * margins are integer micro log-units, so banding by an integer width
    * keeps every bucket boundary exact across engines (the x101 lesson) —
    * no softmax/exp whose last-ulp could flip a bin.
    *
    * Per band (bounded enum: max margin / bandMicro rows):
    * `n`, `n_correct`, `accuracy_micro` (ONE rounded IEEE division),
    * `mean_margin_micro` (decimal-exact sum, ONE rounded division), and
    * the cumulative `cum_n` / `cum_correct` / `cum_accuracy_micro` folding
    * from the HIGHEST band down. Rows with NULL truth, prediction, or
    * margin are excluded (a single-label model has no margin to
    * calibrate; unlabeled rows have no ground truth).
    *
    * Scale shape: one map-side-combined groupBy over the corpus; the
    * cumulative window runs over the enum-bounded band relation only
    * (single-partition by construction and by bound — never corpus rows).
    * The margin sum is decimal(38,0): corpus-scale sums of micro margins
    * overflow BIGINT exactly when the data grows (the x117 lesson).
    */
  def marginReliability(df: DataFrame, truth: Column, pred: Column,
      margin: Column, bandMicro: Long): DataFrame = {
    require(bandMicro >= 1L, s"bandMicro must be >= 1, got $bandMicro")
    import org.apache.spark.sql.expressions.Window
    def microDiv(num: Column, den: Column): Column =
      when(den === 0L, lit(null).cast("long"))
        .otherwise(round(num.cast("double") / den * 1e6).cast("long"))
    val base = df
      .select(truth.as("t"), pred.as("p"), margin.cast("long").as("m"))
      .filter(col("t").isNotNull && col("p").isNotNull && col("m").isNotNull)
      .withColumn("band", floor(col("m").cast("double") / bandMicro)
        .cast("long"))
    val bands = base.groupBy("band").agg(
      count(lit(1)).as("n"),
      sum(when(col("t") === col("p"), 1L).otherwise(0L)).as("n_correct"),
      sum(col("m").cast("decimal(38,0)")).as("__sum_m"))
    val w = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bands
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_correct", sum(col("n_correct")).over(w))
      .select(col("band"),
        (col("band") * bandMicro).as("lo_micro"),
        col("n"), col("n_correct"),
        microDiv(col("n_correct"), col("n")).as("accuracy_micro"),
        round(col("__sum_m").cast("double") / col("n")).cast("long")
          .as("mean_margin_micro"),
        col("cum_n"), col("cum_correct"),
        microDiv(col("cum_correct"), col("cum_n")).as("cum_accuracy_micro"))
  }
}
