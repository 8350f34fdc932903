package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming Naive Bayes classification — score every arriving document
  * against a FIXED pretrained [[graft.extensions.Classify.nbTrain]] model
  * (the production routing/lang-ID shape: the model trains offline in
  * batch, the stream only scores).
  *
  * The whole scorer is STATELESS and scan-local: the model folds into one
  * static row of lookup maps (labels, priors, per-label unseen, and
  * label⊕term scores), that row joins the stream on a constant key (the
  * stream↔static equi-join Structured Streaming supports everywhere —
  * broadcast, no state store), and each event's per-label scores fold over
  * its own token array. Per event the arithmetic is EXACTLY
  * [[graft.extensions.Classify.nbClassify]]'s sparse-model identity — the
  * spec pins stream ≡ batch on the same rows, not an approximation bound.
  *
  * Output schema matches the batch scorer: `(id, n_tokens, pred_label,
  * score_micro, runner_up, margin_micro)`, argmax ties to the smallest
  * label, single-label model → NULL runner/margin.
  *
  * Scale shape: model maps are vocab×labels-bounded by the nbTrain
  * contract; per-event cost is |tokens|·|labels| map probes; no shuffle, no
  * watermark, no state — the monitor composes freely under any downstream
  * windowed aggregation.
  */
object StreamingClassify {

  /** Fold an nbTrain model relation into the one-row lookup shape. The
    * terms map is keyed by a (label, term) STRUCT, never a delimited string
    * concat: labels and raw whitespace-split tokens are caller data and can
    * contain any delimiter, and a collision would either throw
    * DUPLICATE_MAP_KEY at fold time or silently score the wrong pair,
    * breaking the strict stream == batch contract. */
  private[streaming] def modelRow(model: DataFrame): DataFrame =
    model.groupBy().agg(
      sort_array(collect_list(when(col("kind") === "prior", col("label"))))
        .as("__labels"),
      map_from_entries(sort_array(collect_list(when(col("kind") === "prior",
        struct(col("label"), col("logprob_micro")))))).as("__priors"),
      map_from_entries(sort_array(collect_list(when(col("kind") === "unseen",
        struct(col("label"), col("logprob_micro")))))).as("__unseens"),
      map_from_entries(sort_array(collect_list(when(col("kind") === "term",
        struct(struct(col("label").as("l"), col("term").as("t")).as("k"),
          col("logprob_micro")))))).as("__terms"))
      .withColumn("__k", lit(1))

  def classifyStream(events: DataFrame, id: Column, text: Column,
      model: DataFrame): DataFrame = {
    val base = events.select(id.as("id"),
        graft.extensions.TextAnalysis.tokens(text).as("__toks"))
      .withColumn("__k", lit(1))
    base.join(broadcast(modelRow(model)), Seq("__k"))
      .withColumn("__r", sort_array(transform(col("__labels"), l => struct(
        (-(element_at(col("__priors"), l) +
          aggregate(col("__toks"), lit(0L), (acc, t) =>
            acc + coalesce(
              element_at(col("__terms"), struct(l.as("l"), t.as("t"))),
              element_at(col("__unseens"), l))))).as("ns"),
        l.as("label")))))
      .select(col("id"), size(col("__toks")).cast("long").as("n_tokens"),
        get(col("__r"), lit(0)).getField("label").as("pred_label"),
        (-get(col("__r"), lit(0)).getField("ns")).as("score_micro"),
        get(col("__r"), lit(1)).getField("label").as("runner_up"),
        (get(col("__r"), lit(1)).getField("ns") -
          get(col("__r"), lit(0)).getField("ns")).as("margin_micro"))
  }
}
