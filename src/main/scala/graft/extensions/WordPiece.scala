package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer family — the third trainer/encoder pair beside BPE
  * ([[LanguageModel.bpeTrain]]) and the unigram LM
  * ([[LanguageModel.unigramTrain]]), completing the three standard subword
  * vocabularies a training-data pipeline budgets with (reference scope:
  * token counting for cost estimates, `worker.py:122-161`; the tokenizer
  * trio generalizes that to the vocabularies production tokenizers ship).
  *
  * WordPiece differs from BPE on BOTH sides:
  *  - TRAINING picks the adjacent pair maximizing the likelihood score
  *    `count(ab) / (count(a) * count(b))` (Schuster & Nakajima 2012; the
  *    BERT vocabulary recipe) instead of raw pair count — rare-but-cohesive
  *    pairs win over merely frequent ones.
  *  - ENCODING ignores merge order entirely: it greedy longest-prefix
  *    matches each word against the FINAL vocabulary, with `##`-prefixed
  *    continuation pieces and whole-word UNK on any unmatched position
  *    (the BERT runtime algorithm).
  *
  * Internal symbol space: the word-initial symbol carries a `\u0001` marker
  * prefix (so "t" at word start and "t" mid-word are distinct symbols and
  * merges stay plain string concatenations the native
  * [[graft.functions.MergePair]] scan can apply); the exported/display form
  * maps marker-prefixed symbols to bare pieces and unmarked symbols to
  * `##`-prefixed continuations. Two display-space caveats, both outside
  * the natural-text contract: corpora containing `\u0001` in tokens would
  * alias word-initial symbols, and a corpus WORD literally starting with
  * `#` can make a word-initial display piece collide with the continuation
  * prefix (a bare piece displaying as `##x` is ambiguous with continuation
  * `x` — [[wordpieceEncodeProfile]]'s own vocab validation rejects such
  * pieces). [[wordpieceTrain]] GUARDS that collision (round-14 advisory):
  * a winning merge whose word-initial display form would land in the `##`
  * continuation space fails loudly instead of emitting a silently
  * ambiguous merge row — zero-cost for whitespace-tokenized natural text,
  * where no word starts with `#`.
  *
  * Scale shape (the [[LanguageModel.bpeTrain]] idiom): both operators run
  * over the DISTINCT-WORD frequency relation, never the corpus — one corpus
  * token scan builds it; each training round is two vocabulary-scale
  * aggregates (pair counts + symbol counts, map-side combined), two
  * broadcast joins of the vocabulary-scale count relation, and ONE 1-row
  * argmax collect; encoding folds the greedy matcher once per distinct word
  * and joins per-doc counts back with a word-keyed shuffle-hash join.
  */
object WordPiece {

  private val Marker = "\u0001"

  /** Internal symbol → display piece: marker-prefixed (word-initial) drops
    * the marker; continuation symbols gain the `##` prefix.
    */
  private def displayOf(sym: String): String =
    if (sym.startsWith(Marker)) sym.substring(1) else "##" + sym

  /** WordPiece vocabulary TRAINING — one merge per round, scored by
    * `pair_count / (left_count * right_count)` over the CURRENT symbol
    * sequences (counts weighted by word frequency). Deterministic argmax:
    * score desc, then pair count desc, then display-form left/right — the
    * display-space tie-break keeps step 1 replayable by an independent SQL
    * engine (the x165 oracle contract).
    *
    * `minCount` FILTERS the candidate pairs before the argmax (the
    * frequency threshold of real WordPiece trainers) — it is NOT a stop
    * test on the winner: score ranks rare-but-cohesive pairs first, so the
    * top-scoring pair can sit below `minCount` while valid candidates
    * remain. Training stops when no pair survives the filter. Output, one
    * row per merge
    * step: `step`, `left`, `right`, `merged` (all display form),
    * `pair_count`, `left_count`, `right_count`, `score` (the raw IEEE
    * double `cp / (ca·cb)` — one division over exact integer counts).
    */
  def wordpieceTrain(df: DataFrame, text: Column, nMerges: Int = 10,
      minCount: Long = 2L): DataFrame = {
    require(nMerges >= 1 && nMerges <= 4096,
      s"nMerges must be in [1,4096], got $nMerges")
    require(minCount >= 1L, s"minCount must be positive, got $minCount")
    val spark = df.sparkSession
    val words = df.select(explode(TextAnalysis.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var syms = words.select(col("cnt"),
        transform(sequence(lit(1), length(col("w"))), i =>
          when(i === 1, concat(lit(Marker), col("w").substr(i, lit(1))))
            .otherwise(col("w").substr(i, lit(1)))).as("s"))
      .localCheckpoint(eager = false)
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long, Long, Long, Double)]
    var done = false
    for (step <- 1 to nMerges if !done) {
      val symCounts = syms.select(col("cnt"), explode(col("s")).as("sym"))
        .groupBy("sym").agg(sum(col("cnt")).as("sc"))
      val disp = (sym: Column) =>
        when(sym.startsWith(Marker), sym.substr(lit(2), length(sym)))
          .otherwise(concat(lit("##"), sym))
      val top = syms
        .filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("cp"))
        .filter(col("cp") >= minCount)
        .join(broadcast(symCounts.select(col("sym").as("a"),
          col("sc").as("ca"))), Seq("a"))
        .join(broadcast(symCounts.select(col("sym").as("b"),
          col("sc").as("cb"))), Seq("b"))
        // one IEEE division over exact integer counts; ca·cb is computed in
        // double (BIGINT product would overflow at ~1e14-symbol corpora)
        .withColumn("score", col("cp").cast("double") /
          (col("ca").cast("double") * col("cb").cast("double")))
        .orderBy(col("score").desc, col("cp").desc, disp(col("a")),
          disp(col("b")))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
        // Display-collision guard (round-14 advisory): a word-initial merged
        // symbol whose CONTENT starts with "##" (only possible when a corpus
        // word starts with "##") would display as "##x" — byte-identical to
        // the continuation piece x. Initial symbols are single chars and `a`
        // is a prefix of every later merged form, so checking each round's
        // winner covers all emitted rows. Fail loudly rather than emit an
        // ambiguous merge table.
        require(!(a + b).startsWith(Marker + "##"),
          s"wordpieceTrain: winning merge displays as '${displayOf(a + b)}' " +
            "— a word-initial piece rendered into the '##' continuation " +
            "space (the corpus has words starting with '#'); display rows " +
            "would be ambiguous. Pre-filter such words before training.")
        merges += ((step, a, b, r.getAs[Long]("cp"), r.getAs[Long]("ca"),
          r.getAs[Long]("cb"), r.getAs[Double]("score")))
        syms = syms.select(col("cnt"),
            graft.functions.MergePair.mergePair(col("s"), a, b).as("s"))
          .localCheckpoint(eager = false)
      }
    }
    import spark.implicits._
    merges.toList.map { case (step, a, b, cp, ca, cb, score) =>
      (step.toLong, displayOf(a), displayOf(b), displayOf(a + b), cp, ca, cb,
        score)
    }.toDF("step", "left", "right", "merged", "pair_count", "left_count",
      "right_count", "score")
  }

  /** WordPiece ENCODING profile — per-document token counts under a FIXED
    * vocabulary (the production deployment shape, like
    * [[LanguageModel.bpeEncodeProfile]] for BPE): greedy longest-match from
    * each position, `##` pieces match only mid-word, bare pieces only at
    * word start; a position no piece matches makes the WHOLE word a single
    * UNK token (the BERT runtime contract).
    *
    * `vocab` is in display form ("th", "##er", single chars, ...). The
    * matcher is a pure Column fold — `aggregate` over the word's character
    * positions with a (pos, tokens, unk) struct state, the per-step longest
    * match an `array_max` over a `transform` of the vocabulary literal.
    * HOF lambdas run interpreted, which is fine HERE because the fold runs
    * once per DISTINCT word (vocabulary-scale, never corpus-scale); per-doc
    * counts come from a word-keyed shuffle-hash join back. Greedy consumes
    * at least one character per step, so `length(w)` steps always suffice.
    *
    * Output: one row per input row: `id`, `n_words`, `n_word_chars`,
    * `n_tokens` (UNK words count 1), `n_unk_words`. Wordless docs get zeros.
    */
  def wordpieceEncodeProfile(df: DataFrame, id: Column, text: Column,
      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty && vocab.size <= 4096,
      s"vocab must have 1..4096 entries, got ${vocab.size}")
    require(vocab.distinct.size == vocab.size, "vocab must be distinct")
    require(vocab.forall(p => p.nonEmpty && p != "##" &&
      (!p.startsWith("##") || p.length > 2)),
      "vocab pieces must be non-empty and '##' needs a continuation body")
    val vocabArr = array(vocab.map(lit): _*)
    val toks = df.select(id.as("id"),
      explode(TextAnalysis.tokens(text)).as("w"))
    val matchLen = (pos: Column) => array_max(transform(vocabArr, p => {
      val isCont = p.startsWith("##")
      coalesce(
        when(pos === 1 && !isCont &&
          col("w").substr(pos, length(p)) === p, length(p)),
        when(pos > 1 && isCont &&
          col("w").substr(pos, length(p) - lit(2)) ===
            p.substr(lit(3), length(p)), length(p) - lit(2)),
        lit(0))
    }))
    val stepped = aggregate(
      sequence(lit(1), length(col("w"))),
      struct(lit(1).as("pos"), lit(0).as("toks"), lit(false).as("unk")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val best = matchLen(pos)
        when(acc.getField("unk") || pos > length(col("w")), acc)
          .when(best === 0, struct(pos.as("pos"),
            acc.getField("toks").as("toks"), lit(true).as("unk")))
          .otherwise(struct((pos + best).as("pos"),
            (acc.getField("toks") + 1).as("toks"), lit(false).as("unk")))
      })
    val encoded = toks.select(col("w")).distinct()
      .select(col("w"), length(col("w")).cast("long").as("__chars"),
        stepped.as("st"))
      .select(col("w"), col("__chars"),
        when(col("st.unk"), lit(1L)).otherwise(col("st.toks").cast("long"))
          .as("__toks"),
        col("st.unk").cast("long").as("__unk"))
    val perDoc = toks.join(encoded.hint("shuffle_hash"), Seq("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum(col("__chars")).as("n_word_chars"),
        sum(col("__toks")).as("n_tokens"), sum(col("__unk")).as("n_unk_words"))
    df.select(id.as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_word_chars"), lit(0L)).as("n_word_chars"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_unk_words"), lit(0L)).as("n_unk_words"))
  }
}
