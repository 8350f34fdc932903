package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extensions, SURVEY §7.6): language ID, quality scoring, token counting,
  * document fingerprinting. All are pure Column compositions of codegen'd
  * built-ins — they run inside whole-stage codegen, shuffle nothing, and scale
  * linearly with the scan.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    // array_remove ≡ filter(_ =!= "") here, but it's a codegen'd builtin —
    // the filter() HOF runs interpreted on the tokenize hot path
    array_remove(split(lower(text), "\\s+"), "")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and isolated symbols —
    * the standard pre-tokenizer shape (letters|digits|other, whitespace eaten).
    */
  def tokenCountBpe(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic.
    * Deliberately small + deterministic (the heuristic, not a model).
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is", "in", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "del"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "en", "du", "les", "des"))

  /** Occurrences of any word from `words` among the text's tokens. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*)))

  /** Language-ID by stopword-hit argmax with fixed tie order (profile order). */
  def languageId(text: Column): Column = {
    val scores = StopwordProfiles.map { case (lang, words) => lang -> stopwordHits(text, words) }
    // argmax with first-wins ties, as a when-ladder over pairwise comparisons
    scores.zipWithIndex.foldRight(lit("und")) { case (((lang, score), i), elseCol) =>
      val laterScores = scores.drop(i + 1).map(_._2)
      val isMax = laterScores.foldLeft(score > 0) { (acc, other) => acc && score >= other }
      when(isMax, lang).otherwise(elseCol)
    }
  }

  /** Heuristic quality score in [0,1]: length saturation (0.4) + stopword ratio
    * (0.4) + punctuation sanity (0.2). Rounded to 6 dp for cross-engine
    * stability (all inputs are exact integers, so the double math is
    * deterministic).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCountWs(text).cast("double")
    val punct = regexp_count(text, lit("[.,;:!?]")).cast("double")
    val stops = stopwordHits(text, StopwordProfiles.flatMap(_._2)).cast("double")
    val lenScore = least(nChars / 500.0, lit(1.0))
    val stopRatio = when(nTokens > 0, least(stops / nTokens * 5.0, lit(1.0))).otherwise(0.0)
    val punctSanity = when(nChars > 0, greatest(lit(0.0), lit(1.0) - punct / nChars * 10.0)).otherwise(0.0)
    round(lenScore * 0.4 + stopRatio * 0.4 + punctSanity * 0.2, 6)
  }

  /** Sketch-based corpus profile per group: approximate distinct tokens (HLL)
    * and approximate length quantiles (t-digest-style percentile_approx) —
    * the one-pass, bounded-memory way to profile a 100 TB corpus where exact
    * countDistinct would shuffle every token and exact percentiles would sort
    * every group. `relativeSD`/`accuracy` trade sketch size for error; the
    * sketches merge associatively, so the profile is a single map-side-
    * combined aggregation. Accuracy-vs-exact is tolerance-tested in
    * ExtensionsSpec (approximate results are engine-specific — no DuckDB
    * oracle, by design).
    */
  def corpusProfile(docs: org.apache.spark.sql.DataFrame, group: Column,
      text: Column, relativeSD: Double = 0.02,
      accuracy: Int = 1000): org.apache.spark.sql.DataFrame = {
    val base = docs.select(group.as("group"), text.as("__text"),
      length(text).as("__len"))
    val docStats = base.groupBy(col("group")).agg(
      count(lit(1)).as("n_docs"),
      percentile_approx(col("__len"), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(accuracy)).as("len_quantiles"),
      round(avg(col("__len")), 2).as("avg_len"))
    val tokStats = base
      .select(col("group"), explode(tokens(col("__text"))).as("__tok"))
      .groupBy(col("group")).agg(
        approx_count_distinct(col("__tok"), relativeSD).as("approx_vocab"),
        count(lit(1)).as("total_tokens"))
    docStats.join(tokStats, Seq("group"), "left")
  }

  // ------------------------------------------------------------- pii --

  /** PII redaction patterns — deliberately restricted to syntax both Java
    * regex and RE2 (DuckDB/Go/Rust engines) support identically: character
    * classes, bounded repetition, ASCII `\b` — no lookaround, no
    * backreferences. Order matters: emails before phone-shaped digit runs.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "[IP]",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b" -> "[PHONE]",
    "\\b\\d{3}-\\d{4}\\b" -> "[PHONE]")

  /** C4/CommonCrawl-style PII scrub: emails, IPv4s, phone-shaped digit runs →
    * typed placeholder tokens. Pure codegen'd `regexp_replace` chain — scan
    * speed, no shuffle, no UDF.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** k-anonymity audit over a quasi-identifier tuple — the re-identification
    * companion to [[redactPii]]: direct identifiers are scrubbed by pattern,
    * but a row can still be identified by the COMBINATION of innocuous
    * attributes (language × source × length band is the curation-metadata
    * analogue of the classic zip × birthdate × sex). Every row gets its
    * equivalence-class size; rows in classes smaller than `k` are flagged
    * for suppression (release would expose a ≤ k-member group).
    *
    * Scale shape: one groupBy on the quasi-identifier tuple (map-side
    * combined, class count ≪ corpus) and one hinted shuffle-hash join back —
    * no window (a per-class `count().over(...)` would buffer hot classes in
    * single window tasks; the aggregate+join shape spreads them).
    *
    * Output: the input columns + `qi_class_size` + `suppress`. NULL quasi
    * values are legitimate class members (groupBy treats NULL as a value),
    * so the join back is null-safe (`<=>`): a privacy audit must FLAG the
    * null-QI equivalence classes, not silently drop their rows — dropping
    * them was exactly the failure mode for the rows most worth auditing.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be at least 2, got $k")
    val qiCols = quasi.zipWithIndex.map { case (c, i) => c.as(s"__qi$i") }
    val names = qiCols.indices.map(i => s"__qi$i")
    val sNames = qiCols.indices.map(i => s"__qs$i")
    val tagged = df.select(col("*") +: qiCols: _*)
    val sizes = tagged.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("qi_class_size"))
      .select((names.zip(sNames).map { case (n, sn) => col(n).as(sn) } :+
        col("qi_class_size")): _*)
    // <=> keys are still equi-join keys to the planner — the hinted
    // shuffle-hash shape survives the null-safe comparison
    val cond = names.zip(sNames).map { case (n, sn) => col(n) <=> col(sn) }
      .reduce(_ && _)
    tagged
      .join(sizes.hint("shuffle_hash"), cond)
      .withColumn("suppress", col("qi_class_size") < k)
      .drop(names ++ sNames: _*)
  }

  /** l-diversity audit — [[kAnonymity]]'s stronger sibling: a QI class can
    * be k-large yet still leak if every member shares one sensitive value
    * (the homogeneity attack). Per row: its class size, the class's count
    * of DISTINCT non-null sensitive values (`count distinct` ignores NULL
    * in both this engine and the SQL oracle — an absent sensitive value is
    * no disclosure), and `suppress` when that diversity is below `l`.
    * Null quasi values are legitimate class members, same null-safe `<=>`
    * join contract as [[kAnonymity]].
    *
    * Scale design: identical shape to [[kAnonymity]] — one QI-keyed
    * aggregation (the distinct-count is exact, grouped map-side by
    * (QI, sensitive) first never materializing per-class sets) + one
    * shuffle-hash join back on the QI key.
    */
  def lDiversity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
      l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(l >= 2, s"l must be at least 2, got $l")
    val qiCols = quasi.zipWithIndex.map { case (c, i) => c.as(s"__qi$i") }
    val names = qiCols.indices.map(i => s"__qi$i")
    val sNames = qiCols.indices.map(i => s"__qs$i")
    val tagged = df.select(col("*") +: qiCols: _*)
    val sizes = tagged.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("qi_class_size"),
        countDistinct(sensitive).as("sens_diversity"))
      .select((names.zip(sNames).map { case (n, sn) => col(n).as(sn) } :+
        col("qi_class_size") :+ col("sens_diversity")): _*)
    val cond = names.zip(sNames).map { case (n, sn) => col(n) <=> col(sn) }
      .reduce(_ && _)
    tagged
      .join(sizes.hint("shuffle_hash"), cond)
      .withColumn("suppress", col("sens_diversity") < l)
      .drop(names ++ sNames: _*)
  }

  /** t-closeness audit — the third rung of the privacy-release ladder after
    * [[kAnonymity]] and [[lDiversity]] (Li, Li & Venkatasubramanian 2007):
    * a QI class can be k-large AND l-diverse yet still leak by SKEW — if
    * 90% of one class shares a sensitive value that is rare globally, an
    * attacker learns a lot from class membership alone. The audit: per QI
    * class, the total-variation distance between the class's sensitive-value
    * distribution and the global one,
    * `tv = ½ · Σ_s |c_s/n − g_s/N|`, flagged when it exceeds `t`.
    *
    * Arithmetic contract: counts are exact integers; the per-value term is
    * the cross-multiplied `|c_s·N − g_s·n|` in decimal(38,0) (≡ DuckDB
    * HUGEINT — products are ≤ N², inside 38 digits for any corpus under
    * 10^19 rows), summed per class; values ABSENT from a class contribute
    * their full global mass via the closed form `(N − Σ_{s∈class} g_s)·n`
    * — no dense (class × value) grid is ever materialized. Only the final
    * ratio is float, rounded to 6 dp; `suppress` compares the ROUNDED
    * distance (round-then-compare, the engine-wide boundary contract).
    *
    * NULL contract: NULL sensitive values are no disclosure — they are
    * excluded from both distributions (same stance as [[lDiversity]]'s
    * countDistinct) but their rows keep their class's verdict; a class with
    * zero non-null sensitive rows has no distribution → NULL tv, suppress
    * false. NULL quasi values are legitimate class members (`<=>` join,
    * same contract as the siblings).
    *
    * Scale design: one (QI, sensitive) map-side-combined aggregate collapses
    * the corpus; the class size rides an unbounded window over the SAME QI
    * partitioning (no second corpus pass — the ksDrift idiom); the global
    * distribution is sensitive-enum-scale and broadcasts; one QI-keyed
    * re-aggregate, then the standard shuffle-hash join back to rows.
    */
  def tCloseness(df: DataFrame, quasi: Seq[Column], sensitive: Column,
      t: Double): DataFrame = {
    require(quasi.nonEmpty, "tCloseness needs at least one quasi-identifier")
    require(t > 0.0 && t < 1.0, s"t must be in (0,1), got $t")
    val qiCols = quasi.zipWithIndex.map { case (c, i) => c.as(s"__qi$i") }
    val names = qiCols.indices.map(i => s"__qi$i")
    val sNames = qiCols.indices.map(i => s"__qs$i")
    val tagged = df.select(col("*") +: qiCols: _*)
    val cell = tagged.filter(sensitive.isNotNull)
      .groupBy(names.map(col) :+ sensitive.as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCls = Window.partitionBy(names.map(col): _*)
    val global = cell.groupBy(col("__s")).agg(sum(col("__c")).as("__g"))
    // the re-select breaks the shared-lineage attribute ambiguity the bare
    // 1-row aggregate hits when cross-joined back over its own source
    val tot = cell.agg(sum(col("__c")).as("__t"))
      .select(col("__t").as("__totN"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val perClass = cell
      .withColumn("__n", sum(col("__c")).over(wCls))
      .join(broadcast(global), Seq("__s"))
      .crossJoin(broadcast(tot)) // 1-row total
      .withColumn("__term",
        abs(d(col("__c")) * d(col("__totN")) - d(col("__g")) * d(col("__n"))))
      .groupBy(names.map(col): _*)
      .agg(max(col("__n")).as("__n"), sum(col("__term")).as("__sumabs"),
        sum(col("__g")).as("__cov"), max(col("__totN")).as("__NN"))
      .withColumn("tv_distance", round(
        (col("__sumabs") + (d(col("__NN")) - d(col("__cov"))) * d(col("__n")))
          .cast("double") /
          (lit(2.0) * col("__n").cast("double") * col("__NN").cast("double")),
        6))
      .select((names.zip(sNames).map { case (n, sn) => col(n).as(sn) } :+
        col("__n").as("qi_class_nonnull") :+ col("tv_distance")): _*)
    val cond = names.zip(sNames).map { case (n, sn) => col(n) <=> col(sn) }
      .reduce(_ && _)
    tagged
      .join(perClass.hint("shuffle_hash"), cond, "left")
      .withColumn("suppress", coalesce(col("tv_distance") > t, lit(false)))
      .drop(names ++ sNames: _*)
  }

  /** ε-differentially-private count release (Dwork et al. 2006) — the
    * privacy ladder's fourth rung after [[kAnonymity]]/[[lDiversity]]/
    * [[tCloseness]]: those AUDIT a release for re-identification risk; this
    * PRODUCES a release whose per-group counts carry calibrated Laplace
    * noise (scale 1/ε — count has add/remove sensitivity 1), so no single
    * row's presence moves any released count's distribution by more than
    * e^ε. The exact counts never appear in the output.
    *
    * Noise is DETERMINISTIC per (group, salt): u ∈ (0,1) is the portable
    * sha-derived uniform ([[Sampling.hashBucket]]'s trade) seeded by the
    * group key ⊕ salt, pushed through the Laplace inverse CDF
    * `−(1/ε)·sign(u−½)·ln(1−2|u−½|)`. That buys exact re-run/engine/oracle
    * reproducibility (the whole release hash-compares against an
    * independent engine) at a documented cost: the DP guarantee holds only
    * against adversaries who cannot guess the salt, and re-releasing the
    * SAME groups under a fresh salt composes ε-additively just like any
    * repeated DP query — rotate salts only as the privacy budget allows.
    *
    * NULL quasi values are legitimate groups (the [[kAnonymity]] stance);
    * in the seed they appear as a `\u0001` sentinel (distinct from the
    * empty string; a real `\u0001` in a QI value would alias — QI columns
    * are enum-like metadata, not free text). Released counts are clamped
    * at 0 (a negative count is self-evidently noise, and clamping is
    * post-processing — DP survives it).
    *
    * Output: the quasi columns (caller's names) + `n_released` +
    * `epsilon`. Scale shape: ONE map-side-combined groupBy on the QI tuple;
    * the noise chain is scan-local arithmetic on the (class-count-sized)
    * aggregate — nothing else touches the corpus.
    */
  def dpCountRelease(df: DataFrame, quasi: Seq[Column], epsilon: Double,
      salt: String = ""): DataFrame = {
    require(quasi.nonEmpty, "dpCountRelease needs at least one group column")
    require(epsilon > 0.0 && epsilon <= 20.0,
      s"epsilon must be in (0,20], got $epsilon")
    val grouped = df.groupBy(quasi: _*).agg(count(lit(1)).as("__n"))
    val outNames = grouped.columns.dropRight(1)
    val seed = concat_ws("|",
      outNames.map(n => coalesce(col(n).cast("string"), lit("\u0001"))) :+
        lit(salt): _*)
    val u = (conv(substring(sha2(seed, 256), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    val noise = round((lit(-1.0 / epsilon) * signum(u - lit(0.5))) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))), 6)
    grouped
      .withColumn("n_released",
        greatest(lit(0L), round(col("__n") + noise).cast("long")))
      .withColumn("epsilon", lit(epsilon))
      .drop("__n")
  }

  // ------------------------------------------------- cleaning / canon --

  /** Crawl-grade text cleaning — the scrub every web corpus runs before any
    * other stage: drop control characters (except `\n`/`\t`), collapse
    * space/tab runs to one space, squeeze 3+ blank lines to one blank line,
    * trim. Patterns stay in the Java∩RE2 subset (same engine-portability
    * contract as [[redactPii]]), applied in a fixed order so the result is
    * reproducible by any regex engine. Codegen'd chain, scan-local.
    */
  def cleanText(text: Column): Column = {
    val noCtl = regexp_replace(text,
      lit("[\\x00-\\x08\\x0B-\\x1F\\x7F]"), lit(""))
    val oneSpace = regexp_replace(noCtl, lit("[ \\t]+"), lit(" "))
    val fewLines = regexp_replace(oneSpace, lit("\\n{3,}"), lit("\n\n"))
    trim(fewLines)
  }

  /** Canonical form for NORMALIZED exact dedup (the CCNet/C4 trick: hash the
    * canonical text, not the raw bytes — catches re-crawls that differ only
    * in case, punctuation, or whitespace): lowercase, strip everything
    * outside `[a-z0-9\s]`, collapse whitespace, trim. Same portable-pattern
    * contract as [[cleanText]]. Feed to [[Dedup.exact]] as the key.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), lit("[^a-z0-9\\s]"), lit("")),
      lit("\\s+"), lit(" ")))

  // ----------------------------------------------------- urls / domains --

  /** All http(s) URLs in a text column (whitespace-delimited, the crawl
    * convention). Java∩RE2 portable pattern, scan-local. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^\\s]+"), lit(0))

  /** Lowercased host of one URL ('' if the shape is unparsable). */
  def urlDomain(url: Column): Column =
    lower(regexp_extract(url, "https?://([^/\\s]+)", 1))

  /** Canonical URL — the crawl-dedup normalization that merges cosmetic
    * variants of one page before URL-level dedup (the first, cheapest dedup
    * pass of a web pipeline: no content read, just key normalization):
    *
    *   - fragment dropped (`#...` never reaches the server);
    *   - scheme and host lowercased, default ports `:80`/`:443` and a
    *     leading `www.` stripped;
    *   - trailing path slashes stripped (path case is PRESERVED — paths are
    *     case-sensitive);
    *   - query params: tracking params dropped (`utm_*`, `fbclid`, `gclid`,
    *     `msclkid`, `ref`), the rest sorted so param order is irrelevant.
    *
    * Non-`http(s)` inputs pass through unchanged (identity fallback, same
    * contract as [[urlDomain]]'s '' — never null). Pure scan-local
    * expression chain; every step is Java∩RE2 portable, so the oracle
    * re-derives it verbatim.
    */
  def canonicalUrl(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u, "^(https?)://", 1))
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(u, "^https?://([^/?#]+)", 1)),
        ":(80|443)$", ""),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(u, "^https?://[^/?#]+([^?#]*)", 1), "/+$", "")
    val params = org.apache.spark.sql.functions.filter(
      split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => p =!= "" &&
        !p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"))
    val q = array_join(array_sort(params), "&")
    when(url.rlike("^https?://"),
      concat(scheme, lit("://"), host, path,
        when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
      .otherwise(url)
  }

  /** Per-document domain profile — the input to domain blocklist/allowlist
    * decisions and per-domain caps (the first curation lever of every web
    * corpus): (id, n_urls, domains) where `domains` is the sorted distinct
    * host list. Scan-local; join `explode(domains)` against a broadcast
    * blocklist to filter, or groupBy the exploded domain for corpus-level
    * domain stats.
    */
  def domainProfile(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    val urls = extractUrls(text)
    df.select(id.as("id"), size(urls).cast("long").as("n_urls"),
      array_sort(array_distinct(transform(urls, u => urlDomain(u)))).as("domains"))
  }

  /** The dot-suffix chain of a host — `a.b.com → [a.b.com, b.com, com]` —
    * the unit a domain blocklist actually matches on: an entry `b.com` must
    * block every subdomain, which exact-host equality misses and a
    * `LIKE '%b.com'` scan gets WRONG (it also hits `web.com`). Scan-local
    * array build; empty host → empty array. */
  def domainSuffixes(domain: Column): Column = {
    val parts = split(domain, "\\.")
    when(length(domain) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(parts)),
        i => array_join(slice(parts, i, size(parts)), ".")))
  }

  /** Blocklist verdict for a LITERAL rule set (the config-file case): pure
    * scan-local expression, no join anywhere — `blocked_by` is the longest
    * (most specific) matching rule, null if clean. The max is taken on
    * (length, value) structs, NOT lexicographically — `com` sorts above
    * `b.com` as a string but is the less specific rule. For rule sets too
    * big to inline (the 1M-entry crawl blocklist), use
    * [[markBlockedDomains]]. */
  def domainBlockedBy(domain: Column, rules: Seq[String]): Column = {
    val hit = array_intersect(domainSuffixes(domain),
      lit(rules.toArray).cast("array<string>"))
    when(size(hit) > 0,
      array_max(transform(hit, s => struct(length(s).as("l"), s.as("s"))))
        .getField("s"))
  }

  /** One row per input row + `is_blocked` / `blocked_by` (most-specific
    * matching rule, null when clean), with `rules` as a DataFrame of one
    * `rule` column — the at-scale path: the host's suffix chain (≤ label
    * count, scan-local explode) inner-joins the BROADCAST rule set, the
    * per-row verdict reduces hit rules to the longest, and verdicts fold
    * back onto the corpus with a shuffle-hash left join on the row id
    * (verdicts sit behind an aggregate, so an unhinted join would fall back
    * to sort-merge — the [[graft.extensions.Dedup]] contract). The corpus
    * is shuffled once; the rule set never is. A host's suffixes have
    * strictly decreasing lengths, so the (length, rule) max is unique.
    */
  def markBlockedDomains(df: org.apache.spark.sql.DataFrame, id: Column,
      domain: Column, rules: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val sfx = df.select(id.as("__id"), explode(domainSuffixes(domain)).as("__sfx"))
    val verdict = sfx
      .join(broadcast(rules.select(col("rule"))), col("__sfx") === col("rule"))
      .groupBy(col("__id"))
      .agg(max(struct(length(col("rule")).as("l"), col("rule").as("r"))).as("__m"))
      .select(col("__id"), col("__m").getField("r").as("blocked_by"))
    df.join(verdict.hint("shuffle_hash"), id === col("__id"), "left")
      .drop("__id")
      .withColumn("is_blocked", col("blocked_by").isNotNull)
  }

  // -------------------------------------------- gopher-style quality --

  /** Mean token length in characters — `length(join(tokens)) / count`, all
    * codegen'd builtins (no per-token HOF). 0 for token-less docs. */
  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      round(length(array_join(toks, "")).cast("double") / size(toks), 6))
      .otherwise(0.0)
  }

  /** Fraction of characters that are ASCII letters. 0 for empty docs. */
  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      round(regexp_count(text, lit("[A-Za-z]")).cast("double") / length(text), 6))
      .otherwise(0.0)

  /** Fraction of non-blank lines that are duplicates of an earlier line —
    * the boilerplate signal (nav bars, footers) in Gopher's repetition
    * filters. 1 − distinct/total over newline-split lines.
    */
  def dupLineFrac(text: Column): Column = {
    val lines = array_remove(split(text, "\n"), "")
    when(size(lines) > 0,
      round(lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines), 6))
      .otherwise(0.0)
  }

  /** Gopher-style keep verdict from the stats above (the published operating
    * points: mean word length in [3, 10], mostly-alphabetic text, bounded
    * boilerplate repetition).
    */
  def qualityKeep(text: Column): Column = {
    val mwl = meanWordLen(text)
    mwl >= 3.0 && mwl <= 10.0 && alphaRatio(text) >= 0.6 && dupLineFrac(text) <= 0.3
  }

  // -------------------------------------------------------- chunking --

  /** Context-window chunking: each document becomes ⌈(n−c)/s⌉+1 overlapping
    * token windows of `chunkSize` tokens at `stride` steps (overlap =
    * chunkSize − stride) — the corpus→training-sequence step of an LLM data
    * pipeline. Token-less docs are dropped (no window to emit).
    *
    * Plan shape: the chunk COUNT is computed per row first and a bare
    * `explode(sequence(...))` generates indices — the window slice is then
    * codegen'd column math per output row. No HOF, no UDF, and the explode
    * multiplies rows only by the chunk count (bounded by doc length / stride),
    * never materializing per-doc chunk arrays.
    */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val base = df.select(id.as("id"), tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
    val nChunks = when(col("__n") <= chunkSize, lit(1L))
      .otherwise(ceil((col("__n") - chunkSize).cast("double") / stride).cast("long") + 1L)
    base
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1L)))
      .select(col("id"), col("chunk_idx"),
        least(lit(chunkSize), col("__n") - col("chunk_idx") * stride).cast("int")
          .as("n_tokens"),
        concat_ws(" ", slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize))).as("chunk_text"))
  }

  /** Document fingerprint: min-sampled 8-char-shingle hash (winnowing-style
    * selection with w = whole document). The shingle hash is the first 48 bits
    * of sha256 — chosen over xxhash/murmur because it is reproducible in any
    * engine (the DuckDB oracle re-derives it), collision-adequate for
    * fingerprinting, and cheap at scan speed.
    *
    * Bounded work per row: window positions are strided so at most
    * `maxSamples` shingles hash regardless of document length (an unbounded
    * per-position array would cost one sha256 per CHARACTER and a doc-sized
    * transient allocation — an OOM risk on megabyte documents). Docs shorter
    * than `maxSamples` use stride 1, i.e. every window, so small-corpus
    * results are unchanged.
    */
  def docFingerprint(text: Column, shingleLen: Int = 8, maxSamples: Int = 512): Column =
    // native loop (graft.functions.DocFingerprint64): the equivalent
    // array_min(transform(sequence…, sha2+conv)) tree runs interpreted with a
    // position array + hex round-trip per window — value-identity pinned in
    // NativeExprEquivalenceSpec
    graft.functions.DocFingerprint64.docFingerprint64(text, shingleLen, maxSamples)

  // --------------------------------------------------------- oov rate --

  /** Per-document out-of-vocabulary rate against the corpus's own top-`topK`
    * token vocabulary — the tokenizer-fit signal (a doc whose tokens mostly
    * fall outside the vocabulary will shatter into long byte-fallback
    * sequences at training time; high OOV is also a strong junk/wrong-
    * language indicator). Vocabulary = the `topK` most frequent tokens,
    * ties broken by token string so the boundary is deterministic.
    *
    * Output: one row per document WITH at least one token —
    * (id, n_tokens, n_oov, oov_rate).
    *
    * Scale shape: the vocabulary is a TakeOrdered over the token-frequency
    * aggregate (map-side combined; never a full sort) and is topK-bounded,
    * so it broadcasts; the token explode is scan-local; the only
    * corpus-scale shuffle is the per-doc groupBy. */
  def oovRate(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      topK: Int): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.select(id.as("id"), explode(tokens(text)).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("tok").asc).limit(topK)
      .select(col("tok"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Gopher/C4-style heuristic filter rules (Rae et al. 2021 §A1.1;
    * Raffel et al. 2020 §2.2) as per-document boolean flags plus the overall
    * verdict — the rule-based first stage of every web-corpus funnel, kept
    * separate from the continuous [[qualityScore]] so pipelines can report
    * WHICH rule rejected a document, not just a low score.
    *
    * Every ratio threshold is evaluated in INTEGER cross-multiplied form
    * (`bullets·10 ≤ lines·9` instead of `bullets/lines ≤ 0.9`) — bit-stable
    * across engines, no float division anywhere:
    *  - `r_word_count`: 50 ≤ words ≤ 100000 (Gopher)
    *  - `r_mean_word_len`: 3 ≤ non-space chars / words ≤ 10 (Gopher)
    *  - `r_symbol_ratio`: (#`#` + #`…`) · 10 < words (Gopher, < 0.1)
    *  - `r_bullet_ratio`: bullet-started lines · 10 ≤ lines · 9 (Gopher)
    *  - `r_ellipsis_ratio`: `…`/`...`-ended lines · 10 ≤ lines · 3 (Gopher)
    *  - `r_alpha_ratio`: tokens containing a letter · 10 ≥ tokens · 8 (Gopher)
    *  - `r_terminal_punct`: lines ending in `.!?"'` · 2 ≥ lines (C4-ish)
    *  - `r_no_lorem`: no `lorem ipsum` (C4)
    *  - `r_no_brace`: no `{` (C4)
    * Token-less documents fail every ratio rule. `passes` = AND of all nine.
    *
    * Scale shape: pure scan-local Column arithmetic — string/HOF expressions
    * only, no explode, no shuffle, no state; the flags travel with the row
    * into whatever funnel stage consumes them.
    */
  def heuristicRules(text: Column): Column = {
    val words = tokenCountWs(text).cast("long")
    val nsChars = length(regexp_replace(text, "\\s+", "")).cast("long")
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val nLines = size(lines).cast("long")
    val bullets = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val ellipsis = size(filter(lines,
      l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val terminal = size(filter(lines,
      l => trim(l).rlike("[.!?\"']$"))).cast("long")
    val alphaToks = size(filter(tokens(text), t => t.rlike("[a-z]"))).cast("long")
    val symbols = ((length(text) - length(regexp_replace(text, "#", ""))) +
      (length(text) - length(regexp_replace(text, "…", "")))).cast("long")
    val lower_ = lower(text)
    struct(
      words.as("n_words"),
      (words >= 50L && words <= 100000L).as("r_word_count"),
      (words > 0L && nsChars >= words * 3L && nsChars <= words * 10L)
        .as("r_mean_word_len"),
      (words > 0L && symbols * 10L < words).as("r_symbol_ratio"),
      (nLines > 0L && bullets * 10L <= nLines * 9L).as("r_bullet_ratio"),
      (nLines > 0L && ellipsis * 10L <= nLines * 3L).as("r_ellipsis_ratio"),
      (words > 0L && alphaToks * 10L >= words * 8L).as("r_alpha_ratio"),
      (nLines > 0L && terminal * 2L >= nLines).as("r_terminal_punct"),
      (!lower_.contains("lorem ipsum")).as("r_no_lorem"),
      (!lower_.contains("{")).as("r_no_brace"))
  }

  /** Compression-ratio quality signal (RefinedWeb-style): UTF-8 bytes,
    * deflate(level 6) bytes, and their 6-dp ratio via the native
    * [[graft.functions.DeflateStats]] expression. Low ratio = templated /
    * repetitive text; ratio near (or above) 1 = noise. Deflate exists in no
    * SQL engine, so queries over this signal are rows-only by contract with
    * an invariant twin (x82) pinning codec soundness bounds.
    */
  def compressionRatio(text: Column): Column = {
    val s = graft.functions.DeflateStats.deflateStats(text)
    struct(
      s.getField("n_bytes").as("n_bytes"),
      s.getField("n_deflate").as("n_deflate"),
      when(s.getField("n_bytes") > 0,
        round(s.getField("n_deflate").cast("double") /
          s.getField("n_bytes").cast("double"), 6))
        .otherwise(0.0).as("ratio"))
  }

  /** Per-LINE language agreement with the document-level [[languageId]] —
    * the mixed-language detector: a document whose body is English but whose
    * boilerplate third is French passes doc-level lang-ID and still poisons
    * a monolingual corpus. Units are non-blank lines; each gets the same
    * stopword-argmax verdict as the document.
    *
    * Output per row: `doc_lang`, `n_units`, `n_match` (units agreeing with
    * `doc_lang`), `n_und` (units with no stopword evidence),
    * `consistency` = n_match/n_units rounded to 6 dp (0 for line-less docs),
    * `is_mixed` — integer cross-multiplied `n_match·5 < n_units·4`
    * (consistency < 0.8, no float compare) over documents with ≥ 2 units.
    *
    * Scale shape: entirely scan-local — the line split, per-line language
    * ladder, and agreement counts are all array HOFs over the row's own
    * text (bounded by document size, like every whole-doc operator here);
    * no explode, no join, no shuffle of any kind.
    */
  def langConsistency(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    val docLang = languageId(text)
    val lineArr = filter(split(text, "\n"), l => trim(l) =!= "")
    val langs = transform(lineArr, l => languageId(l))
    df.select(id.as("id"), docLang.as("doc_lang"),
        size(lineArr).cast("long").as("n_units"),
        size(filter(langs, lg => lg === docLang)).cast("long").as("n_match"),
        size(filter(langs, lg => lg === "und")).cast("long").as("n_und"))
      .withColumn("consistency",
        when(col("n_units") > 0,
          round(col("n_match").cast("double") / col("n_units").cast("double"), 6))
          .otherwise(0.0))
      .withColumn("is_mixed",
        col("n_units") >= 2L && col("n_match") * 5L < col("n_units") * 4L)
  }

  /** Per-group rule-pass profile over [[heuristicRules]]: docs, passes,
    * pass rate, and the 95% Wilson LOWER bound on the pass rate — the
    * ranking statistic that does not reward tiny sources for lucky small
    * samples (a 3/3 source must rank below a 9500/10000 source). The bound
    * uses the standard z = 1.96 closed form; every input is an exact
    * integer count, so the double math is deterministic, and both the rate
    * and the bound are rounded to 6 dp.
    *
    * Scale shape: rule flags are scan-local Columns; the profile is ONE
    * map-side-combinable groupBy on the group key — enum-scale output, no
    * join, no window, nothing quadratic.
    */
  def ruleProfile(df: org.apache.spark.sql.DataFrame, group: Column,
      text: Column): org.apache.spark.sql.DataFrame = {
    val r = heuristicRules(text)
    val flagNames = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_bullet_ratio", "r_ellipsis_ratio", "r_alpha_ratio",
      "r_terminal_punct", "r_no_lorem", "r_no_brace")
    val passes = flagNames.map(f => r.getField(f)).reduce(_ && _)
    val agg = df.select(group.as("group"), when(passes, 1L).otherwise(0L).as("__p"))
      .groupBy("group").agg(count(lit(1)).as("n_docs"), sum(col("__p")).as("n_pass"))
    val n = col("n_docs").cast("double")
    val p = col("n_pass").cast("double") / n
    val z2 = lit(1.96) * lit(1.96)
    val lower = (p + z2 / (lit(2.0) * n) -
      lit(1.96) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))) /
      (lit(1.0) + z2 / n)
    agg.select(col("group"), col("n_docs"), col("n_pass"),
      round(p, 6).as("pass_rate"),
      round(lower, 6).as("wilson_lower"))
  }

  /** Winnowing fingerprint set (MOSS scheme): distinct minima of every
    * `w`-wide window over the doc's `k`-char shingle hashes, sorted
    * ascending — see [[graft.functions.WinnowFingerprints]] for the
    * guarantee and the native one-pass implementation. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4,
      maxGrams: Int = 2048): Column =
    graft.functions.WinnowFingerprints.winnowFingerprints(text, k, w, maxGrams)

  /** Per-document winnowing overlap profile — the plagiarism/boilerplate
    * detection primitive: every shared run of ≥ `k + w − 1` chars between
    * two docs is guaranteed to surface as a shared fingerprint, so
    * `n_shared` is a sound screen for copied passages (0 shared ⇒ no such
    * run survived selection).
    *
    * Output, one row per doc with ≥ 1 fingerprint (i.e. ≥ `k` chars):
    * (id, n_fp, n_shared = fingerprints also selected by ≥ 1 other doc,
    * fp_digest = sha256 of the comma-joined sorted fingerprint list — a
    * stable identity for snapshot diffing).
    *
    * Scale shape: fingerprinting is scan-local (native expression, ≤
    * `maxGrams` digests/row); the only corpus-scale exchanges are the
    * fingerprint-frequency groupBy and the two hinted hash joins back on
    * fp/id — fingerprint counts never broadcast (the fp relation is
    * corpus-sized). Nothing quadratic: docs never pair with docs.
    */
  def winnowProfile(df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, k: Int = 8, w: Int = 4, maxGrams: Int = 2048)
      : org.apache.spark.sql.DataFrame = {
    val fps = df
      .select(id.as("id"), winnowFingerprints(text, k, w, maxGrams).as("fps"))
      .filter(size(col("fps")) >= 1)
      // the native winnowing scan is the dominant cost and has THREE
      // consumers (digest, count, join-back): one GC-owned materialization
      // instead of three evaluations — the sf1 probe showed 16x-for-10x
      // scaling without it (recomputation × shuffle pressure)
      .localCheckpoint(eager = false)
    val perDoc = fps.select(col("id"),
      size(col("fps")).cast("long").as("n_fp"),
      sha2(array_join(transform(col("fps"), _.cast("string")), ","), 256)
        .as("fp_digest"))
    val sel = fps.select(col("id"), explode(col("fps")).as("fp"))
    // n_fp is scan-local (size), so the join only needs the SHARED
    // fingerprint set — which is tiny relative to the stream (only
    // fingerprints appearing in ≥2 docs: boilerplate + true near-dups).
    // Measured gate, same trade as unigramLogLikelihood's vocab gate: a
    // bounded-size shared set BROADCASTS the semi-join and the 10⁸-row
    // fingerprint stream never shuffles for it; above the gate, fall back
    // to a shuffle-hash semi-join. The sf1 probe motivated this shape:
    // joining ndocs back onto the full stream was 2 full-stream shuffles.
    val sharedFps = sel.groupBy("fp").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2L).select(col("fp"))
      .localCheckpoint(eager = false)
    val nSharedFps = sharedFps.count()      // bounded driver scalar (the gate)
    val mark: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (nSharedFps <= 4000000L) broadcast else d => d.hint("shuffle_hash")
    val hits = sel.join(mark(sharedFps), Seq("fp"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
    perDoc.join(hits.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), col("n_fp"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"), col("fp_digest"))
  }

  /** Boilerplate-passage profile (the CCNet/RefinedWeb pre-cleaning signal):
    * a passage repeated across MANY documents of the same group (site,
    * domain, source) is boilerplate — navigation, license footers, cookie
    * banners — and its per-doc share is a direct cleaning/quality feature.
    *
    * A passage is an `n`-token sliding window (documents here carry no
    * line structure; with lines, the unit would be the line — see
    * [[graft.extensions.Dedup.lineDedup]]). A passage is boilerplate in
    * group g when it occurs in ≥ `minDocs` DISTINCT documents of g.
    *
    * Scale design: one passage explode (scan-local), one (group, passage)
    * aggregate over the DISTINCT doc-passage relation for the boilerplate
    * set, one `shuffle_hash` join back of the instance stream, one per-doc
    * aggregate. The boilerplate relation is corpus-sublinear (only passages
    * clearing `minDocs`); nothing collects to the driver.
    *
    * Output: one row per input row: `id`, `n_grams` (passage instances),
    * `n_boiler` (instances whose passage is group-boilerplate),
    * `boiler_ppm` (integral parts-per-million; 0 for gram-less docs).
    */
  def boilerplateProfile(df: DataFrame, id: Column, text: Column,
      group: Column, n: Int = 5, minDocs: Long = 3L): DataFrame = {
    require(n >= 1 && n <= 64, s"n must be in [1,64], got $n")
    require(minDocs >= 2L, s"minDocs must be at least 2, got $minDocs")
    val base = df.select(id.as("id"), group.as("grp"), tokens(text).as("__t"))
    val grams = base.select(col("id"), col("grp"), explode(
        when(size(col("__t")) >= n,
          transform(sequence(lit(1), size(col("__t")) - (n - 1)),
            i => array_join(slice(col("__t"), i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"))
      .localCheckpoint(eager = false)   // boilerplate set + instance stream
    val boiler = grams.select(col("grp"), col("g"), col("id")).distinct()
      .groupBy(col("grp"), col("g")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("grp"), col("g"))
    val perDoc = grams
      .join(boiler.withColumn("__b", lit(1L)).hint("shuffle_hash"),
        Seq("grp", "g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__b"), lit(0L))).as("n_boiler"))
    df.select(id.as("id")).join(perDoc.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("boiler_ppm",
        expr("(n_boiler * 1000000) div greatest(n_grams, 1)"))
  }

  /** Zipf rank–frequency fit — the corpus-naturalness audit ("does this
    * corpus's token distribution look like text?"): per group, OLS of
    * ln(frequency) on ln(rank) over the top `maxRank` terms. Natural
    * language reads slope ≈ −1 with high r² (Zipf's law); machine-generated
    * or template-heavy corpora bend the curve — the standard pre-training
    * health check next to [[LanguageModel.tokenizerFertility]].
    *
    * Float contract (the [[graft.ops.TimeSeries.groupTrend]] idiom,
    * composed onto the token-count relation): x = round(ln(rank)·1e6) and
    * y = round(ln(count)·1e6) are integer micros, the six regression sums
    * are EXACT (products summed in decimal(38,0) — Σy² clears 2⁶³ only
    * there), and the closing slope/intercept/r² arithmetic is one fixed
    * IEEE double expression per term over those exact sums — bit-identical
    * across engines. Rank ties are impossible (row_number over count desc,
    * term asc is total).
    *
    * Output per group: `group`, `n_ranks` (≤ maxRank), `slope_micro`,
    * `intercept_micro`, `r2_micro` — micros as BIGINT; slope/intercept NULL
    * for a single-rank group (no x spread), r2 NULL when either variance
    * term is 0. NULL groups and token-less groups produce no row.
    *
    * Scale shape: ONE map-side-combined (group, term) count, a rank window
    * over the per-group VOCABULARY relation (never the corpus), the
    * maxRank cap bounding the fit relation, then one enum-bounded
    * aggregate. The corpus is scanned once.
    */
  def zipfFit(df: DataFrame, group: Column, text: Column,
      maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 2 && maxRank <= 100000,
      s"maxRank must be in [2,100000], got $maxRank")
    val counts = df.filter(group.isNotNull)
      .select(group.cast("string").as("g"), explode(tokens(text)).as("tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .withColumn("r", row_number().over(
        Window.partitionBy("g").orderBy(col("cnt").desc, col("tok"))))
      .filter(col("r") <= maxRank)
      .select(col("g"),
        round(log(col("r").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("cnt").cast("double")) * 1e6).cast("long").as("y"))
    val agg = ranked.groupBy("g")
      .agg(count(lit(1)).as("n_ranks"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    val nD = agg("n_ranks").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy")
    val denX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx")
    val denY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy")
    // slope/intercept are in micro-log space on both axes, so slope is the
    // dimensionless Zipf exponent scaled 1e6; intercept back-projects to
    // the ln-frequency micro intercept at rank 1 (x = 0)
    val slope = num / denX
    agg.select(col("g").as("group"), col("n_ranks"),
      when(denX > 0, round(slope * 1e6).cast("long")).as("slope_micro"),
      when(denX > 0, round((col("sy").cast("double") -
        slope * col("sx").cast("double")) / nD).cast("long"))
        .as("intercept_micro"),
      when(denX > 0 && denY > 0,
        round(num * num / (denX * denY) * 1e6).cast("long")).as("r2_micro"))
  }
}
