package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for LLM training-data pipelines (north-star
  * extensions): exact, MinHash+LSH, SimHash, and n-gram Jaccard — the standard
  * ladder from cheapest/strictest to fuzziest.
  *
  * Scale design: every variant is shuffle-bounded by a BLOCKING key (hash
  * bucket, LSH band, length band) so no operator ever compares all pairs.
  * At 100 TB the only all-data movements are (a) the exact-dedup hash shuffle
  * and (b) the LSH band-key shuffles — both single narrow shuffles with
  * map-side combine; candidate verification happens within buckets only.
  */
object Dedup {

  // ---------------------------------------------------------------- exact --

  /** Exact dedup: first row (by `keep` order) per sha256 of `key` survives.
    * groupBy-hash + min_by instead of a window: one shuffle, no sort, and the
    * combiner collapses duplicates map-side before they travel.
    *
    * `keep` must totally order rows WITHIN a duplicate set (a row id, a
    * timestamp+id struct): min_by ties are aggregation-order-dependent, so a
    * non-unique keep would pick a partitioning-dependent survivor.
    */
  def exact(df: DataFrame, key: Column, keep: Column): DataFrame = {
    val h = sha2(key, 256)
    df.withColumn("__h", h)
      .withColumn("__keep", keep)
      .groupBy(col("__h"))
      .agg(min_by(struct(df.columns.map(col): _*), col("__keep")).as("__row"),
        count(lit(1)).as("dup_count"))
      .select(col("__row.*"), col("dup_count"))
  }

  // -------------------------------------------------------------- minhash --

  /** Distinct token `n`-gram shingles of a text column, via the native
    * [[graft.functions.NGrams]] expression — the equivalent
    * `array_distinct(transform(sequence(...), i => concat_ws(" ", slice(...))))`
    * HOF tree runs interpreted and measured ~4× the cost of the entire
    * downstream LSH join; shingling is the hot path of every near-dup op.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.NGrams.ngrams(TextAnalysis.tokens(text), n)

  /** MinHash signature: `k` permutations simulated by seeded xxhash64
    * (the standard "one hash, k seeds" construction), via the native
    * [[graft.functions.MinHashSig]] expression — one string hash + k
    * constant-time mixes per shingle, one allocation per row.
    *
    * History of this shape (each step measured): naive
    * `transform(seeds, s => array_min(transform(shingles, ...)))` inlines the
    * whole shingle construction per seed (30× slower at k=32); the
    * single-pass `aggregate`/`zip_with` fixed that but still ran interpreted
    * with a k-wide array allocation per shingle; the native expression keeps
    * the same output values (Spark's `xxhash64(s, seed)` chain re-derived
    * in-loop) with none of that.
    */
  def minhashSignature(shingleArr: Column, k: Int = 32): Column =
    graft.functions.MinHashSig.minhashSig(shingleArr, k)

  /** Pick `(bands, rows)` for a k-wide MinHash signature so the LSH
    * S-curve's midpoint `(1/b)^(1/r)` (the similarity at which collision
    * probability `1−(1−s^r)^b` crosses ~½) lands closest to `threshold` —
    * the calculation every [[minhashPairs]] caller otherwise does by hand.
    * Deterministic tie-break toward MORE bands (recall over precision: a
    * missed true pair is unrecoverable, a false candidate dies in the
    * verify). Pure arithmetic over the ≤ d(k) divisors of k — no data.
    */
  def lshBandPlan(k: Int, threshold: Double): (Int, Int) = {
    require(k >= 2 && k <= 4096, s"k must be in [2,4096], got $k")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    val candidates = (1 to k).filter(k % _ == 0).map { b =>
      val r = k / b
      (b, r, math.pow(1.0 / b, 1.0 / r))
    }
    val best = candidates.minBy { case (b, _, mid) =>
      (math.abs(mid - threshold), -b)
    }
    (best._1, best._2)
  }

  /** The auditable twin of [[lshBandPlan]]: the full LSH S-curve, as data.
    * One row per (bands, rows) factorization of `k` and per probe similarity
    * on the `stepPermille` grid, carrying the collision probability
    * `1−(1−s^r)^b` in micro units plus the per-plan decision columns — the
    * expected false-positive mass (Σ p below the threshold), the
    * false-negative mass (Σ (1−p) at/above it), and a `chosen` flag.
    *
    * Engine-stable float contract: NO libm call. Both powers are LEFT-FOLD
    * repeated multiplications (`aggregate(sequence(1,n), 1.0, acc·x)`) — a
    * fixed chain of IEEE multiplies any engine reproduces bit-for-bit,
    * unlike `pow`, which is not correctly rounded. Each curve point rounds
    * to micro ONCE; the masses are integer sums of those micros, and
    * `chosen` minimizes the integer distance `|p(threshold) − 500000|`
    * (tie → more bands) — the grid-discrete equivalent of [[lshBandPlan]]'s
    * midpoint rule, decided on exact integers.
    *
    * Scale shape: pure generated relation, d(k)·(1000/step − 1) rows, no
    * input scan — the planning artifact you compute once before pointing
    * [[minhashPairs]] at 100 TB.
    */
  def lshPlanAudit(spark: org.apache.spark.sql.SparkSession, k: Int,
      thresholdPermille: Int, stepPermille: Int = 50): DataFrame = {
    require(k >= 2 && k <= 4096, s"k must be in [2,4096], got $k")
    require(stepPermille >= 1 && stepPermille < 1000,
      s"stepPermille must be in [1,1000), got $stepPermille")
    require(thresholdPermille % stepPermille == 0 &&
      thresholdPermille >= stepPermille &&
      thresholdPermille <= 1000 - stepPermille,
      s"threshold ($thresholdPermille‰) must sit on the interior probe grid")
    import spark.implicits._
    val cand = k.to(1, -1).filter(k % _ == 0).map(b => (b, k / b))
      .toDF("b", "r")
    val curve = cand
      .select(col("b"), col("r"), explode(sequence(lit(stepPermille),
        lit(1000 - stepPermille), lit(stepPermille))).as("s_permille"))
      .withColumn("__s", col("s_permille").cast("double") / 1000.0)
      .withColumn("__sr", aggregate(sequence(lit(1), col("r")),
        lit(1.0), (acc, _) => acc * col("__s")))
      .withColumn("__p", lit(1.0) - aggregate(sequence(lit(1), col("b")),
        lit(1.0), (acc, _) => acc * (lit(1.0) - col("__sr"))))
      .withColumn("p_collide_micro", round(col("__p") * 1e6).cast("long"))
      .drop("__s", "__sr", "__p")
    val t = lit(thresholdPermille)
    val plan = curve.groupBy("b", "r").agg(
      max(when(col("s_permille") === t, col("p_collide_micro")))
        .as("p_at_t_micro"),
      sum(when(col("s_permille") < t, col("p_collide_micro"))
        .otherwise(lit(0L))).as("fp_mass_micro"),
      sum(when(col("s_permille") >= t, lit(1000000L) - col("p_collide_micro"))
        .otherwise(lit(0L))).as("fn_mass_micro"))
    val best = broadcast(plan.select(min(struct(
        abs(col("p_at_t_micro") - 500000L).as("d"), (-col("b")).as("nb")))
      .as("m")).select((-col("m.nb")).as("__best_b")))
    curve.join(broadcast(plan), Seq("b", "r"))
      .crossJoin(best)
      .withColumn("chosen", col("b") === col("__best_b"))
      .drop("__best_b")
  }

  /** Banded-LSH candidate pairs with MinHash-estimated Jaccard ≥ `threshold`.
    *
    * bands×rows = k; two docs collide iff some band of their signatures is
    * identical — the classic S-curve knob. The self-join is on the band-bucket
    * key, so comparisons happen only inside buckets. Pair (a,b) kept once
    * (a<b), ordered deterministically.
    */
  /** Sketch-table lifecycle shared by the three pair generators. The sketch
    * (signature / simhash / shingle table) is referenced by several join
    * branches, so it must be cached for the solve or every branch re-runs the
    * corpus scan. Two caller-selectable contracts:
    *
    *  - `materialize = true` (default, leak-safe): the sketch is `persist`ed,
    *    the corpus-sparse pair set is EAGERLY materialized via
    *    `localCheckpoint` (a Spark job runs at call time), and the persist is
    *    released in `finally`. The returned DataFrame holds only GC-owned
    *    checkpoint blocks (reclaimed by the ContextCleaner once the caller
    *    drops it) — a long-lived application can never accumulate sketch
    *    tables in cache (the round-4 bench-tail collapse). Cost: callers'
    *    filters/limits no longer push into pair generation, and a
    *    single-consumer pipeline pays one up-front materialization.
    *  - `materialize = false` (lazy composition): returns the UNEXECUTED plan;
    *    the sketch is a lazily-localCheckpointed intermediate, computed once
    *    on first action and shared by all branches, with blocks owned by the
    *    GC rather than the CacheManager — no unpersist obligation, no
    *    application-lifetime pin. Use for single-consumer pipelines at scale
    *    where an unconditional eager pair materialization is a real cost;
    *    note each NEW action on the result re-runs the post-sketch join work.
    */
  private def withSketchCache(sketch: DataFrame, materialize: Boolean)(
      build: DataFrame => DataFrame): DataFrame =
    if (materialize) {
      val cached = sketch.persist(StorageLevel.MEMORY_AND_DISK)
      try build(cached).localCheckpoint()
      finally cached.unpersist(false)
    } else build(sketch.localCheckpoint(eager = false))

  /** `maxBucketSize` is the skew guard: a band bucket larger than it is
    * dropped (with min-hash, corpora with globally-common shingles concentrate
    * the minimum onto those shingles, producing degenerate everything-matches
    * buckets whose self-join is quadratic noise — a bucket that big carries no
    * discriminative signal). Pair generation is ids-only and deduped BEFORE
    * signatures are joined back, so the 32-wide estimate math runs once per
    * candidate pair, not once per (pair × colliding band).
    *
    * `materialize` selects eager-checkpointed (default) vs lazy composition —
    * see [[withSketchCache]] for the exact contract of each.
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.5,
      maxBucketSize: Int = 1000, materialize: Boolean = true): DataFrame = {
    require(k % bands == 0,
      s"bands ($bands) must divide k ($k): integer rows-per-band would " +
        "silently leave trailing signature positions out of every band")
    val rows = k / bands
    // r17: the signature pass (shingles + k-seed MinHash, this op's hot
    // loop) runs scan-side — Fanout.forCpu floors its parallelism at
    // defaultParallelism when the input file splits narrower (no-op at
    // scale; see Fanout). Per-row sketch, order-independent downstream.
    withSketchCache(
      graft.ops.Fanout.forCpu(df.select(id.as("id"), text.as("__txt")))
        .select(col("id"), minhashSignature(shingles(col("__txt"))).as("sig")),
      materialize) { sig =>
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + lit(1), lit(rows))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val okBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucketSize)
      .drop("__n")
    val inBucket = banded.join(okBuckets, Seq("band", "bucket"))
    val pairs = inBucket.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(inBucket.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // same pair can collide in several bands
    pairs
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    }
  }

  /** Directional CONTAINMENT pairs — `|A∩B| / min(|A|,|B|)` over n-gram
    * shingle sets — the quote/subset detector Jaccard structurally misses: a
    * 50-shingle quote inside a 5000-shingle article has Jaccard ≤ 0.01 but
    * containment 1.0. Same blocked self-join + sketch lifecycle as
    * [[ngramJaccardPairs]] (array path; containment's asymmetric-size pairs
    * are exactly the ones a shared dictionary bitset helps least).
    *
    * Blocking caveat, because it differs from the Jaccard operator: do NOT
    * put a length band in `block` — containment pairs documents of very
    * DIFFERENT lengths by design, so banding would drop precisely the pairs
    * the operator exists to find. Block on language/domain-shaped keys and
    * size them so buckets stay thousands (the same quadratic-term contract
    * as every blocked self-join here).
    */
  def containmentPairs(df: DataFrame, id: Column, text: Column, block: Column,
      n: Int = 2, threshold: Double = 0.8,
      materialize: Boolean = true): DataFrame = {
    withSketchCache(
      df.select(id.as("id"), block.as("block"), shingles(text, n).as("sh")),
      materialize) { sh =>
      val l = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
      val r = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
      l.join(r, Seq("block"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("containment", round(col("inter").cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))), 6))
        .filter(col("containment") >= threshold)
        .select("id_a", "id_b", "inter", "containment")
    }
  }

  /** [[containmentPairs]] for an explicit query set against a corpus — the
    * production shape of quote detection ("is any of these N documents
    * quoted inside the corpus?"): the query sketch table is query-scale and
    * BROADCASTS, the corpus is scanned once and never shuffled, and the
    * pair count is |queries| × block-size instead of block-size². Directional
    * output (id_a = query, id_b = corpus doc), self-pairs dropped.
    */
  def containmentPairsAgainst(queries: DataFrame, corpus: DataFrame,
      id: Column, text: Column, block: Column,
      n: Int = 2, threshold: Double = 0.8): DataFrame = {
    val l = broadcast(queries.select(block.as("block"), id.as("id_a"),
      shingles(text, n).as("sh_a")))
    val r = corpus.select(block.as("block"), id.as("id_b"),
      shingles(text, n).as("sh_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("containment", round(col("inter").cast("double") /
        least(size(col("sh_a")), size(col("sh_b"))), 6))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "inter", "containment")
  }

  // -------------------------------------------------------------- simhash --

  /** 64-bit SimHash over token shingles, as one LONG sketch. Backed by the
    * native [[graft.functions.SimHash64]] Catalyst expression: one xxhash per
    * shingle with all 64 bit-counters updated in a tight JVM loop — the
    * Column-API formulation needed a seeded hash per BIT (no variable shifts
    * in HOF lambdas), 64× the hash work.
    */
  def simhash(text: Column): Column =
    graft.functions.SimHash64.simhash64(shingles(text, 2))

  /** Hamming distance between two sketches. */
  def simhashDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with Hamming distance ≤ `maxDist` via pigeonhole
    * blocking: 64 bits split into `nChunks` equal chunks; candidates share at
    * least one exact chunk.
    *
    * Completeness guarantee: a pair at distance d is ALWAYS generated iff
    * d < nChunks (pigeonhole — d flipped bits can't touch all chunks). For
    * maxDist ≥ nChunks the op is a recall-limited candidate generator (pairs
    * whose differing bits hit every chunk are missed); raising nChunks
    * restores completeness at the price of smaller, more collision-prone
    * chunks (quadratic buckets when chunks get too narrow — 4 chunks of 16
    * bits is the standard operating point for near-dup distances ≤ 3).
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column, maxDist: Int = 3,
      maxBucketSize: Int = 2000, nChunks: Int = 4,
      materialize: Boolean = true): DataFrame = {
    require(Set(2, 4, 8, 16, 32).contains(nChunks), s"nChunks must divide 64 evenly, got $nChunks")
    require(maxDist >= 0 && maxDist <= 63)
    // sketch table feeds banding + the pair join-back — same caller-selectable
    // lifecycle contract as minhashPairs (see withSketchCache)
    // r17: scan-side sketch pass floored at defaultParallelism (see
    // minhashPairs / Fanout for the rationale and the at-scale no-op)
    withSketchCache(
      graft.ops.Fanout.forCpu(df.select(id.as("id"), text.as("__txt")))
        .select(col("id"), simhash(col("__txt")).as("sk")),
      materialize) { sk =>
    val bits = 64 / nChunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    val chunk = (c: Column, i: Int) => shiftright(c, i * bits).bitwiseAND(lit(mask))
    val chunked = sk.select(col("id"),
      posexplode(array((0 until nChunks).map(i => chunk(col("sk"), i)): _*)))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk_val")
    val okBuckets = chunked.groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucketSize)
      .drop("__n")
    val inBucket = chunked.join(okBuckets, Seq("chunk_idx", "chunk_val"))
    // ids-only dedup before the (cheap but wide) distance math
    val pairs = inBucket.select(col("chunk_idx"), col("chunk_val"), col("id").as("id_a"))
      .join(inBucket.select(col("chunk_idx"), col("chunk_val"), col("id").as("id_b")),
        Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(sk.select(col("id").as("id_a"), col("sk").as("sk_a")), Seq("id_a"))
      .join(sk.select(col("id").as("id_b"), col("sk").as("sk_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), simhashDistance(col("sk_a"), col("sk_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
    }
  }

  // ------------------------------------------------------- n-gram jaccard --

  /** Exact n-gram Jaccard pairs within a blocking key (same block only — the
    * caller picks blocks that bound bucket size, e.g. lang × length band).
    *
    * Pair generation is the block-bounded self-join either way (the blocking
    * key bounds the quadratic term: at 100 TB you size blocks — lang ×
    * length-band × LSH-prefilter — so buckets stay thousands, not millions).
    * The per-pair VERIFY is gated on the MEASURED shingle vocabulary
    * (one bounded probe job on the cached sketch, the same measure-then-pick
    * idiom as [[resolveClusters]]' skew gate and [[connectedComponents]]'
    * size cutover):
    *
    *  - vocab ≤ `maxDictVocab` (enum-ish corpora: codes, tags, synthetic
    *    word-soup — where blocks are dense and the quadratic term bites
    *    hardest): each shingle set becomes a ⌈vocab/64⌉-word BITSET via a
    *    broadcast dictionary join, and |∩| is the native codegen'd
    *    [[graft.functions.BitsetIntersectCount]] popcount(AND) loop —
    *    constant-time per pair instead of `array_intersect`'s per-pair string
    *    hash-set build. Value-identical output: |∩| and the set sizes are the
    *    same integers, so the rounded Jaccard double is bit-equal (pinned by
    *    ExtensionsSpec on both paths).
    *  - larger vocab: `array_intersect` on the sorted shingle arrays, as
    *    before. (A token-level explode-equi-join would shuffle less for very
    *    SELECTIVE shingles, but degenerates to |bucket|²·|vocab| rows on
    *    shared vocabularies — the array form keeps worst-case |bucket|² with
    *    O(|A|+|B|) per pair.)
    *
    * `maxDictVocab = 0` forces the array path. The vocabulary probe runs
    * eagerly at call time in BOTH materialize modes; under
    * `materialize = false` it doubles as the lazily-checkpointed sketch's
    * first action, so the corpus scan still happens exactly once.
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column, block: Column,
      n: Int = 3, threshold: Double = 0.3,
      materialize: Boolean = true, maxDictVocab: Int = 4096): DataFrame = {
    // both self-join sides read the shingle table — same caller-selectable
    // lifecycle contract as minhashPairs (see withSketchCache)
    withSketchCache(
      df.select(id.as("id"), block.as("block"), shingles(text, n).as("sh")),
      materialize) { sh =>
      // limit+collect bounds the probe at maxDictVocab+1 rows regardless of
      // true vocabulary size — the driver never holds an unbounded dictionary
      val dict: Array[String] =
        if (maxDictVocab <= 0) Array.empty
        else sh.select(explode(col("sh")).as("tok")).distinct()
          .limit(maxDictVocab + 1).collect().map(_.getString(0))
      val jaccardOf = (inter: Column, szA: Column, szB: Column) =>
        round(inter.cast("double") / (szA + szB - inter), 6)
      if (maxDictVocab > 0 && dict.length <= maxDictVocab) {
        val spark = df.sparkSession
        import spark.implicits._
        val nWords = math.max(1, (dict.length + 63) / 64)
        // sorted for deterministic bit positions (layout only — |∩| is
        // position-independent)
        val dictDf = dict.sorted.zipWithIndex.toSeq.toDF("tok", "pos")
        val masks = sh.select(col("id"), col("block"), explode(col("sh")).as("tok"))
          .join(broadcast(dictDf), Seq("tok"))
          .groupBy(col("id"), col("block"))
          .agg(collect_list(col("pos")).as("ps"))
          // ps is distinct (shingle sets are), so size(ps) IS the set size;
          // the mask build is the native one-pass BitsetFromPositions — the
          // equivalent transform/aggregate/filter HOF tree ran interpreted
          // and O(nWords × |ps|), re-scanning the positions for every word
          // (pinned value-identical by NativeExprEquivalenceSpec)
          .select(col("id"), col("block"), size(col("ps")).as("sz"),
            graft.functions.BitsetFromPositions
              .bitsetFromPositions(col("ps"), nWords).as("m"))
        val l = masks.select(col("block"), col("id").as("id_a"),
          col("sz").as("sz_a"), col("m").as("ma"))
        val r = masks.select(col("block"), col("id").as("id_b"),
          col("sz").as("sz_b"), col("m").as("mb"))
        // the mask relation sits behind two exchanges, so Spark has no size
        // estimate and would fall back to sort-merge; the engine shape for a
        // block-bounded self-join is the sortless shuffled hash join (build
        // side = one block's masks, bounded by the caller's blocking contract)
        l.join(r.hint("shuffle_hash"), Seq("block"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("inter", graft.functions.BitsetIntersectCount
            .bitsetIntersectCount(col("ma"), col("mb")))
          .withColumn("jaccard", jaccardOf(col("inter"), col("sz_a"), col("sz_b")))
          .filter(col("jaccard") >= threshold)
          .select("id_a", "id_b", "inter", "jaccard")
      } else {
        val l = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
        val r = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
        l.join(r, Seq("block"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("jaccard",
            jaccardOf(col("inter"), size(col("sh_a")), size(col("sh_b"))))
          .filter(col("jaccard") >= threshold)
          .select("id_a", "id_b", "inter", "jaccard")
      }
    }
  }

  // ----------------------------------------------------- cluster resolution --

  /** Connected components over candidate pairs: `(id_a, id_b)` edges →
    * `(id, component)` where `component` is the minimum id in the component.
    * This is the step every production near-dup pipeline needs after pair
    * generation — near-dup is transitive in intent (A≈B, B≈C ⇒ one cluster)
    * even though the estimator isn't.
    *
    * Algorithm: min-label propagation + pointer jumping. Each round
    *  1. label(v) ← min(label(v), min of neighbors' labels)   (edge join + agg)
    *  2. label(v) ← label(label(v))                           (pointer jump)
    * Step 2 doubles the distance a minimum travels per round, so convergence
    * is O(log n) rounds even on the path-graph worst case where plain
    * neighbor-min needs O(diameter). Each round is a constant number of
    * key-partitioned shuffles over `(id, label)` pairs — 16 bytes of state per
    * vertex, nothing all-pairs, no driver-side data except the 1-row
    * convergence aggregate.
    *
    * `localCheckpoint` truncates the growing lineage each round (iterative
    * DataFrame loops otherwise replan from scratch every iteration); on a
    * long-lived production cluster prefer `spark.sparkContext.setCheckpointDir`
    * + reliable `checkpoint()` so executor loss can't orphan the loop.
    *
    * Convergence detection: labels are non-increasing per vertex, so the
    * label sum (decimal — no overflow) is strictly decreasing until fixpoint;
    * equal sums ⇒ done. Labels at fixpoint are constant within a component
    * (every edge forces label equality) and the component min labels itself.
    *
    * Small-graph fast path: near-dup edge sets are corpus-sparse (orders of
    * magnitude below document count), so the measured edge count usually sits
    * far under `localEdgeThreshold` — then the whole solve is ONE single-task
    * union-find pass (path compression + union-by-min-root, O(E α(E))) instead
    * of an iterative loop whose per-round job-scheduling overhead dominates at
    * small edge counts. This is the connected-components analogue of a
    * broadcast-join threshold: a measured-size cutover between a local and a
    * distributed strategy, with the distributed propagation kept for graphs
    * that genuinely exceed one task's memory. At the default 8M-edge cutover
    * the union-find state is ~400 MB of LongMap — comfortable in an executor.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 64,
      localEdgeThreshold: Long = 8L * 1000 * 1000): DataFrame =
    componentsWithCount(pairs, idA, idB, maxIter, localEdgeThreshold)._1

  /** [[connectedComponents]] plus the measured symmetric-edge count, which
    * [[resolveClusters]] uses to decide broadcast-vs-shuffle for the
    * corpus-side component join (checkpointed relations carry no stats, so
    * Spark can't make that call itself). */
  private def componentsWithCount(pairs: DataFrame, idA: String, idB: String,
      maxIter: Int, localEdgeThreshold: Long): (DataFrame, Long) = {
    val edges = pairs.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = sym.count() // materializes the persist; drives the cutover
    if (edgeCount <= localEdgeThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      // union-by-min-root keeps the invariant "root of a tree = min id in the
      // tree" (induction: singletons trivially; a merge roots at min(ra, rb) =
      // min of the union), so the final find(v) IS the component minimum —
      // identical labeling to the propagation path, pinned by ExtensionsSpec.
      val labeled = sym.as[(Long, Long)].coalesce(1).mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var r = x0
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var y = x0
          while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = r; y = n }
          r
        }
        it.foreach { case (a, b) =>
          // register both endpoints: a never-merged root must still emit a row
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        // freeze the key set first: find() path-compresses (mutates values)
        // and LongMap iteration is not mutation-safe
        val keys = parent.keysIterator.toArray
        val roots = new Array[(Long, Long)](keys.length)
        var i = 0
        while (i < keys.length) { roots(i) = (keys(i), find(keys(i))); i += 1 }
        // nodes seen only as self-loop endpoints never entered parent — but
        // sym filtered self-loops, so every parent key is a real edge endpoint
        roots.iterator
      }.toDF("id", "component").localCheckpoint()
      sym.unpersist()
      return (labeled, edgeCount)
    }
    // initialization folds the first neighbor-min round into one aggregate:
    // label(v) = min(v, min of neighbors) — no join needed while labels = ids
    var labels = sym.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint()
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var done = labels.isEmpty
    while (iter < maxIter && !done) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nbr_label")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("nbr_label").as("nbr_label"))
      val merged = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer jump: label(v) ← label(label(v)); labels are vertex ids, so
      // the lookup is a self-join on the same 16-byte relation
      val jumped = merged
        .join(merged.select(col("id").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
      val next = jumped.localCheckpoint()
      val s = next.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      done = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    sym.unpersist()
    (labels.select(col("id"), col("label").as("component")), edgeCount)
  }

  /** Full cluster resolution: rows + candidate pairs → every row tagged with
    * `component`, `cluster_size`, and `is_survivor` (exactly one survivor per
    * cluster, minimum `keep` with id tie-break — same keep contract as
    * [[exact]]). Rows in no pair are singleton clusters of themselves.
    *
    * Shape is SKEW-GATED on the measured largest cluster (a pair-scale
    * aggregate over the component map — the corpus is never touched to decide):
    *
    *  - Moderate clusters (max member count ≤ `maxWindowedClusterSize`):
    *    survivor election + size run as WINDOW aggregates over the component —
    *    ONE component-keyed shuffle and a single corpus pass. The unbounded
    *    frame keeps O(1) aggregate state but `WindowExec` BUFFERS each
    *    cluster's rows in one task's (spillable) row buffer before emitting,
    *    so the gate bounds that buffer.
    *  - Mega clusters (duplicate storms — exactly what dedup meets at
    *    production scale): per-component stats via a map-side-combining
    *    `groupBy` (partial aggregation collapses the hot key on every input
    *    partition; no row buffering) joined back on `component` — a shuffle
    *    join AQE can skew-split, which it cannot do for a window partition.
    *    The two passes over the tagged corpus share one lazily
    *    local-checkpointed computation (GC-owned blocks, no persist pin), so
    *    the "corpus twice" cost of the old join-back shape is gone.
    *
    * Measured (tools/ProbeSkewClusters, 8M rows with one 4M-member component,
    * local[32]): both shapes complete; the groupBy shape is ~2× faster cold
    * (31 s vs 64 s — the window's single hot task spills its buffer) and
    * within noise warm. The gate's default errs toward the window (one corpus
    * pass) until the buffer a single task would hold stops being trivially
    * spillable; ExtensionsSpec pins the two shapes row-identical.
    */
  def resolveClusters(df: DataFrame, id: Column, keep: Column, pairs: DataFrame,
      maxWindowedClusterSize: Long = 4L * 1000 * 1000): DataFrame = {
    // The component relation's size was measured inside the solve, so pick the
    // join strategy from data, not hope: a sparse edge set (≤ ~1M sym edges →
    // ≤ 2M component rows, ~50 MB) broadcasts, and the corpus-side tagging
    // join costs ZERO shuffles of the corpus. Bigger graphs take a shuffled
    // HASH join — hinted, because the checkpointed component relation carries
    // no stats and Spark would fall back to a sort-merge join (two wasted
    // data-scale sorts) without it.
    val (comps0, edgeCount) = componentsWithCount(pairs, "id_a", "id_b",
      maxIter = 64, localEdgeThreshold = 8L * 1000 * 1000)
    val comps = if (edgeCount <= 1000 * 1000) broadcast(comps0)
                else comps0.hint("shuffle_hash")
    // Largest non-singleton cluster, measured on the PAIR-scale component map
    // (singletons never enter comps0 and are size 1 by construction).
    val maxCluster: Long =
      if (edgeCount == 0) 1L
      else comps0.groupBy("component").count()
        .agg(max(col("count"))).head().getLong(0)
    val tagged = df
      .withColumn("__id", id.cast("long"))
      .withColumn("__keep", keep)
      .join(comps.select(col("id").as("__id"), col("component")), Seq("__id"), "left")
      .withColumn("component", coalesce(col("component"), col("__id")))
    val resolved =
      if (maxCluster <= maxWindowedClusterSize) {
        val w = Window.partitionBy(col("component"))
        tagged
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_survivor", col("__id") ===
            min_by(col("__id"), struct(col("__keep"), col("__id"))).over(w))
      } else {
        // lazy checkpoint: both the stats pass and the join-back read the same
        // materialized tagged corpus (blocks GC-reclaimed with the plan)
        val t = tagged.localCheckpoint(eager = false)
        val stats = t.groupBy(col("component")).agg(
          count(lit(1)).as("cluster_size"),
          min_by(col("__id"), struct(col("__keep"), col("__id"))).as("__survivor"))
        t.join(stats.hint("shuffle_hash"), Seq("component"))
          .withColumn("is_survivor", col("__id") === col("__survivor"))
          .drop("__survivor")
      }
    resolved
      .drop("__id", "__keep")
      .select((col("component") +: df.columns.map(col)) ++
        Seq(col("cluster_size"), col("is_survivor")): _*)
  }

  /** One row per cluster — the dataset a training run actually consumes. */
  def clusterSurvivors(df: DataFrame, id: Column, keep: Column, pairs: DataFrame): DataFrame =
    resolveClusters(df, id, keep, pairs)
      .filter(col("is_survivor"))
      .drop("is_survivor")

  /** The full near-dup dedup pipeline in one call — MinHash-LSH candidate
    * pairs → connected components → one survivor per cluster. This is the
    * operator a corpus pipeline actually invokes; the pieces stay public for
    * pipelines that need the pairs or cluster map themselves.
    */
  def nearDupDedup(df: DataFrame, id: Column, text: Column, keep: Column,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame =
    clusterSurvivors(df, id, keep,
      minhashPairs(df, id, text, k, bands, threshold).select("id_a", "id_b"))

  // ---------------------------------------------------------- line dedup --

  /** Cross-document LINE dedup — the RefinedWeb/MassiveText boilerplate
    * remover: any line whose text appears in more than `maxDocFreq` DISTINCT
    * documents is removed from every document (all occurrences — a line that
    * repeats across documents is navigation/footer/license boilerplate, not
    * content worth electing a survivor for; contrast [[SpanDedup]], which
    * keeps one canonical occurrence of duplicated SPANS). Remaining lines
    * are reassembled in original order.
    *
    * `sep` is the LITERAL unit separator (split and reassembly both use it
    * verbatim — no regex). The default `"\n"` gives classic line dedup; a
    * single space turns the unit into the token, which makes this the
    * document-frequency stopword/boilerplate pruner (drop tokens present in
    * more than `maxDocFreq` documents) with identical machinery.
    *
    * Output: one row per input row — (id, n_lines, n_removed, text_clean);
    * a document whose every line is boilerplate keeps an empty string.
    *
    * Scale shape: lines are exploded scan-side with their position; the
    * frequency table groups on a 64-hex sha of the line (fixed-width shuffle
    * key — the line text itself never keys a shuffle), counting DISTINCT
    * documents so in-document repetition doesn't inflate the frequency; the
    * line⋈frequency join is a shuffle_hash equi-join on that key (both sides
    * are line-scale and stat-less — unhinted it would sort-merge); the
    * reassembly is one groupBy(id) whose collect_list buffers a document's
    * own lines, bounded by max document size like every whole-doc operator
    * here.
    */
  def lineDedup(df: DataFrame, id: Column, text: Column,
      maxDocFreq: Int = 1, sep: String = "\n"): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be at least 1")
    require(sep.nonEmpty, "sep must be a non-empty literal separator")
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = df.select(id.as("id"), posexplode(split(text, sepRe)).as(Seq("pos", "line")))
      .withColumn("__lk", sha2(col("line"), 256))
    val freq = lines.select(col("id"), col("__lk")).distinct()
      .groupBy("__lk").agg(count(lit(1)).as("__docs"))
    val kept = lines
      .join(freq.hint("shuffle_hash"), Seq("__lk"))
      .filter(col("__docs") <= maxDocFreq)
      .groupBy("id")
      .agg(count(lit(1)).as("__n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), sep).as("text_clean"))
    df.select(id.as("id"), size(split(text, sepRe)).cast("long").as("n_lines"))
      .join(kept.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** EXACT threshold Jaccard similarity join via prefix filtering (the
    * PPJoin family, Chaudhuri et al. 2006 / Xiao et al. 2008) — the
    * LOSSLESS counterpart to [[minhashPairs]]: returns precisely the pairs
    * with token-set Jaccard ≥ t, no LSH false negatives, without the
    * all-pairs product.
    *
    * The filter: order every document's distinct tokens by ascending global
    * document frequency (rarest first, ties by token — one total order for
    * the whole corpus), and index only each doc's PREFIX of length
    * `|d| − ⌈t·|d|⌉ + 1`. Any pair with overlap ≥ ⌈t·|d|⌉ (implied by
    * J ≥ t) must share a prefix token — pigeonhole on the suffix — so
    * joining on prefix tokens loses nothing, while candidates concentrate
    * on RARE tokens (a stopword shared by half the corpus never lands in a
    * prefix at realistic t). The length filter `t·|a| ≤ |b| ∧ t·|b| ≤ |a|`
    * (J ≤ min/max) prunes before verification; threshold arithmetic is
    * integral (`thresholdPct`), the emitted jaccard a round-6 double.
    *
    * Scale design: one token-keyed shuffle builds the DF table; the per-doc
    * prefix needs only a `sort_array` of the doc's own (df, token) structs
    * — no global rank window. Candidates shuffle on prefix tokens (bounded
    * fan-out per RARE token), verification is one `array_intersect` per
    * surviving candidate against the checkpointed sorted-token relation.
    */
  def prefixJaccardPairs(df: DataFrame, id: Column, text: Column,
      thresholdPct: Int = 70, n: Int = 1): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 100,
      s"thresholdPct must be in [1,100], got $thresholdPct")
    require(n >= 1 && n <= 16, s"shingle size must be in [1,16], got $n")
    val t = thresholdPct.toLong
    // only full n-windows participate (docs under n tokens are excluded —
    // the one-short-shingle edge would make all tiny docs mutual near-dups);
    // n > 1 is also what makes the prefix filter BITE on small-vocabulary
    // corpora: unigram DF is flat there, n-gram DF is long-tailed
    //
    // r17: shingling is this op's heaviest per-row work and it sits
    // scan-side, so its parallelism was the INPUT FILE's split count (one
    // task on a single-row-group bench file — measured 31/32 cores idle).
    // Fanout.forCpu floors it at defaultParallelism; a no-op whenever the
    // scan already splits wide. Projected to (id, text) first so the
    // conditional exchange never carries more than the two columns the
    // shingle pass needs (guide §2.3). Downstream is groupBy/sorted-agg —
    // value-independent of partitioning.
    val src = graft.ops.Fanout.forCpu(
      df.select(id.as("id"), text.as("__txt")))
    val toks = src
      .filter(size(TextAnalysis.tokens(col("__txt"))) >= n)
      .select(col("id"), explode(shingles(col("__txt"), n)).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("__df"))
    val sorted = toks.join(dfreq.hint("shuffle_hash"), Seq("tok"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__df"), col("tok")))).as("__st"))
      .select(col("id"),
        transform(col("__st"), s => s.getField("tok")).as("toks"),
        size(col("__st")).cast("long").as("sz"))
      .localCheckpoint(eager = false)   // prefix explode + both verify sides
    // prefix length |d| − ⌈t·|d|⌉ + 1  (integral ceil; ≥ 1 whenever sz ≥ 1).
    // floor() is REQUIRED: Column `/` is double division, and the bare
    // quotient fed to slice() used to truncate the whole expression — a
    // one-token-short prefix that silently broke the losslessness theorem
    // (sf0.001 caught pair (33,436): shared prefix token at exactly the
    // boundary position the shortened prefix dropped).
    val prefLen =
      col("sz") - floor((lit(t) * col("sz") + 99L) / 100L).cast("long") + 1L
    // r18 (VERDICT #8, guide §3 join-input reduction), two lossless cuts to
    // the candidate stage feeding the CPU-bound array_intersect verify:
    //  1. POSITIONAL prefix filter (ppjoin, Xiao et al.): for a true pair,
    //     its FIRST common token minimizes the (0-based) position in BOTH
    //     sorted arrays, so overlap ≤ min(sz_l − pos_l, sz_r − pos_r) holds
    //     there; jaccard ≥ t/100 ⟺ overlap·(100+t) ≥ t·(sz_l+sz_r). A pair
    //     is kept if ANY matching token passes the bound — the first common
    //     token gives the loosest bound, so every qualifying pair survives
    //     (keep-if-any ⊇ keep-at-first-match); integer arithmetic, exact.
    //  2. candidates join on xxhash64(tok), not the shingle STRING — 8
    //     bytes per row through the self-join exchange instead of the
    //     n-gram text (§2.3). Hash collisions only ADD candidates; the
    //     exact verify below removes them, so the output pair set is
    //     unchanged either way.
    val pre = sorted.select(col("id"), col("sz"),
        posexplode(slice(col("toks"), lit(1), prefLen.cast("int")))
          .as(Seq("__pos", "tok")))
      .select(col("id"), col("sz"), col("__pos").cast("long").as("__pos"),
        xxhash64(col("tok")).as("__th"))
    val cand = pre.as("l").join(pre.as("r").hint("shuffle_hash"), Seq("__th"))
      .filter(col("l.id") < col("r.id") &&
        col("l.sz") * t <= col("r.sz") * 100L &&
        col("r.sz") * t <= col("l.sz") * 100L &&
        least(col("l.sz") - col("l.__pos"), col("r.sz") - col("r.__pos")) *
          (100L + t) >= lit(t) * (col("l.sz") + col("r.sz")))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    cand
      .join(sorted.select(col("id").as("id_a"), col("toks").as("__ta"),
        col("sz").as("__sza")).hint("shuffle_hash"), Seq("id_a"))
      .join(sorted.select(col("id").as("id_b"), col("toks").as("__tb"),
        col("sz").as("__szb")).hint("shuffle_hash"), Seq("id_b"))
      .withColumn("__inter",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .filter(col("__inter") * 100L >=
        lit(t) * (col("__sza") + col("__szb") - col("__inter")))
      .select(col("id_a"), col("id_b"),
        round(col("__inter").cast("double") /
          (col("__sza") + col("__szb") - col("__inter")), 6).as("jaccard"))
  }

  // ------------------------------------------- edit-distance fuzzy pairs --

  /** All ≤`maxDist`-deletion variants of `s` (the string itself included),
    * built with pure codegen'd HOFs: variant i drops character i. */
  private def delVariants(s: Column, maxDist: Int, maxLen: Int): Column = {
    def del1(x: Column): Column =
      transform(sequence(lit(0), length(x) - 1), i =>
        concat(x.substr(lit(1), i), x.substr(i + lit(2), lit(maxLen + 2))))
    val v1 = del1(s)
    val all =
      if (maxDist == 1) concat(array(s), v1)
      else concat(array(s), v1, flatten(transform(v1, v => del1(v))))
    array_distinct(all)
  }

  /** Fuzzy-pair join on short keys (names, titles, codes): every id pair
    * whose keys are within Levenshtein distance [`minDist`, `maxDist`] —
    * record linkage's "same thing, typo'd" relation. EXACT, not approximate:
    * two strings within edit distance d always share a common ≤d-deletion
    * variant (delete the edited positions from both — the FastSS/SymSpell
    * neighborhood theorem), so blocking on deletion variants has full
    * recall and the per-candidate `levenshtein` verify removes the rest.
    *
    * `minDist ≥ 1` by contract: identical-key pairs are [[exact]] dedup's
    * domain, and excluding them lets the candidate stage run over DISTINCT
    * keys — bounded by key-space cardinality, not row count — with dup
    * groups expanded only in the final fan-out join.
    *
    * Scale design: no all-pairs stage anywhere. Distinct keys explode into
    * ≤ 1+L+L(L−1)/2 deletion variants (L ≤ `maxLen`, keys longer are
    * excluded by contract — fuzzy keys are short), candidates shuffle on
    * the 64-bit variant hash (hash collisions only ADD candidates; the
    * verify kills them), and `levenshtein(_,_,maxDist)` runs the O(d·L)
    * banded form. The id fan-out is two key-equi-joins driven by the
    * matched name pairs — output-sized, never quadratic in rows.
    */
  def editDistancePairs(df: DataFrame, id: Column, key: Column,
      maxDist: Int = 1, minDist: Int = 1, maxLen: Int = 64): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2, got $maxDist")
    require(minDist >= 1 && minDist <= maxDist,
      s"minDist must be in [1,$maxDist], got $minDist")
    require(maxLen >= 2 && maxLen <= 64,
      s"maxLen must be in [2,64], got $maxLen")
    val keyed = df.select(id.cast("long").as("id"), key.cast("string").as("nm"))
      .filter(col("nm").isNotNull && length(col("nm")).between(1, maxLen))
    val names = keyed.select("nm").distinct()
      .localCheckpoint(eager = false)      // feeds both variant sides once
    val vr = names
      .select(col("nm"),
        explode(delVariants(col("nm"), maxDist, maxLen)).as("__v"))
      .select(col("nm"), xxhash64(col("__v")).as("__vh"))
    val cand = vr.as("l").join(vr.as("r").hint("shuffle_hash"), Seq("__vh"))
      .filter(col("l.nm") < col("r.nm"))
      .select(col("l.nm").as("nm_a"), col("r.nm").as("nm_b"))
      .distinct()
    val matched = cand
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b"), maxDist))
      .filter(col("dist").between(minDist, maxDist))
    matched
      .join(keyed.select(col("id").as("__ia"), col("nm").as("nm_a"))
        .hint("shuffle_hash"), Seq("nm_a"))
      .join(keyed.select(col("id").as("__ib"), col("nm").as("nm_b"))
        .hint("shuffle_hash"), Seq("nm_b"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("dist"))
  }

  /** Jaro–Winkler fuzzy-link pairs: all id pairs within the same `block`
    * whose `key` strings score ≥ `threshold` under the native
    * [[graft.functions.JaroWinklerSimilarity]] — the record-linkage
    * companion to [[editDistancePairs]] for the name/title/slug regime
    * where edit distance over-penalizes transpositions and rewards are
    * graded, not boolean. Output: (id_a, id_b, similarity round-6),
    * id_a < id_b.
    *
    * Scale shape: one self equi-join on the blocking key — both sides
    * hash-partition on `block` (hinted shuffled hash; a statsless
    * projection would otherwise sort-merge), pairs form per-block, the
    * scorer runs codegen'd per candidate pair. Blocking quality is the
    * caller's lever exactly as in [[editDistancePairs]]: a hot block is
    * quadratic in its size, and the engine's AQE skew-split defaults
    * (graft.Sessions) spread it across tasks rather than one straggler.
    */
  def jaroWinklerPairs(df: DataFrame, id: Column, key: Column, block: Column,
      threshold: Double = 0.85, maxLen: Int = 256): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(maxLen >= 1 && maxLen <= 4096,
      s"maxLen must be in [1,4096], got $maxLen")
    val keyed = df
      .select(id.cast("long").as("id"), block.cast("string").as("blk"),
        key.cast("string").as("nm"))
      .filter(col("blk").isNotNull && col("nm").isNotNull &&
        length(col("nm")).between(1, maxLen))
    keyed.as("l")
      .join(keyed.as("r").hint("shuffle_hash"),
        col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(graft.functions.JaroWinklerSimilarity
          .jaroWinkler(col("l.nm"), col("r.nm")), 6).as("similarity"))
      .filter(col("similarity") >= threshold)
  }

  /** Entity-resolution crosswalk: for every LEFT record, its single best
    * fuzzy match among RIGHT records sharing its block — the "link this
    * catalog to that catalog" shape on top of [[jaroWinklerPairs]]'
    * scorer. Output: (id_l, id_r, similarity, margin) where `margin` is
    * the gap to the runner-up (NULL when the best match is the only
    * candidate ≥ threshold) — the standard accept/review signal: a high
    * score with a tiny margin is an ambiguous link, not a confident one.
    *
    * Ties break by smallest right id (engine-deterministic). Left rows
    * with no candidate ≥ threshold are absent from the output (a crosswalk
    * row means "we propose this link").
    *
    * Scale shape: blocked equi-join (hinted shuffled hash) exactly as
    * [[jaroWinklerPairs]]; the best/runner-up pick is a rank ≤ 2 window
    * per left id, which plans a WindowGroupLimit — no left record buffers
    * more than 2 candidates per shuffle side regardless of block size.
    */
  def bestFuzzyMatch(left: DataFrame, right: DataFrame,
      leftId: Column, leftKey: Column, leftBlock: Column,
      rightId: Column, rightKey: Column, rightBlock: Column,
      threshold: Double = 0.85, maxLen: Int = 256): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    def side(df: DataFrame, id: Column, key: Column, block: Column,
        suffix: String) =
      df.select(id.cast("long").as(s"id_$suffix"),
          block.cast("string").as("blk"), key.cast("string").as(s"nm_$suffix"))
        .filter(col("blk").isNotNull && col(s"nm_$suffix").isNotNull &&
          length(col(s"nm_$suffix")).between(1, maxLen))
    val l = side(left, leftId, leftKey, leftBlock, "l")
    val r = side(right, rightId, rightKey, rightBlock, "r")
    import org.apache.spark.sql.expressions.Window
    val scored = l.join(r.hint("shuffle_hash"), Seq("blk"))
      .withColumn("similarity", round(graft.functions.JaroWinklerSimilarity
        .jaroWinkler(col("nm_l"), col("nm_r")), 6))
      .filter(col("similarity") >= threshold)
      .withColumn("__rn", row_number().over(Window.partitionBy(col("id_l"))
        .orderBy(col("similarity").desc, col("id_r"))))
      .filter(col("__rn") <= 2)
    val best = scored.filter(col("__rn") === 1)
      .select(col("id_l"), col("id_r"), col("similarity"))
    val second = scored.filter(col("__rn") === 2)
      .select(col("id_l").as("__il2"), col("similarity").as("__sim2"))
    // both sides are ≤ |left| rows — corpus-scale, so hash-join on id, not
    // broadcast (and statsless post-window relations would sort-merge
    // without the hint)
    best.join(second.hint("shuffle_hash"), col("id_l") === col("__il2"), "left")
      .select(col("id_l"), col("id_r"), col("similarity"),
        round(col("similarity") - col("__sim2"), 6).as("margin"))
  }
}
