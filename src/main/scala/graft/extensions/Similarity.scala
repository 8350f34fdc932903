package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`) — north-star
  * extension for training-data pipelines.
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: sign-LSH bucketing
  * (random hyperplanes from seeded hashes) so candidate generation touches only
  * same-bucket rows. All math is Column-composed (zip_with/aggregate) in double
  * precision — codegen'd, no UDF, no ml.linalg boxing; floats are widened to
  * double before any arithmetic so results are engine-reproducible.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double (left fold, deterministic order) — native
    * [[graft.functions.DotProduct]]: the aggregate/zip_with HOF tree runs
    * interpreted once per CANDIDATE PAIR on every similarity path
    * (equivalence pinned in NativeExprEquivalenceSpec).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine = dot/(‖a‖·‖b‖); 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Exact brute-force top-k neighbors for each query vector.
    *
    * Scale shape: `queries` is the SMALL side (it broadcasts — the corpus is
    * never shuffled by the join); the per-query top-k window shuffles only
    * (corpus × |queries|) similarity rows, partitioned by query id — never a
    * global sort. Similarity is pre-rounded to 6 dp so ranking is stable
    * across engines/architectures; `corpusId` breaks exact ties.
    */
  /** Per-pair similarity with per-ROW norms: ‖v‖ is computed once per vector
    * before the join (n·d work), never per pair (n²·d) — the dominant cost of
    * any pairwise cosine stage. Formula stays dot/(‖a‖·‖b‖), identical doubles
    * to [[cosine]].
    */
  private def simWithNorms(va: Column, na: Column, vb: Column, nb: Column): Column =
    round(when(na === 0.0 || nb === 0.0, 0.0)
      .otherwise(dot(va, vb) / (na * nb)), 6)

  /** Hard-negative mining — for each query vector, the `k` most
    * cosine-similar corpus vectors with a DIFFERENT label: the contrastive
    * training staple (highest-similarity wrong-class examples are the
    * negatives that actually move the loss). Same scale contract as
    * [[bruteForceTopK]]: the query side is a bounded sample and broadcast,
    * the corpus is scanned once and never shuffled; the per-query rank
    * window partitions on query_id over the k-boundable scored stream.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("label").as("query_label"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("label").as("neighbor_label"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = q.join(c, col("query_label") =!= col("neighbor_label"))
      .withColumn("sim", simWithNorms(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "query_label", "neighbor_id", "neighbor_label",
        "sim", "rank")
  }

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simWithNorms(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Exact brute-force top-k under SQUARED L2 distance — the ground truth
    * the PQ estimator family ([[pqAdcTopK]], [[ivfPqTopK]],
    * [[ivfPqRefineTopK]]) approximates. Unlike the cosine [[bruteForceTopK]]
    * the query itself is NOT excluded when `queries ⊆ corpus`: the PQ family
    * keeps self-candidates (dist² ≈ quantization error), so a recall
    * measurement against a self-excluding truth would penalize the estimator
    * for a contract difference, not a quality difference. Same scale shape:
    * queries broadcast, corpus scanned once, rank ≤ k plans a
    * WindowGroupLimit. dist2 rounded to 6 dp (the family's determinism
    * contract), ties to the lower neighbor_id.
    */
  def bruteForceL2TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("__qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("__cv"))
    val scored = c.crossJoin(q)
      .withColumn("dist2", round(aggregate(
        zip_with(col("__qv"), col("__cv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist2").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist2", "rank")
  }

  /** Per-query recall@k of an approximate top-k relation against an exact
    * one: |est top-k ∩ truth top-k| / |truth top-k|. Both inputs follow the
    * family output contract (`query_id`, `neighbor_id`, `rank`); rows with
    * rank > k on either side are ignored, so a k=50 truth fixture can serve
    * a k=5 measurement. Queries are keyed off the TRUTH side — an estimator
    * that returns nothing for a query (empty LSH bucket) scores recall 0
    * there instead of silently dropping out of the mean.
    *
    * Scale shape: both relations are |queries|·k rows (the ANN probe keeps
    * the query side bounded by contract), so every join broadcasts and
    * nothing corpus-scale is touched. `recall` rounded to 6 dp.
    */
  def recallAtK(est: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = truth.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val e = est.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = e.join(broadcast(t.withColumn("__hit", lit(1))),
        Seq("query_id", "neighbor_id"), "inner")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    t.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      .join(broadcast(hits), Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / col("n_truth"), 6).as("recall"))
  }

  /** Sign-LSH bucket key: `nBits` hyperplanes hᵢ with components in {-1,+1}
    * derived from xxhash64(seed=i, dim=j) — deterministic, shared by every
    * executor with zero driver state. Bucket = the sign-bit string of the
    * projections. Native [[graft.functions.SignLshBucket]]: the hyperplane
    * signs depend only on (plane, dim), so they're memoized per executor and
    * each row costs dim×nBits multiply-adds, not dim×nBits interpreted hash
    * expressions (equivalence pinned in NativeExprEquivalenceSpec).
    */
  def lshBucket(v: Column, nBits: Int = 12): Column =
    graft.functions.SignLshBucket.signLshBucket(v, nBits)

  /** Approximate NN for an explicit query SUBSET against a corpus: same
    * sign-LSH bucketing as the self-join [[annTopK]], but the query side is
    * its own (small) frame, bucketed and BROADCAST — so "only score these
    * queries" is structural, not a predicate Catalyst must push through a
    * rank window into the bucket join. Value-identical to
    * `annTopK(corpus, k, nBits).filter(<query-id predicate>)` when
    * `queries ⊆ corpus` (the bucket key and scoring are the same
    * expressions); the corpus is scanned once and never shuffled.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nBits: Int): DataFrame = {
    val q = broadcast(queries.select(
      lshBucket(col("embedding"), nBits).as("bucket"),
      col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn")))
    val c = corpus.select(
      lshBucket(col("embedding"), nBits).as("bucket"),
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simWithNorms(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** MULTI-PROBE sign-LSH top-k (Lv et al., VLDB 2007): each query probes
    * its own bucket PLUS every bucket at Hamming distance 1 — nBits+1
    * probes — because a near neighbor that lands one hyperplane-sign away
    * is lost to single-bucket LSH forever. The x157 recall audit measured
    * exactly that: single-table sign-LSH@8 bits reads recall@5 ≈ 0.02 on
    * the sf0.01 corpus (2 vectors per bucket — near-dup probing, not
    * retrieval); one-flip multi-probe covers 9/256 of the key space for a
    * ~9× candidate budget with ZERO extra corpus passes or hash tables.
    *
    * Scale shape: the corpus side is IDENTICAL to [[annTopK]] (one scan,
    * one bucket key); the probe fan-out is query-side only (the bounded
    * broadcast side grows nBits+1×). Per (query, neighbor) at most one
    * candidate row — a corpus vector has exactly one bucket and the probe
    * set is distinct — so no dedup stage is needed.
    *
    * `maxHamming` widens the probe set to every bucket within that Hamming
    * radius (1 = the Lv et al. one-flip default; 2 adds the C(nBits,2)
    * two-flip buckets — 1+nBits+nBits·(nBits−1)/2 probes, still query-side
    * only). Measured before adoption (PROBE_recall_scale_r15.json): at
    * nBits=8 the radius-2 set covers 37/256 of the key space for ~4× the
    * radius-1 candidate budget; see BASELINE.md r15 for the recall/cost
    * verdict vs IVF at the same budget.
    */
  def annTopKMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
      nBits: Int, maxHamming: Int = 1): DataFrame = {
    require(nBits >= 2 && nBits <= 32, s"nBits must be in [2,32], got $nBits")
    require(maxHamming >= 1 && maxHamming <= 2,
      s"maxHamming must be 1 or 2, got $maxHamming")
    def flip(b: Column, i: Int): Column = concat(
      substring(b, 1, i),
      when(substring(b, i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
      substring(b, i + 2, nBits - i - 1))
    val qb = lshBucket(col("embedding"), nBits)
    val flips1 = (0 until nBits).map(i => flip(qb, i))
    val flips2 = if (maxHamming < 2) Seq.empty[Column]
      else for {
        i <- 0 until nBits; j <- (i + 1) until nBits
      } yield flip(flip(qb, i), j)
    val probes = array((qb +: flips1) ++ flips2: _*)
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), norm(col("embedding")).as("qn"),
      explode(probes).as("bucket")))
    val c = corpus.select(
      lshBucket(col("embedding"), nBits).as("bucket"),
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simWithNorms(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Approximate NN: candidates share an LSH bucket; exact cosine re-ranks
    * within the bucket. Recall is tuned by `nBits` (fewer bits → bigger
    * buckets → higher recall, more compute). At 100 TB the bucket key is the
    * shuffle key — a single narrow shuffle, no cross join anywhere.
    */
  def annTopK(df: DataFrame, k: Int, nBits: Int = 12): DataFrame = {
    val withBucket = df.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      lshBucket(col("embedding"), nBits).as("bucket"))
    val l = withBucket.select(col("bucket"), col("vec_id").as("query_id"),
      col("embedding").as("qv"), col("nrm").as("qn"))
    val r = withBucket.select(col("bucket"), col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("nrm").as("cn"))
    val scored = l.join(r, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simWithNorms(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** IVF (inverted-file) approximate NN — the other standard scale path next
    * to sign-LSH: the corpus is coarsely quantized to `nCentroids` k-means
    * cells; each query probes its `nProbe` nearest cells and exact cosine
    * re-ranks inside them.
    *
    * Scale shape: centroid training touches a bounded sample; corpus cell
    * assignment is one narrow map (`KMeansModel.transform`, no shuffle); the
    * probe is a (queries × nProbe)-row broadcast-joinable table, so the only
    * data-sized movement is the cell-keyed join — same single-shuffle profile
    * as [[annTopK]], with recall tuned by `nProbe` instead of bit width.
    */
  /** Coarse k-means centroids from a BOUNDED sample — the shared quantizer
    * behind [[ivfTopK]] and [[topicClusters]]. At 100 TB, training on
    * everything would be a full extra pass for centroid digits that don't
    * change the recall/probe (or topic-boundary) trade-off; a `maxTrainRows`
    * sample with few iterations is the standard coarse-quantizer recipe.
    * Deterministic for fixed (input order, seed, sample size) — callers that
    * refit with identical params (the x87 audit) get identical centroids.
    */
  def fitCentroids(corpus: DataFrame, vec: Column, nCentroids: Int,
      seed: Long = 42L, maxTrainRows: Int = 100000, maxIter: Int = 8)
      : Seq[Seq[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val feat = corpus.select(array_to_vector(vec.cast("array<double>")).as("features"))
    // persist the training sample: k-means is iterative and would otherwise
    // re-scan (and re-convert) the input once per iteration
    val train = feat.limit(maxTrainRows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = try {
      new KMeans().setK(nCentroids).setSeed(seed).setFeaturesCol("features")
        .setMaxIter(maxIter)
        .fit(train)
    } finally train.unpersist(false)
    model.clusterCenters.toSeq.map(_.toArray.toSeq)
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 2, seed: Long = 42L,
      maxTrainRows: Int = 100000, maxIter: Int = 8): DataFrame =
    ivfTopK(queries, corpus, k,
      fitCentroids(corpus, col("embedding"), nCentroids, seed, maxTrainRows,
        maxIter), nProbe)

  /** [[ivfTopK]] with PRE-FIT coarse cells — the overload the query layer's
    * content-keyed model memo feeds (the x139/ivfPqTopK calling convention):
    * callers that already hold the corpus's centroids skip the k-means
    * refit (~maxIter driver-coordinated jobs) entirely. Value-identical to
    * the fitting overload for centroids produced by [[fitCentroids]] with
    * the same params — the determinism contract x87 audits.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    val centroidSeqsFit = cells

    // Cell assignment is a pure expression over the centroid LITERALS (a few
    // KB shipped inside the plan as a codegen reference object): per-row
    // argmin of L2 distances — a narrow map with NO join against a model
    // output and NO shuffle of the corpus. Ranking uses ‖c‖² − 2·v·c (≡ L2
    // order: the ‖v‖² term is constant per row), ties to the lower cell id.
    // Native NearestCells expression (equivalence with the HOF
    // array_sort(zip_with(...)) form pinned in NativeExprEquivalenceSpec):
    // the HOF tree ran interpreted per corpus row — the last interpreted
    // hot-path expression in the engine.
    val centroidSeqs = centroidSeqsFit
    def nearestCells(v: Column, n: Int): Column =
      graft.functions.NearestCells.nearestCells(v, centroidSeqs, n)

    val c = corpus.select(element_at(nearestCells(col("embedding"), 1), 1).as("cell"),
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))

    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"),
        explode(nearestCells(col("embedding"), nProbe)).as("cell"))

    val scored = probes.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simWithNorms(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
  }

  /** Topic clustering: every vector assigned to its nearest coarse k-means
    * centroid — the corpus-segmentation primitive behind topic-balanced
    * mixtures, per-topic quality cuts, and cluster-stratified dedup
    * (SemDeDup-style pipelines run exactly this before their within-cluster
    * pair stage).
    *
    * Output, one row per input: (id, cluster ∈ [0, nClusters), dist2 =
    * squared L2 distance to the assigned centroid — the per-row inertia
    * contribution).
    *
    * Scale shape: centroids come from [[fitCentroids]]'s bounded sample;
    * assignment is the same literal-centroid narrow map as [[ivfTopK]] (no
    * corpus shuffle, no model join); dist2 needs the assigned centroid's
    * coordinates, which arrive via a BROADCAST join against the
    * nClusters-row centroid relation — the corpus never moves.
    */
  def topicClusters(df: DataFrame, id: Column, vec: Column, nClusters: Int = 16,
      seed: Long = 42L, maxTrainRows: Int = 100000, maxIter: Int = 8): DataFrame =
    topicClusters(df, id, vec,
      fitCentroids(df, vec, nClusters, seed, maxTrainRows, maxIter))

  /** [[topicClusters]] with PRE-FIT centroids (the r17 ivfTopK overload
    * pattern): callers holding the corpus's centroids — e.g. the query
    * layer's content-keyed model memo — skip the k-means refit. Identical
    * output for centroids from [[fitCentroids]] with the same params.
    */
  def topicClusters(df: DataFrame, id: Column, vec: Column,
      cents: Seq[Seq[Double]]): DataFrame = {
    val centDf = df.sparkSession
      .createDataFrame(cents.zipWithIndex.map { case (c, i) => (i, c) })
      .toDF("cluster", "centroid")
    df.select(id.as("id"), vec.cast("array<double>").as("__v"))
      .withColumn("cluster", element_at(
        graft.functions.NearestCells.nearestCells(col("__v"), cents, 1), 1))
      .join(broadcast(centDf), Seq("cluster"))
      .select(col("id"), col("cluster"),
        aggregate(zip_with(col("__v"), col("centroid"),
            (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, d) => acc + d).as("dist2"))
  }

  /** Product-quantization codebooks (Jégou et al. 2011): split the d-dim
    * embedding space into `m` contiguous subspaces and fit `k` centroids per
    * subspace over a bounded deterministic sample — the compression rung of
    * the ANN stack ([[ivfTopK]] prunes WHICH vectors to score; PQ shrinks
    * each stored vector to `m` small codes so a 100 TB vector corpus's index
    * fits in executor memory: 64 float dims → 8 bytes at m=8, k≤256).
    * Returns codebooks(j)(c) = subspace-j centroid c, each of d/m dims.
    * Same determinism contract as [[fitCentroids]] (fixed seed + bounded
    * sample); `d` must be divisible by `m`.
    */
  def pqFit(df: DataFrame, vec: Column, d: Int, m: Int, k: Int,
      seed: Long = 42L, maxTrainRows: Int = 100000, maxIter: Int = 8)
      : Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && d >= m && d % m == 0,
      s"d=$d must be a positive multiple of m=$m")
    require(k >= 2 && k <= 256, s"k must be in [2,256], got $k")
    val sub = d / m
    (0 until m).map { j =>
      fitCentroids(df, slice(vec.cast("array<double>"), j * sub + 1, sub),
        k, seed + j, maxTrainRows, maxIter)
    }
  }

  /** PQ encoding: each vector becomes `codes` = the m-array of its nearest
    * per-subspace centroid ids (ties to the lower id — [[ivfTopK]]'s
    * NearestCells contract). Scan-local: the codebooks ride inside the plan
    * as literals, the per-subspace argmin is the same native codegen'd
    * NearestCells expression the IVF path uses — no join, no shuffle, no
    * model artifact. Output: (id, codes array<int>).
    */
  def pqEncode(df: DataFrame, id: Column, vec: Column,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(codebooks.nonEmpty, "pqEncode needs at least one codebook")
    val sub = codebooks.head.head.size
    val v = vec.cast("array<double>")
    val codes = array(codebooks.zipWithIndex.map { case (book, j) =>
      element_at(graft.functions.NearestCells.nearestCells(
        slice(v, j * sub + 1, sub), book, 1), 1)
    }: _*)
    df.select(id.as("id"), codes.as("codes"))
  }

  /** PQ asymmetric-distance top-k (the ADC scan): approximate L2² from each
    * query to every ENCODED corpus vector as
    * `Σ_j ‖q_j − codebook_j(codes_j)‖²` — exactly the L2² between the query
    * and the corpus vector's reconstruction (subspaces partition the
    * coordinates, so the per-subspace sums compose exactly). The query side
    * precomputes its m×k distance table in-plan; each corpus row then costs
    * m table lookups against its codes — never a d-dim float scan.
    *
    * Output: (query_id, neighbor_id, dist2_est, rank), rank ≤ `k` per query
    * by (round-6 estimate asc, neighbor_id) — [[ivfTopK]]'s determinism
    * contract.
    *
    * Scale shape: the corpus is scanned once as (id, codes); the query
    * relation (with its tables) broadcasts — queries are the bounded side
    * of an ANN probe by contract — and the per-query rank ≤ k filter plans
    * a WindowGroupLimit, so no task buffers more than k candidates per
    * query. The distance sum is a fixed-order fold over j (IEEE-stable),
    * rounded to 6 dp.
    */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(codebooks.nonEmpty, "pqAdcTopK needs codebooks")
    val m = codebooks.size
    val sub = codebooks.head.head.size
    val booksLit = typedLit(codebooks)
    val qv = col("__qv")
    // tables(j)(c) = ‖q_j − codebook_j(c)‖², computed once per query row
    val tables = transform(booksLit, (book, j) =>
      transform(book, cvec => aggregate(
        zip_with(slice(qv, j * lit(sub) + 1, lit(sub)), cvec,
          (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, d) => acc + d)))
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("__qv"))
      .withColumn("__tbl", tables).drop("__qv")
    val enc = pqEncode(corpus, col("vec_id"), col("embedding"), codebooks)
    val dist = (0 until m).map(j =>
      element_at(element_at(col("__tbl"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dist2_est").asc, col("neighbor_id").asc)
    enc.select(col("id").as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(q))
      .withColumn("dist2_est", round(dist, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist2_est", "rank")
  }

  /** IVF-PQ top-k — the production big-ANN composition (FAISS's default
    * index family): [[ivfTopK]]'s coarse cells prune WHICH corpus vectors a
    * query scores (nProbe of nCells cells ≈ nProbe/nCells of the corpus),
    * and [[pqAdcTopK]]'s code tables make each scored candidate cost m
    * lookups instead of a d-dim float scan. At 100 TB neither half works
    * alone: unpruned ADC still touches every row; uncompressed IVF still
    * ships full vectors through the probe join.
    *
    * Simplification vs FAISS: codes quantize the RAW vectors, not the
    * per-cell residuals — raw-vector PQ builds ONE ADC table per query
    * where the residual form needs one per (query, probed cell).
    * [[ivfPqResidualTopK]] ships the residual form (round 15) with that
    * trade documented; both carry measured recall in
    * PROBE_recall_scale_r15.json.
    *
    * Output: (query_id, neighbor_id, cell, dist2_est, rank), rank ≤ k per
    * query by (round-6 ADC estimate asc, neighbor_id) over the PROBED
    * cells only — a neighbor outside the probed cells is out of scope by
    * IVF contract (the x11-style documented recall semantics).
    *
    * Scale shape: ONE corpus scan assigns cells and codes (both argmins
    * over in-plan literals); the query relation — nProbe rows per query,
    * each carrying the m×k table — broadcasts (bounded probe set by ANN
    * contract); the probe is a broadcast equi-join ON CELL (never a full
    * cross product); rank ≤ k plans a WindowGroupLimit.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Seq[Seq[Double]], nProbe: Int,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(cells.nonEmpty, "ivfPqTopK needs coarse cells")
    require(nProbe >= 1 && nProbe <= cells.size,
      s"nProbe must be in [1,${cells.size}], got $nProbe")
    require(codebooks.nonEmpty, "ivfPqTopK needs codebooks")
    val m = codebooks.size
    val sub = codebooks.head.head.size
    val booksLit = typedLit(codebooks)
    val qv = col("__qv")
    val tables = transform(booksLit, (book, j) =>
      transform(book, cvec => aggregate(
        zip_with(slice(qv, j * lit(sub) + 1, lit(sub)), cvec,
          (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, d) => acc + d)))
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("__qv"))
      .withColumn("__tbl", tables)
      .withColumn("cell", explode(
        graft.functions.NearestCells.nearestCells(col("__qv"), cells, nProbe)))
      .drop("__qv")
    val enc = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__v"))
      .select(col("neighbor_id"),
        element_at(graft.functions.NearestCells.nearestCells(col("__v"),
          cells, 1), 1).as("cell"),
        array(codebooks.zipWithIndex.map { case (book, j) =>
          element_at(graft.functions.NearestCells.nearestCells(
            slice(col("__v"), j * sub + 1, sub), book, 1), 1)
        }: _*).as("codes"))
    val dist = (0 until m).map(j =>
      element_at(element_at(col("__tbl"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dist2_est").asc, col("neighbor_id").asc)
    enc.join(broadcast(q), Seq("cell"))
      .withColumn("dist2_est", round(dist, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cell", "dist2_est", "rank")
  }

  /** Per-row residual against the assigned coarse cell — the training
    * relation for residual PQ ([[ivfPqResidualTopK]]): (vec_id, cell,
    * residual = v − centroid_cell). One narrow corpus scan, centroids as
    * in-plan literals, no join, no shuffle.
    */
  def cellResiduals(corpus: DataFrame, cells: Seq[Seq[Double]]): DataFrame = {
    require(cells.nonEmpty, "cellResiduals needs coarse cells")
    val cellsLit = typedLit(cells)
    corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("__v"))
      .withColumn("cell", element_at(
        graft.functions.NearestCells.nearestCells(col("__v"), cells, 1), 1))
      .select(col("vec_id"), col("cell"),
        zip_with(col("__v"), element_at(cellsLit, col("cell") + 1),
          (x, c) => x - c).as("residual"))
  }

  /** RESIDUAL IVF-PQ top-k — the encoding FAISS's IVFPQ actually defaults
    * to, closing [[ivfPqTopK]]'s documented simplification: codes quantize
    * `v − centroid(cell)` rather than the raw vector, so the codebooks
    * spend their resolution on WITHIN-cell structure instead of re-encoding
    * the coarse geometry the cells already captured. `codebooks` must be
    * fit on the residual relation ([[cellResiduals]] → [[pqFit]] on
    * `residual`).
    *
    * The cost of the residual trick in this plan shape: the query's m×k
    * ADC table depends on the PROBED cell (q_res = q − centroid_cell), so
    * it is built per (query, probed cell) AFTER the probe explode — nProbe
    * tables per query instead of one. Still query-side bounded; the corpus
    * side stays ONE scan (cell + residual codes, all argmins over in-plan
    * literals) and the probe join is unchanged. dist2_est is exactly
    * ‖q − (centroid_cell + recon(codes))‖² by the subspace decomposition
    * (both sides of the join share the cell, so the per-subspace sums
    * compose over q_res).
    *
    * Output and determinism contract identical to [[ivfPqTopK]]:
    * (query_id, neighbor_id, cell, dist2_est, rank), rank ≤ k by (round-6
    * estimate asc, neighbor_id asc) over probed cells only.
    */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Seq[Seq[Double]], nProbe: Int,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(cells.nonEmpty, "ivfPqResidualTopK needs coarse cells")
    require(nProbe >= 1 && nProbe <= cells.size,
      s"nProbe must be in [1,${cells.size}], got $nProbe")
    require(codebooks.nonEmpty, "ivfPqResidualTopK needs codebooks")
    val m = codebooks.size
    val sub = codebooks.head.head.size
    val booksLit = typedLit(codebooks)
    val cellsLit = typedLit(cells)
    val qres = col("__qres")
    val tables = transform(booksLit, (book, j) =>
      transform(book, cvec => aggregate(
        zip_with(slice(qres, j * lit(sub) + 1, lit(sub)), cvec,
          (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, d) => acc + d)))
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("__qv"))
      .withColumn("cell", explode(
        graft.functions.NearestCells.nearestCells(col("__qv"), cells,
          nProbe)))
      .withColumn("__qres", zip_with(col("__qv"),
        element_at(cellsLit, col("cell") + 1), (x, c) => x - c))
      .withColumn("__tbl", tables)
      .drop("__qv", "__qres")
    val enc = cellResiduals(corpus, cells)
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        array(codebooks.zipWithIndex.map { case (book, j) =>
          element_at(graft.functions.NearestCells.nearestCells(
            slice(col("residual"), j * sub + 1, sub), book, 1), 1)
        }: _*).as("codes"))
    val dist = (0 until m).map(j =>
      element_at(element_at(col("__tbl"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist2_est").asc, col("neighbor_id").asc)
    enc.join(broadcast(q), Seq("cell"))
      .withColumn("dist2_est", round(dist, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cell", "dist2_est", "rank")
  }

  /** IVF + scalar-quantization (SQ8) top-k — the THIRD compression point on
    * the ANN quality/size curve, between full-precision IVF (4 B/dim) and
    * IVF-PQ (m codes per vector): each corpus vector is stored as d uint8
    * codes (1 B/dim — 4× smaller than floats), candidates are pruned by the
    * same coarse cells as [[ivfTopK]], and the distance is the EXACT L2²
    * between the full-precision query and the DEQUANTIZED candidate (the
    * asymmetric SQ-ADC convention: only the stored side is quantized).
    *
    * Why it exists (round-15 measured finding, PROBE_recall_scale_r15):
    * at honest 10× corpus density the PQ family is density-limited —
    * m=8/k=16 quantization error exceeds the 5th-vs-50th neighbor gap and
    * recall@5 saturates at ~0.23–0.29 — while per-dim SQ8 error is bounded
    * by half a 1/255 step ([[Quantize.quantizeWithError]]) and recall
    * tracks full-precision IVF. The trade: SQ8 moves 1 B/dim through the
    * probe join and costs d multiply-adds per candidate (like IVF);
    * PQ moves m bytes and costs m lookups. At 100 TB: SQ8 when recall
    * matters and 4× compression suffices, PQ when the index must be 32×
    * smaller and a refine pass buys the recall back.
    *
    * Output: (query_id, neighbor_id, cell, dist2_est, rank), rank ≤ k per
    * query by (round-6 dist2_est asc, neighbor_id asc) over the probed
    * cells — the [[ivfPqTopK]] determinism contract. dist2_est is exact-to-
    * the-reconstruction, so vectors already on the quantization grid score
    * their true L2² exactly (pinned in PqSpec).
    *
    * Scale shape: ONE corpus scan assigns cells and codes (argmin over
    * in-plan cell literals + the [[Quantize.quantize]] narrow map); the
    * query side (nProbe rows per query, full-precision vectors) broadcasts;
    * the probe is a broadcast equi-join ON CELL; rank ≤ k plans a
    * WindowGroupLimit. mins/maxs ride in-plan as d-element literals (the
    * centroid idiom) — no model join anywhere.
    */
  def ivfSq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
      cells: Seq[Seq[Double]], nProbe: Int,
      mins: Array[Double], maxs: Array[Double]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(cells.nonEmpty, "ivfSq8TopK needs coarse cells")
    require(nProbe >= 1 && nProbe <= cells.size,
      s"nProbe must be in [1,${cells.size}], got $nProbe")
    require(mins.length == maxs.length && mins.nonEmpty,
      "mins/maxs must be equal-length and non-empty")
    // mins.length must equal the embedding dimension; that is enforced
    // IN-PLAN by Quantize.quantize (raise_error on the first mismatched
    // row) so a bad fit fails loudly instead of emitting NULL codes that
    // would sort first under the ascending rank (round-15 advisory).
    val enc = Quantize.quantize(
      corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__v")),
      col("__v"), mins, maxs)
      .select(col("neighbor_id"),
        element_at(graft.functions.NearestCells.nearestCells(col("__v"),
          cells, 1), 1).as("cell"),
        col("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("__qv"))
      .withColumn("cell", explode(
        graft.functions.NearestCells.nearestCells(col("__qv"), cells,
          nProbe)))
    val vhat = Quantize.dequantize(col("codes"), mins, maxs)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist2_est").asc, col("neighbor_id").asc)
    enc.join(broadcast(q), Seq("cell"))
      .withColumn("dist2_est", round(aggregate(
        zip_with(col("__qv"), vhat, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cell", "dist2_est", "rank")
  }

  /** IVF-PQ with exact re-rank refinement — the production composition
    * FAISS ships as `IndexRefineFlat`: the compressed index proposes `r ≥ k`
    * candidates per query by ADC estimate ([[ivfPqTopK]]), then ONLY those
    * r·|queries| candidates are re-scored with the true L2² against the raw
    * vectors and re-ranked to the final top-k. Refinement buys back the
    * quantization error at a cost independent of corpus size: the exact
    * arithmetic touches r vectors per query, never N.
    *
    * Output: (query_id, neighbor_id, dist2_est, dist2, rank) — both the
    * proposing ADC estimate and the exact distance, rank ≤ k per query by
    * (round-6 exact dist2 asc, neighbor_id asc) — the [[ivfPqTopK]]
    * determinism contract applied to the refined metric.
    *
    * Scale shape: the candidate relation is |queries|·r rows (bounded — the
    * ANN probe contract) and BROADCASTS into one corpus scan keyed on
    * neighbor_id (the corpus is never shuffled); query vectors broadcast
    * again for the exact distance; the final rank ≤ k window plans a
    * WindowGroupLimit over r-bounded rows per query.
    */
  def ivfPqRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int, r: Int,
      cells: Seq[Seq[Double]], nProbe: Int,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(k >= 1 && r >= k, s"need r >= k >= 1, got k=$k r=$r")
    val cand = ivfPqTopK(queries, corpus, r, cells, nProbe, codebooks)
      .select(col("query_id"), col("neighbor_id"), col("dist2_est"))
    val qv = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("__qv")))
    val exact = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("dist2", round(aggregate(
        zip_with(col("__qv"), col("__cv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist2").asc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist2_est", "dist2", "rank")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold within a blocking key
    * (e.g. label, or an LSH bucket at scale). Pairs emitted once (a<b).
    */
  def nearDupPairs(df: DataFrame, block: Column, threshold: Double): DataFrame = {
    val b = df.select(block.as("block"), col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val l = b.select(col("block"), col("vec_id").as("id_a"), col("embedding").as("va"),
      col("nrm").as("na"))
    val r = b.select(col("block"), col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("nrm").as("nb"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", simWithNorms(col("va"), col("na"), col("vb"), col("nb")))
      .filter(col("sim") >= threshold)
      .select("block", "id_a", "id_b", "sim")
  }

  /** Embedding-space train/eval decontamination — the vector twin of
    * [[Contamination.nearDupContamination]]: flag every `train` row whose
    * embedding has cosine ≥ `threshold` to ANY `eval` row. Catches semantic
    * leakage that survives text-level checks entirely (translations,
    * templated rewrites, code with renamed identifiers).
    *
    * Same shape as the text operator: candidates come from ONE blocked
    * self-join over the tagged union ([[nearDupPairs]] — at scale pass an
    * LSH bucket as `block`), sides resolve against the pair-scale relation,
    * and `vec_id` must be unique ACROSS both frames. The pair relation's
    * size is data-dependent (a low threshold makes it corpus-scale), so it
    * is eagerly checkpointed and the broadcast of every pair-scale
    * intermediate is gated on its MEASURED count — above `maxBroadcastPairs`
    * the joins fall back to `shuffle_hash` hints instead of risking a
    * driver OOM (same measured-cutover idiom as the text twin).
    * Output: every train row + `n_eval_matches`, `max_sim` (null if clean),
    * `is_contaminated`.
    */
  def embeddingDecontamination(train: DataFrame, eval: DataFrame,
      block: Column, threshold: Double,
      maxBroadcastPairs: Long = 5000000L): DataFrame = {
    val t = train.select(col("vec_id"), col("embedding"), block.as("__block"))
      .withColumn("__side", lit("train"))
    val e = eval.select(col("vec_id"), col("embedding"), block.as("__block"))
      .withColumn("__side", lit("eval"))
    val tagged = t.unionByName(e)
    // eager localCheckpoint (GC-owned blocks): the gate's count() re-reads
    // the checkpoint instead of re-running the blocked self-join, and the
    // downstream side-resolution joins read it exactly once
    val pairs = nearDupPairs(tagged, col("__block"), threshold).localCheckpoint()
    val mark: DataFrame => DataFrame =
      if (pairs.count() <= maxBroadcastPairs) broadcast
      else df => df.hint("shuffle_hash")
    val sides = tagged.select(col("vec_id"), col("__side"))
    // hints don't survive joins — re-mark the (still pair-scale) intermediate
    val withA = mark(pairs)
      .join(sides.select(col("vec_id").as("id_a"), col("__side").as("__side_a")), Seq("id_a"))
    val resolved = mark(withA)
      .join(sides.select(col("vec_id").as("id_b"), col("__side").as("__side_b")), Seq("id_b"))
      .filter(col("__side_a") =!= col("__side_b"))
    val agg = resolved
      .select(when(col("__side_a") === "train", col("id_a")).otherwise(col("id_b")).as("__tid"),
        col("sim"))
      .groupBy("__tid")
      .agg(count(lit(1)).as("n_eval_matches"), max(col("sim")).as("max_sim"))
    train
      .join(mark(agg), col("vec_id") === col("__tid"), "left")
      .drop("__tid")
      .withColumn("n_eval_matches", coalesce(col("n_eval_matches"), lit(0L)))
      .withColumn("is_contaminated", col("n_eval_matches") > 0)
  }

  /** Per-label prototype vector — the cluster-centroid half of SemDeDup-style
    * (Abbas et al. 2023) prototype filtering: rows far from their cluster's
    * prototype are outliers/noise, rows too close to an already-kept row are
    * semantic dups.
    *
    * The prototype is the per-dimension SUM vector, not the mean: cosine is
    * scale-invariant, so sum ≡ mean for every downstream similarity — and the
    * sum can be computed in DECIMAL, which is exact and order-independent,
    * where a floating mean depends on aggregation order and can't be
    * reproduced bit-for-bit by another engine (or even another run). Floats
    * enter decimal via their shortest string representation, which both Spark
    * and DuckDB produce identically.
    *
    * Scale shape: posexplode is a narrow 64×n expansion that never leaves the
    * scan stage; the (label, dim) aggregate combines map-side down to
    * |labels|·dims rows; the final per-label collect is enum-scale. No
    * driver-side data, no vocabulary-scale shuffle.
    */
  def labelPrototypes(df: DataFrame, label: Column, vec: Column): DataFrame =
    df.select(label.as("label"), posexplode(vec).as(Seq("dim", "v")))
      .withColumn("vd", col("v").cast("string").cast("decimal(20,10)"))
      .groupBy("label", "dim").agg(sum("vd").as("s"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("s")))).as("a"))
      .select(col("label"),
        transform(col("a"), x => x("s").cast("double")).as("proto"))

  /** Per-dimension z-score standardization of an embedding column, exploded
    * to (vec_id, dim, z) — the whitening-lite preprocessing step before
    * distance-based curation (un-standardized dimensions with big variance
    * silently dominate every cosine/L2 decision).
    *
    * Engine-reproducible by the [[labelPrototypes]] argument: the
    * per-dimension sufficient statistics are DECIMAL sums (exact,
    * order-independent — a double sum depends on partial-aggregation order
    * and differs run to run), entering decimal via shortest-string; v² is
    * squared in DOUBLE first (exact rounding, deterministic) because a
    * decimal×decimal product would overflow precision 38 and both engines
    * would round it differently. The z arithmetic then runs in doubles with
    * ONE expression shape both engines evaluate identically:
    * `(v·n − s) / sqrt(ss·n − s²)` — note no division by n anywhere until
    * the final rounded quotient, so nothing is inexact before the sqrt.
    * Constant dimensions (variance 0) yield z = 0.
    *
    * Scale shape: posexplode is scan-local; the stats aggregate map-side
    * combines down to `dims` rows which broadcast back onto the exploded
    * scan — the corpus itself is never shuffled. `dim` is 1-based (matching
    * the SQL `range(1, len+1)` convention the oracles use).
    */
  def standardizeEmbeddings(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val ex = df.select(id.as("vec_id"), posexplode(vec).as(Seq("dim0", "v")))
      .select(col("vec_id"), (col("dim0") + 1).cast("long").as("dim"), col("v"))
    val stats = ex.groupBy("dim").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("string").cast("decimal(20,10)")).as("s"),
      sum((col("v").cast("double") * col("v").cast("double"))
        .cast("string").cast("decimal(38,25)")).as("ss"))
    val nD = col("n").cast("double")
    val sD = col("s").cast("double")
    val ssD = col("ss").cast("double")
    val varNum = ssD * nD - sD * sD
    ex.join(broadcast(stats), Seq("dim"))
      .withColumn("z", when(varNum <= 0.0, 0.0)
        .otherwise(round((col("v").cast("double") * nD - sD) / sqrt(varNum), 6)))
      .select("vec_id", "dim", "z")
  }

  /** Johnson–Lindenstrauss random projection `inDims → outDims` with a
    * ±1/√outDims sign matrix (Achlioptas construction) — the cheap
    * dimensionality reduction in front of ANN/clustering when 64–1024-dim
    * embeddings make candidate scoring the bottleneck.
    *
    * The sign matrix is derived from sha256 over the (outDim, inDim) index
    * pair plus a salt — no RNG state, no driver-generated randomness to
    * ship: any engine (the DuckDB oracle included) re-derives the identical
    * matrix, and results are a pure function of (vector, salt). Signs enter
    * the plan as LITERAL arrays (outDims × inDims doubles — a few KB inside
    * the codegen'd plan, the [[ivfTopK]] centroid idiom), so projection is a
    * scan-local native [[graft.functions.DotProduct]] per output dimension:
    * no join, no shuffle, no UDF.
    *
    * Output: (vec_id, odim, value), odim 1-based, value rounded to 6 dp.
    */
  def randomProjection(df: DataFrame, id: Column, vec: Column,
      inDims: Int, outDims: Int, salt: String = ""): DataFrame = {
    require(inDims >= 1 && outDims >= 1, "dims must be positive")
    def sign(i: Int, j: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"${i}_$j$salt".getBytes("UTF-8"))
      // first hex digit < 8 ⇔ top bit of the first byte is 0
      if ((hex(0) & 0x80) == 0) 1.0 else -1.0
    }
    val root = math.sqrt(outDims.toDouble)
    val vd = transform(vec, _.cast("double"))
    val projected = array((1 to outDims).map { i =>
      val row = lit(Array.tabulate(inDims)(j => sign(i, j + 1)))
      round(graft.functions.DotProduct.dotProduct(vd, row) / root, 6)
    }: _*)
    df.select(id.as("vec_id"), posexplode(projected).as(Seq("odim0", "value")))
      .select(col("vec_id"), (col("odim0") + 1).cast("long").as("odim"),
        col("value"))
  }

  /** Every row's cosine to its own label's prototype (rounded to 6 dp for
    * engine-stable downstream thresholds). Prototypes broadcast — the corpus
    * is never shuffled. */
  def prototypeSimilarity(df: DataFrame, id: Column, label: Column,
      vec: Column): DataFrame = {
    val protos = labelPrototypes(df, label, vec)
    df.select(id.as("id"), label.as("label"),
        transform(vec, _.cast("double")).as("__v"))
      .join(broadcast(protos), Seq("label"))
      .select(col("id"), col("label"),
        round(cosine(col("__v"), col("proto")), 6).as("sim"))
  }

  /** Engine-REDERIVABLE sign-LSH bucket: bit i is the sign of the rounded
    * dot product with a ±1 hyperplane whose components come from
    * sha256(`i_j·salt`) — the [[randomProjection]] matrix, not
    * [[lshBucket]]'s xxhash planes. The difference is the point: any SQL
    * engine can recompute THIS bucket exactly (the x64 oracle already
    * builds the identical matrix), so operators blocked on it stay
    * hash-comparable end to end, where the xxhash bucket forces rows-only
    * checks. Signs are taken on the 6-dp-ROUNDED projection, the same
    * doubles both engines already agree on.
    *
    * Scan-local: hyperplanes are plan literals (nBits × inDims doubles),
    * each row costs nBits native dot products — no join, no shuffle, no
    * driver state.
    */
  def jlSignBucket(vec: Column, inDims: Int, nBits: Int,
      salt: String = ""): Column = {
    require(nBits >= 1 && nBits <= 62, s"nBits must be in [1, 62], got $nBits")
    require(inDims >= 1, "inDims must be positive")
    def sign(i: Int, j: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"${i}_$j$salt".getBytes("UTF-8"))
      if ((hex(0) & 0x80) == 0) 1.0 else -1.0
    }
    val vd = transform(vec, _.cast("double"))
    (1 to nBits).map { i =>
      val row = lit(Array.tabulate(inDims)(j => sign(i, j + 1)))
      when(round(graft.functions.DotProduct.dotProduct(vd, row), 6) >= 0.0,
        lit(1L << (i - 1))).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Full SemDeDup (Abbas et al. 2023): embedding-space near-duplicate
    * DEDUP, not just the pair relation — [[nearDupPairs]] candidates within
    * a blocking key → connected components → ONE survivor per semantic
    * cluster. At scale the block should include an LSH sub-bucket
    * ([[jlSignBucket]] keeps the oracle exact; the paper's k-means cells
    * are the engine-specific alternative) — a label-only block makes the
    * pair stage quadratic in label population. The election
    * is the paper's: within a duplicate cluster, KEEP the row with the
    * LOWEST cosine to its block's prototype (the most diverse exemplar —
    * near-centroid copies are the redundant ones), ties to the lower id.
    *
    * Composition: the prototype keep-key comes from [[labelPrototypes]]
    * (DECIMAL-exact sums, broadcast back — the corpus is never shuffled for
    * it) and the cluster machinery is [[graft.extensions.Dedup.resolveClusters]]
    * (pointer-jumping components, measured window↔groupBy skew gate), so
    * this operator inherits every scale property already proven for the
    * text near-dup path. The only corpus-scale movement is the blocked
    * pair self-join — identical shape to x11's.
    *
    * Output: every input row + `component`, `proto_sim`, `cluster_size`,
    * `is_survivor`.
    */
  def semanticDedup(df: DataFrame, block: Column, threshold: Double): DataFrame = {
    val protos = labelPrototypes(df, block, col("embedding"))
      .withColumnRenamed("label", "__block")
    val withKeep = df
      .withColumn("__block", block)
      .join(broadcast(protos), Seq("__block"))
      .withColumn("proto_sim",
        round(cosine(transform(col("embedding"), _.cast("double")), col("proto")), 6))
      .drop("proto")
    val pairs = nearDupPairs(df, block, threshold).select("id_a", "id_b")
    Dedup.resolveClusters(withKeep, col("vec_id"), col("proto_sim"), pairs)
      .drop("__block")
  }

  /** Top principal component of an embedding column by integer fixed-point
    * power iteration — PCA's curation uses: rank-1 "dominant direction"
    * removal (the all-but-the-top-PC trick behind SIF / common-component
    * removal), drift detection between snapshots, and a 1-D curriculum
    * axis. Everything runs in BIGINT micro-units with truncating division
    * (verified identical in Spark `div`, Scala `/`, DuckDB `//`), so the
    * means, the centered gramian, all `iterations` power rounds, the
    * deterministic sign fix, the Rayleigh eigenvalue, and every per-row
    * projection are bit-identical in any engine — the oracle replays the
    * complete algorithm as a DuckDB CTE chain and hash-matches every score.
    *
    * Algorithm (S = 10⁶ fixed-point scale):
    *  1. micro-ize: `xm = round(x·S)` per element
    *  2. means `m_i = (Σ xm_i) / N` (driver division of DIMS collected sums)
    *  3. gramian `g_ij = Σ_rows (c_i·c_j div S)` with `c = xm − m`; per-row
    *     contributions pre-divided so the global sum stays under 2⁶³ out to
    *     ~10¹² rows; `cov_ij = g_ij / N`
    *  4. `iterations`× driver power rounds on the DIMS² collected matrix:
    *     `w = Σ_j cov_ij·v_j div S`, then `v = w div max(max|w| div S, 1)`
    *     (the HITS normalizer — no sqrt, no overflow inside the caller contract)
    *  5. sign fix: the largest-|v| component (smallest index on ties) is
    *     made positive — eliminates the ±v ambiguity deterministically
    *  6. Rayleigh `λ = (Σ(v_i·w_i div S)·S) div max(Σ(v_i·v_i div S), 1)` —
    *     `eigval_micro` is the top variance in micro-units (σ²·S of the
    *     projected axis)
    *  7. projection `pc1_micro = Σ_i c_i·v_i div S` per row — scan-local
    *     (v enters the plan as a literal array, the centroid idiom)
    *
    * Scale shape: three linear scans over one lazily-checkpointed
    * micro-ized base (means, gramian, projection). The gramian explode is
    * N·dims² rows but collapses to ≤ dims² per partition via map-side
    * partial aggregation — the shuffle moves only `partitions × dims²`
    * rows; driver state is the dims² matrix (`dims ≤ 256` enforced, ≤ 0.5 MB
    * — the [[graft.extensions.Quantize]] bounded-collect contract). No
    * window, no join, no per-row driver work.
    *
    * Caller contract: every vector non-null with exactly `dims` elements.
    * |x| ≤ 30 keeps all intermediates (worst: the scaled Rayleigh
    * numerator) under 2⁶³ — ENFORCED per element at the micro-ize step
    * with raise_error (the shared overflow contract), never silently
    * wrapped.
    *
    * Output: one row per input: `id`, `pc1_micro` (BIGINT projection on the
    * top PC), `eigval_micro` (BIGINT, constant — the top eigenvalue).
    */
  def pcaTopComponent(df: DataFrame, id: Column, vec: Column, dims: Int,
      iterations: Int = 12): DataFrame = {
    require(dims >= 2 && dims <= 256, s"dims must be in [2,256], got $dims")
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1,64], got $iterations")
    val S = 1000000L
    // |x| ≤ 30 is the documented intermediate-overflow envelope — ENFORCE
    // it at the micro-ize step (the shared raise_error contract): one bad
    // element fails the job loudly instead of silently wrapping the
    // gramian/Rayleigh products three passes later
    val xmMax = 30L * S
    val micro = (x: Column) => {
      val xm = round(x.cast("double") * S).cast("long")
      when(abs(xm) <= xmMax, xm)
        .otherwise(raise_error(concat(
          lit(s"pcaTopComponent: |x| exceeds the overflow-safe envelope 30 " +
            s"(micro bound $xmMax); got x*1e6 = "), xm.cast("string"))))
    }
    val base = df.select(id.as("id"),
        transform(vec, x => micro(x)).as("__mv"))
      .localCheckpoint(eager = false)   // scanned 3×: means, gramian, projection
    // pass 1 — per-dim sums; the ONLY driver divisions are over these DIMS rows
    val sums = base.select(posexplode(col("__mv")).as(Seq("i", "x")))
      .groupBy("i").agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(sums.length == dims,
      s"expected $dims dims, vectors expose ${sums.length}")
    require(sums.map(_._3).distinct.length == 1,
      "ragged or null vectors: per-dim counts differ")
    val nRows = sums.head._3
    val m: Array[Long] = {
      val byI = sums.map(t => t._1 -> t._2).toMap
      Array.tabulate(dims)(i => byI(i) / nRows)
    }
    // pass 2 — centered gramian (contributions pre-divided by S)
    val cArr = zip_with(col("__mv"), lit(m), (x, mu) => x - mu)
    val gRows = base.select(cArr.as("__c"))
      .select(col("__c"), posexplode(col("__c")).as(Seq("i", "ci")))
      .select(col("i"), col("ci"), posexplode(col("__c")).as(Seq("j", "cj")))
      .select(col("i"), col("j"), expr(s"(ci * cj) div ${S}L").as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val cov = Array.tabulate(dims, dims)((i, j) => gRows((i, j)) / nRows)
    // driver power iteration (Scala Long `/` ≡ Spark div ≡ DuckDB //)
    var v = Array.fill(dims)(S)
    for (_ <- 1 to iterations) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j) * v(j) / S).sum)
      val dv = math.max(w.map(math.abs).max / S, 1L)
      v = w.map(_ / dv)
    }
    var k = 0
    for (i <- 1 until dims) if (math.abs(v(i)) > math.abs(v(k))) k = i
    if (v(k) < 0) v = v.map(x => -x)
    val w2 = Array.tabulate(dims)(i =>
      (0 until dims).map(j => cov(i)(j) * v(j) / S).sum)
    val num = (0 until dims).map(i => v(i) * w2(i) / S).sum
    val den = (0 until dims).map(i => v(i) * v(i) / S).sum
    // λ_micro = S·(v·Cv)/(v·v): num is v·Cv/S², so scale back by S before
    // the divide to keep the eigenvalue in micro-units (σ²·S of the axis).
    // num·S can exceed 2^63 within the documented |x| bound (num scales with
    // λ·den, den up to dims·S) — BigInt makes the wrap impossible; BigInt
    // `/` truncates toward zero exactly like Long `/`, so in-range results
    // are bit-identical to the previous arithmetic.
    val lam = (BigInt(num) * S / BigInt(math.max(den, 1L))).toLong
    // pass 3 — scan-local projection on the literal eigenvector
    val dot = aggregate(zip_with(cArr, lit(v), (c, vv) => c * vv),
      lit(0L), (acc, x) => acc + x)
    base.select(col("id"), dot.as("__dot"))
      .select(col("id"), expr(s"__dot div ${S}L").as("pc1_micro"),
        lit(lam).as("eigval_micro"))
  }

  // ------------------------------------------------- k-center coreset --

  /** Greedy farthest-point sampling (Gonzalez 1985) — the k-center coreset
    * selector behind diversity-first data selection: pick the point
    * farthest from everything picked so far, k times. The classic 2-approx
    * to the NP-hard k-center optimum, and the standard way to seed a
    * diverse eval/annotation subset from an embedding corpus.
    *
    * Determinism: the seed is the minimum id; every argmax breaks distance
    * ties by ascending id; distances are `‖v‖² + ‖c‖² − 2·v·c` with the
    * left-fold [[dot]], so reruns reproduce the exact sequence.
    *
    * Returns (centers, radius²): each center as (rank, id, selection
    * distance² — NULL for the seed, the greedy profile is non-increasing —
    * and its vector), plus the final covering radius² (max over the corpus
    * of the distance² to its nearest center). A corpus with fewer than k
    * distinct vector positions returns only the centers that exist (with
    * radius² = 0 — exact cover) rather than duplicating ids; an empty (or
    * all-null-vector) input is rejected with a clear message.
    *
    * Scale design: k bounded scans — each round's min-distance column is
    * the chained `least` over the literal centers so far, which projection
    * collapse fuses into ONE codegen'd expression tree re-evaluated from
    * the single checkpointed base (O(k²·d·n) arithmetic total, k ≤ 64 —
    * deliberately traded for holding ZERO per-round state: a checkpoint
    * per round would retain up to k copies of the corpus relation). The
    * only shuffle is the 1-row TakeOrdered argmax; driver state is k
    * vectors + k ids.
    */
  def kCentersDetail(df: DataFrame, id: Column, vec: Column, k: Int)
      : (Seq[(Int, Long, Option[Double], Array[Double])], Double) = {
    require(k >= 2 && k <= 64, s"k must be in [2,64], got $k")
    val base = df
      .select(id.cast("long").as("id"), vec.cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("nn", dot(col("v"), col("v")))
      .localCheckpoint(eager = true)       // k rounds re-read this relation
    def d2(last: Array[Double]): Column =
      col("nn") + lit(last.map(x => x * x).sum) -
        lit(2.0) * dot(col("v"), typedLit(last.toSeq))
    val seedRows = base.orderBy(asc("id")).limit(1).collect()
    require(seedRows.nonEmpty,
      "kCentersDetail: input has no rows with a non-null vector")
    val seed = seedRows(0)
    var centers = Vector((1, seed.getLong(0), Option.empty[Double],
      seed.getSeq[Double](1).toArray))
    var cur = base.withColumn("md", lit(Double.MaxValue))
    // Early stop: argmax distance² ≤ 0 means every point coincides with a
    // chosen center (fewer than k distinct positions in the corpus) — keep
    // selecting and we would re-pick existing ids with sel_dist2 = 0,
    // breaking the k-distinct-centers invariant. Return the < k centers
    // actually found, with radius² = 0 (the corpus is covered exactly).
    var exhausted = false
    var r = 2
    while (r <= k && !exhausted) {
      cur = cur.withColumn("md", least(col("md"), d2(centers.last._4)))
      val nxt = cur.orderBy(desc("md"), asc("id")).limit(1).collect()(0)
      val sd = nxt.getDouble(3)
      if (sd <= 0.0) exhausted = true
      else {
        centers :+= ((r, nxt.getLong(0), Some(sd),
          nxt.getSeq[Double](1).toArray))
        r += 1
      }
    }
    val radius2 =
      if (exhausted) 0.0
      else cur.withColumn("md", least(col("md"), d2(centers.last._4)))
        .agg(max(col("md"))).collect()(0).getDouble(0)
    (centers, radius2)
  }

  /** [[kCentersDetail]] as a relation: (rank, id, sel_dist2, radius2). */
  def kCenters(df: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    val (centers, r2) = kCentersDetail(df, id, vec, k)
    val spark = df.sparkSession
    import spark.implicits._
    centers.map { case (rank, cid, sd, _) =>
      (rank.toLong, cid, sd, r2)
    }.toDF("rank", "id", "sel_dist2", "radius2")
  }

  /** Silhouette audit of a labeling's geometric coherence (Rousseeuw 1987)
    * over a BOUNDED sample: per sampled vector, `a` = mean cosine distance
    * to its OWN label's other sampled members, `b` = the smallest
    * per-other-label mean distance, `s = (b−a)/max(a,b)` — the standard
    * "are my class labels actually clusters in embedding space?" check a
    * training-data pipeline runs before trusting labels for splits or
    * curriculum.
    *
    * Exact-arithmetic contract (the x142 discipline): each pair's distance
    * is ONE rounded integer `10⁶ − sim_micro`; per-(anchor, label) means
    * are integer-sum / count — one IEEE division, rounded once; `b` takes
    * the min over those ALREADY-ROUNDED means (tie → smaller label), and
    * `s` is one more division of two integers. Singleton labels (no
    * same-label peer) get `s = 0` with a flag — sklearn's convention —
    * never a NULL blow-up; `max(a,b) = 0` (all points identical) also
    * yields 0.
    *
    * Scale shape: the caller passes an already-bounded sample
    * ([[bruteForceTopK]]'s contract); the pairwise join broadcasts one
    * side, the per-(anchor,label) rollup and the final assembly are
    * sample-bounded broadcasts.
    */
  def labelSilhouette(sample: DataFrame): DataFrame = {
    val a = sample.select(col("vec_id").as("anchor_id"),
      col("label").as("anchor_label"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn"))
    val c = broadcast(sample.select(col("vec_id").as("other_id"),
      col("label").as("other_label"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn")))
    val means = a.join(c, col("anchor_id") =!= col("other_id"))
      .withColumn("__d_micro", lit(1000000L) -
        round(when(col("qn") === 0.0 || col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          * 1e6).cast("long"))
      .groupBy("anchor_id", "anchor_label", "other_label")
      .agg(round(sum(col("__d_micro")).cast("double") / count(lit(1)))
        .cast("long").as("mean_micro"),
        count(lit(1)).as("__n"))
    val own = means.filter(col("anchor_label") === col("other_label"))
      .select(col("anchor_id"), col("__n").as("n_same"),
        col("mean_micro").as("a_micro"))
    val other = means.filter(col("anchor_label") =!= col("other_label"))
      .groupBy("anchor_id")
      .agg(min(struct(col("mean_micro"), col("other_label"))).as("b"))
      .select(col("anchor_id"), col("b.mean_micro").as("b_micro"),
        col("b.other_label").as("b_label"))
    sample.select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
      .join(broadcast(own), Seq("anchor_id"), "left")
      .join(broadcast(other), Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("anchor_label"),
        coalesce(col("n_same"), lit(0L)).as("n_same"),
        col("a_micro"), col("b_micro"), col("b_label"),
        when(col("a_micro").isNull || col("b_micro").isNull ||
          greatest(col("a_micro"), col("b_micro")) === 0L, lit(0L))
          .otherwise(round((col("b_micro") - col("a_micro")).cast("double") /
            greatest(col("a_micro"), col("b_micro")) * 1e6).cast("long"))
          .as("s_micro"),
        col("a_micro").isNull.as("singleton"))
  }

  /** Triplet-margin mining — the semi-hard negative statistics that drive a
    * triplet / contrastive training loop (FaceNet-style). For each anchor
    * vector the POSITIVE is its most-cosine-similar SAME-label vector
    * (excluding itself); the mined set is every DIFFERENT-label vector whose
    * similarity lands inside the margin band `sim_neg > sim_pos − margin`
    * (hard + semi-hard negatives — the ones with non-zero triplet loss).
    * Output, one row per anchor that has a positive: the positive, the
    * violation count, the hardest negative, and the summed hinge loss
    * `Σ max(0, sim_neg − sim_pos + margin)`.
    *
    * All similarity comparisons and the loss run in integer MICRO-units
    * (`round(sim·1e6)` as BIGINT): the band test and the loss sum are exact
    * integer arithmetic, so results hash-reproduce across engines with no
    * float-boundary risk — the x101 lesson applied to a float threshold.
    *
    * Scale shape: anchors are a bounded sample and broadcast ([[bruteForceTopK]]
    * contract); the corpus is scanned once and never shuffled by the join.
    * The positive pick and the per-anchor rollup aggregate |anchors|-bounded
    * rows; the positive→negative join broadcasts the one-row-per-anchor side.
    */
  def tripletMarginMine(anchors: DataFrame, corpus: DataFrame,
      marginMicro: Long): DataFrame = {
    val q = broadcast(anchors.select(col("vec_id").as("anchor_id"),
      col("label").as("anchor_label"), col("embedding").as("qv"),
      norm(col("embedding")).as("qn")))
    val c = corpus.select(col("vec_id").as("other_id"),
      col("label").as("other_label"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val scored = q.join(c, col("anchor_id") =!= col("other_id"))
      .withColumn("sim_micro",
        round(when(col("qn") === 0.0 || col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          * 1e6).cast("long"))
      .select("anchor_id", "anchor_label", "other_id", "other_label",
        "sim_micro")
    // positive = argmax sim over same-label others; max(struct(sim, -id))
    // realizes ORDER BY sim DESC, id ASC deterministically in one aggregate.
    val pos = scored.filter(col("anchor_label") === col("other_label"))
      .groupBy("anchor_id", "anchor_label")
      .agg(max(struct(col("sim_micro"), (-col("other_id")).as("nid"))).as("p"))
      .select(col("anchor_id"), col("anchor_label"),
        (-col("p.nid")).as("pos_id"), col("p.sim_micro").as("pos_sim_micro"))
    val viol = scored.filter(col("anchor_label") =!= col("other_label"))
      .join(broadcast(pos.select("anchor_id", "pos_sim_micro")), "anchor_id")
      .filter(col("sim_micro") > col("pos_sim_micro") - marginMicro)
      .groupBy("anchor_id")
      .agg(count(lit(1)).as("n_violations"),
        max(struct(col("sim_micro"), (-col("other_id")).as("nid"))).as("h"),
        sum(greatest(lit(0L),
          col("sim_micro") - col("pos_sim_micro") + marginMicro))
          .as("loss_sum_micro"))
      .select(col("anchor_id"), col("n_violations"),
        (-col("h.nid")).as("hardest_neg_id"),
        col("h.sim_micro").as("hardest_neg_sim_micro"),
        col("loss_sum_micro"))
    // both sides are |anchors|-bounded; broadcast the rollup
    pos.join(broadcast(viol), Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("anchor_label"), col("pos_id"),
        col("pos_sim_micro"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        col("hardest_neg_id"), col("hardest_neg_sim_micro"),
        coalesce(col("loss_sum_micro"), lit(0L)).as("loss_sum_micro"))
  }
}
