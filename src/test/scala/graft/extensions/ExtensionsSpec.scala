package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for the training-data extensions — especially the LSH family
  * that the DuckDB oracle can't check (engine-specific hashes).
  */
class ExtensionsSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs = {
    import spark.implicits._
    // corpus with planted near-dups: (id, text); 100/101 identical, 102 near-dup
    // of 100 (one token changed), 200+ unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (100L, base, "en"),
      (101L, base, "en"),
      (102L, base.replace("kappa", "lambda"), "en"),
      (200L, "one two three four five six seven eight nine ten", "en"),
      (201L, "red orange yellow green blue indigo violet pink brown black", "es")
    ).toDF("doc_id", "text", "lang")
  }

  test("exact dedup keeps first by keep-order and counts duplicates") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
      .select("doc_id", "dup_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(100L, 102L, 200L, 201L)) // 101 deduped into 100
    assert(out(100L) == 2 && out(102L) == 1)
  }

  test("lshBandPlan picks the divisor pair whose S-curve midpoint is closest") {
    // exhaustive replica over divisors for k=32 at several thresholds
    for (t <- Seq(0.2, 0.5, 0.8, 0.95)) {
      val (b, r) = Dedup.lshBandPlan(32, t)
      assert(b * r == 32)
      val mids = (1 to 32).filter(32 % _ == 0)
        .map(bb => (bb, math.pow(1.0 / bb, 1.0 / (32 / bb))))
      val bestErr = mids.map { case (_, m) => math.abs(m - t) }.min
      assert(math.abs(math.pow(1.0 / b, 1.0 / r) - t) <= bestErr + 1e-12)
    }
    // the classic operating points: k=32 at 0.5 → many narrow bands (high
    // recall); a very high threshold wants few wide bands
    val (bLow, _) = Dedup.lshBandPlan(32, 0.3)
    val (bHigh, _) = Dedup.lshBandPlan(32, 0.95)
    assert(bLow > bHigh)
    // midpoint of the shipped default (k=32, bands=8, rows=4) sits near 0.6:
    // plan for that threshold must return it
    assert(Dedup.lshBandPlan(32, math.pow(1.0 / 8, 1.0 / 4)) == ((8, 4)))
    intercept[IllegalArgumentException] { Dedup.lshBandPlan(32, 1.0) }
  }

  test("minhash estimate tracks exact jaccard on planted dups") {
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
      k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical docs: every minhash component equal → estimate 1.0
    assert(pairs((100L, 101L)) == 1.0)
    // near-dup (9/11 shingle overlap ≈ 0.8 jaccard): estimate must be high
    assert(pairs.contains((100L, 102L)) && pairs((100L, 102L)) >= 0.5)
    // unrelated docs never pair
    assert(!pairs.keys.exists { case (a, b) => b >= 200L && a < 200L })
  }

  test("connected components: path / star / clique / disjoint topologies") {
    import spark.implicits._
    // every topology through BOTH strategies: the single-task union-find fast
    // path (default threshold) and the distributed min-label propagation
    // (forced by localEdgeThreshold = 0) — labelings must be identical
    def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val df = edges.toDF("id_a", "id_b")
      val local = Dedup.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Dedup.connectedComponents(df, localEdgeThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == local, "distributed propagation disagrees with union-find")
      local
    }

    // 200-node path: diameter 199 >> maxIter 64 — only the pointer-jumping
    // O(log n) convergence can label it; plain neighbor-min would time out
    val path = (1L until 200L).map(i => (i, i + 1))
    assert(comps(path) == (1L to 200L).map(_ -> 1L).toMap)

    // star: all leaves collapse to the center's min
    val star = (2L to 60L).map(i => (30L, i)) // center 30, leaf ids around it
    assert(comps(star).values.toSet == Set(2L))

    // clique on 0..9 plus a disjoint pair — two components
    val clique = for (a <- 0L to 9L; b <- (a + 1) to 9L) yield (a, b)
    val got = comps(clique ++ Seq((100L, 101L)))
    assert((0L to 9L).forall(got(_) == 0L) && got(100L) == 100L && got(101L) == 100L)

    // self-loops and empty input are safe
    assert(comps(Seq((5L, 5L))).isEmpty)
    assert(comps(Seq.empty).isEmpty)
  }

  test("resolveClusters: survivor per cluster by keep order, singletons kept") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10, "a"), (2L, 30, "b"), (3L, 30, "c"), // cluster {1,2,3}
      (4L, 99, "d"), // singleton
      (5L, 7, "e"), (6L, 9, "f") // cluster {5,6}
    ).toDF("id", "quality", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    // keep = -quality → survivor is max quality, tie-break min id
    val out = Dedup.resolveClusters(rows, col("id"), -col("quality"), pairs)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_survivor")))).toMap
    assert(out(1L) == ((1L, 3L, false)))
    assert(out(2L) == ((1L, 3L, true))) // quality 30 tie with 3, lower id wins
    assert(out(3L) == ((1L, 3L, false)))
    assert(out(4L) == ((4L, 1L, true)))
    assert(out(5L) == ((5L, 2L, false)))
    assert(out(6L) == ((5L, 2L, true)))
    val survivors = Dedup.clusterSurvivors(rows, col("id"), -col("quality"), pairs)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(survivors == Set(2L, 4L, 6L))
  }

  test("resolveClusters mega-cluster skew: groupBy shape ≡ window shape") {
    // One component holding 50% of all rows — the duplicate-storm profile that
    // makes WindowExec buffer half the corpus in a single task. The skew gate
    // must switch to the map-side-combining groupBy + join-back shape, and the
    // two shapes must be row-identical on the same input.
    val n = 200000L
    val rows = spark.range(n).select(col("id").as("doc_id"),
      (col("id") % 97).as("quality"))
    // star component {0 .. n/2-1} plus scattered 2-clusters in the upper half
    val mega = spark.range(1, n / 2)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val small = spark.range(n / 2 + 1, n - 1, 4)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val pairs = mega.union(small)
    val keep = -col("quality")
    val windowed = Dedup.resolveClusters(rows, col("doc_id"), keep, pairs,
      maxWindowedClusterSize = Long.MaxValue) // force window shape
    val grouped = Dedup.resolveClusters(rows, col("doc_id"), keep, pairs,
      maxWindowedClusterSize = 1000) // force skew shape (mega = n/2 members)
    assert(windowed.columns.sameElements(grouped.columns))
    val wRows = windowed.orderBy("doc_id").collect()
    val gRows = grouped.orderBy("doc_id").collect()
    assert(wRows.length == n && wRows.sameElements(gRows),
      "skew-gated groupBy shape diverged from the window shape")
    // mega cluster resolved correctly: size n/2, exactly one survivor = the
    // max-quality member (quality = id % 97, keep = -quality, min id breaks
    // ties) — id 96 is the first row hitting the max residue 96
    val megaRows = gRows.filter(_.getAs[Long]("component") == 0L)
    assert(megaRows.length == n / 2)
    val survivors = megaRows.filter(_.getAs[Boolean]("is_survivor"))
    assert(survivors.map(_.getAs[Long]("doc_id")).toSeq == Seq(96L))
  }

  test("nearDupDedup end-to-end: planted dups collapse to one survivor") {
    // docs: 100/101 identical, 102 near-dup of 100 → one cluster {100,101,102};
    // 200 and 201 unrelated → survive as singletons
    val out = Dedup.nearDupDedup(docs, col("doc_id"), col("text"), col("doc_id"))
    val survivors = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(survivors == Set(100L, 200L, 201L))
    val sizes = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_size")).toMap
    assert(sizes(100L) == 3 && sizes(200L) == 1 && sizes(201L) == 1)
  }

  test("simhash: identical docs at distance 0, unrelated docs far") {
    val sk = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sk"))
    val d = sk.as("a").join(sk.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.simhashDistance(col("a.sk"), col("b.sk")).as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(d((100L, 101L)) == 0)
    assert(d((100L, 102L)) < d((100L, 200L)))
    assert(d((100L, 200L)) > 10)
  }

  test("simhashPairs pigeonhole blocking finds the planted pair") {
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)))
  }

  test("ngram jaccard: identical=1, near-dup high, cross-block suppressed") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      col("lang"), n = 1, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((100L, 101L)) == 1.0)
    assert(pairs((100L, 102L)) == math.round(9.0 / 11.0 * 1e6) / 1e6)
    assert(!pairs.keys.exists { case (_, b) => b == 201L } // es block never joins en
    )
  }

  test("ngram jaccard: bitset fast path ≡ array_intersect path on corpus text") {
    // the vocab gate must be invisible in results: same pairs, same inter,
    // bit-equal rounded jaccard — on real corpus text where both blocks and
    // near-dup structure are nontrivial
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(size(TextAnalysis.tokens(col("text"))) > 0)
    def run(maxVocab: Int) = Dedup.ngramJaccardPairs(corpus, col("doc_id"),
      col("text"), concat(col("lang"), lit("|"), (col("n_chars") / 25).cast("long")),
      n = 1, threshold = 0.5, maxDictVocab = maxVocab)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val bitset = run(4096) // corpus vocab ≈ 31 → bitset path
    val array = run(0)     // forced array_intersect path
    assert(bitset.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(bitset.sameElements(array))
  }

  test("mega-doc robustness: MB-scale text through the sketch/stat operators") {
    // a 100 TB corpus always contains pathological rows (concatenated dumps,
    // minified bundles). One ~2 MB doc must flow through shingling, both
    // sketches, fingerprinting and the quality stats without error — and the
    // sketch outputs must stay size-bounded (corpus-independent widths).
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val mega = (1 to 300000).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    assert(mega.length > 1500000)
    val df = Seq((1L, mega)).toDF("doc_id", "text")
    val row = df.select(
        size(Dedup.shingles(col("text"), 3)).as("n_shingles"),
        size(Dedup.minhashSignature(Dedup.shingles(col("text"), 3))).as("sig_w"),
        Dedup.simhash(col("text")).as("sk"),
        TextAnalysis.docFingerprint(col("text")).as("fp"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tok"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
      .collect().head
    assert(row.getAs[Int]("n_shingles") > 900) // 10-word vocab → ≤1000 3-grams
    assert(row.getAs[Int]("sig_w") == 32)      // signature width is corpus-free
    assert(row.getAs[Int]("n_tok") == 300000)
    assert(!row.isNullAt(row.fieldIndex("sk")) && !row.isNullAt(row.fieldIndex("fp")))
    assert(row.getAs[Double]("q") >= 0.0 && row.getAs[Double]("q") <= 1.0)

    // round-7 text operators on the same pathological row: the regex chains
    // must stay linear (no catastrophic backtracking on MB inputs) and the
    // line machinery must survive a 100k-line document
    val cleaned = df.select(
        length(TextAnalysis.cleanText(col("text"))).as("c"),
        length(TextAnalysis.normalizeForDedup(col("text"))).as("n"),
        size(TextAnalysis.extractUrls(col("text"))).as("u"))
      .collect().head
    assert(cleaned.getAs[Int]("c") == mega.length) // already clean → unchanged
    assert(cleaned.getAs[Int]("n") == mega.length) // already canonical
    assert(cleaned.getAs[Int]("u") == 0)
    val megaLines = df.select(col("doc_id"),
      regexp_replace(col("text"), " ", "\n").as("text"))
    val ld = Dedup.lineDedup(megaLines, col("doc_id"), col("text"), maxDocFreq = 1)
      .collect().head
    assert(ld.getAs[Long]("n_lines") == 300000)
    assert(ld.getAs[Long]("n_removed") == 0) // one doc → every line unique-doc
  }

  test("ngram jaccard bitset path: word-boundary vocabularies (63..65, 129)") {
    // mask width = ceil(vocab/64) words: vocab 63/64 fit one long, 65 spills
    // into a second, 129 into a third — the off-by-one-word shapes where a
    // bit-layout bug would hide. Docs draw deterministic overlapping slices
    // so pairs straddle the threshold both ways.
    import spark.implicits._
    for (vocab <- Seq(63, 64, 65, 129)) {
      val words = (0 until vocab).map(i => s"w$i")
      // doc i = 8 consecutive words starting at 3i (mod vocab) — adjacent
      // docs overlap 5/11 ≈ 0.45, distant docs 0
      val docsV = (0L until 40L).map { i =>
        val s = (0 until 8).map(j => words(((i * 3).toInt + j) % vocab)).mkString(" ")
        (i, s)
      }.toDF("doc_id", "text")
      def run(maxVocab: Int) = Dedup.ngramJaccardPairs(docsV, col("doc_id"),
        col("text"), lit("all"), n = 1, threshold = 0.4, maxDictVocab = maxVocab)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      val bitset = run(4096)
      val array = run(0)
      assert(bitset.nonEmpty && bitset.sameElements(array), s"vocab=$vocab")
    }
  }

  test("cosine column: known values, zero-norm guard") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 1.0f), Array(1.0f, -1.0f), 0.0),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f), 0.0) // zero vector → 0 by definition
    ).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("ANN recall: bucketed top-1 finds the planted twin vector") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = (0L until 60L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    // plant a twin: 999 ≈ copy of 0 (tiny noise) — cosine ≈ 1
    val twin = (999L, vecs(0)._2.map(x => x + 0.001f))
    val df = (vecs :+ twin).toDF("vec_id", "embedding")
    val ann = Similarity.annTopK(df, k = 1, nBits = 6)
      .filter(col("query_id") === 999L).collect()
    assert(ann.nonEmpty && ann(0).getAs[Long]("neighbor_id") == 0L)
    // and brute force agrees
    val bf = Similarity.bruteForceTopK(df.filter(col("vec_id") === 999L), df, k = 1).collect()
    assert(bf(0).getAs[Long]("neighbor_id") == 0L)
  }

  test("annTopK(queries, corpus): identical to self-join + filter, subset structural") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = (0L until 120L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") % 10 === 0)
    val twoSided = Similarity.annTopK(queries, df, k = 3, nBits = 5)
    val selfJoin = Similarity.annTopK(df, k = 3, nBits = 5)
      .filter(col("query_id") % 10 === 0)
    assert(twoSided.exceptAll(selfJoin).isEmpty && selfJoin.exceptAll(twoSided).isEmpty)
    // the query subset must be structural: the filtered query scan feeds a
    // BroadcastExchange BELOW the bucket join — not a Filter above the window
    val plan = twoSided.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("BroadcastExchange"), plan)
    val windowPos = plan.indexOf("Window")
    val broadcastPos = plan.indexOf("BroadcastExchange")
    assert(windowPos >= 0 && broadcastPos >= 0)
    assert(!plan.substring(0, windowPos).contains("% 10"),
      "query-id predicate should not sit above the window")
  }

  test("multi-probe LSH: Hamming-2 probe set dominates Hamming-1 per rank") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    val df = (0L until 150L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") % 15 === 0)
    def byRank(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Double]("sim"), r.getAs[Long]("neighbor_id"))).toMap
    val h1 = byRank(Similarity.annTopKMultiProbe(queries, df, k = 3, nBits = 6))
    val h2 = byRank(Similarity.annTopKMultiProbe(queries, df, k = 3, nBits = 6,
      maxHamming = 2))
    // radius-2 probes a SUPERSET of radius-1's buckets, so at every (query,
    // rank) the radius-2 list's similarity must be >= radius-1's
    h1.foreach { case (qr, (sim1, _)) =>
      assert(h2.contains(qr), s"$qr vanished under wider probing")
      assert(h2(qr)._1 >= sim1, s"$qr: h2 sim ${h2(qr)._1} < h1 sim $sim1")
    }
    assert(h2.size >= h1.size)
    intercept[IllegalArgumentException] {
      Similarity.annTopKMultiProbe(queries, df, k = 3, nBits = 6,
        maxHamming = 3)
    }
  }

  test("IVF recall: probed cells find the planted twin; recall vs brute force") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vecs = (0L until 80L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    val twin = (999L, vecs(0)._2.map(x => x + 0.001f))
    val df = (vecs :+ twin).toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") % 10 === 0)
    val ivf = Similarity.ivfTopK(queries, df, k = 1, nCentroids = 4, nProbe = 2)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    // the twin pair is near-identical → same cell; top-1 must find it
    // (999 is not in `queries`; 0 queries and must hit 999)
    assert(ivf(0L) == 999L)
    // probing half the cells should agree with brute force on most queries
    val bf = Similarity.bruteForceTopK(queries, df, k = 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val agree = ivf.count { case (q, n) => bf.get(q).contains(n) }
    assert(agree >= (bf.size * 0.5).toInt, s"IVF agreed on $agree of ${bf.size}")
  }

  test("corpus profile: sketch estimates within tolerance of exact values") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val profile = TextAnalysis.corpusProfile(docs, col("lang"), col("text"))
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    val exact = docs
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("lang").agg(countDistinct(col("tok")).as("vocab"), count(lit(1)).as("total"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("vocab"), r.getAs[Long]("total"))).toMap
    for ((lang, (vocab, total)) <- exact) {
      val p = profile(lang)
      assert(p.getAs[Long]("total_tokens") == total) // counts are exact
      val approx = p.getAs[Long]("approx_vocab").toDouble
      assert(math.abs(approx - vocab) / vocab < 0.1,
        s"$lang: approx $approx vs exact $vocab") // HLL within 10% at rsd=2%
      val q = p.getSeq[Int](p.fieldIndex("len_quantiles"))
      assert(q.length == 3 && q(0) <= q(1) && q(1) <= q(2)) // monotone p50<=p90<=p99
    }
  }

  test("multimodal decode plumbing: deterministic metadata, frame sampling, resize") {
    import spark.implicits._
    val assets = Seq(
      (1L, "image/png", "HELLOBYTES".getBytes("UTF-8"), "s"),
      (2L, "video/mp4", "MOVIEBYTES".getBytes("UTF-8"), "s")
    ).toDF("asset_id", "mime", "content", "source")
    val fake = () => new Multimodal.FakeDecoder
    val meta = Multimodal.decodeAssets(assets, fake).toDF()
    val rows = meta.collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("decode_ok"))
    assert(rows(1L).getAs[Long]("duration_ms") == 0L && rows(1L).getAs[Int]("n_frames") == 1)
    assert(rows(2L).getAs[Long]("duration_ms") > 0L && rows(2L).getAs[Int]("n_frames") > 1)
    // decode is deterministic (sha-derived)
    val again = Multimodal.decodeAssets(assets, fake).toDF().collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Int]("width")).toMap
    assert(again(1L) == rows(1L).getAs[Int]("width"))

    val frames = Multimodal.sampleFrames(meta, 4)
      .filter(col("asset_id") === 2L).collect().map(_.getAs[Int]("frame_idx"))
    assert(frames.length >= 2 && frames.forall(i => i >= 0 && i < rows(2L).getAs[Int]("n_frames")))

    val resized = Multimodal.resizePlan(meta, 128).collect()
      .map(r => (r.getAs[Int]("target_width"), r.getAs[Int]("target_height")))
    assert(resized.forall { case (w, h) => w <= 128 && h <= 128 && w > 0 && h > 0 })
  }

  test("ImageIoDecoder reads true dimensions from real png/jpeg/tiff/bmp/gif bytes") {
    def png(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(w / 2, h / 2, 0x336699)
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no writer for $fmt")
      baos.toByteArray
    }
    val dec = new Multimodal.ImageIoDecoder
    for (fmt <- Seq("png", "jpg", "tif", "bmp", "gif")) {
      assert(dec.decode(s"image/$fmt", png(37, 23, fmt)) == ((37, 23, 0L)), fmt)
      assert(dec.decode(s"image/$fmt", png(1, 1, fmt)) == ((1, 1, 0L)), fmt)
    }
    // wav: 4000 frames of 8-bit mono at 8 kHz = exactly 500 ms
    val fmtA = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](4000)), fmtA, 4000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    assert(dec.decode("audio/wav", baos.toByteArray) == ((0, 0, 500L)))
    // corrupt / unsupported bytes surface as exceptions (decode_ok=false rows upstream)
    intercept[Exception] { dec.decode("image/png", "notanimage".getBytes) }
    intercept[Exception] { dec.decode("video/mp4", new Array[Byte](16)) }
  }

  test("x23 pipeline: synthetic real media decodes to doc_id-derived metadata (sf0.001)") {
    val meta = Multimodal.decodeAssets(
      Multimodal.syntheticMediaAssets(spark, "/root/testdata/sf0.001")).toDF()
    val rows = meta.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("decode_ok")))
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      if (id % 4 == 3) {
        assert(r.getAs[Int]("width") == 0 && r.getAs[Long]("duration_ms") == (800 + (id % 400) * 8) / 8, id)
      } else {
        assert(r.getAs[Int]("width") == 16 + (id % 97).toInt, id)
        assert(r.getAs[Int]("height") == 16 + (id % 61).toInt, id)
        assert(r.getAs[Long]("duration_ms") == 0L, id)
      }
    }
  }

  test("PII redaction: emails, IPs, phones replaced; clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "server 192.168.1.254 and phone 415-555-1234 or 555-0199",
      "no pii here, just words and 12 numbers",
      "").toDF("text")
    val got = rows.select(TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) == "mail me at [EMAIL] today")
    assert(got(1) == "server [IP] and phone [PHONE] or [PHONE]")
    assert(got(2) == "no pii here, just words and 12 numbers")
    assert(got(3) == "")
  }

  test("quality filters: clean prose keeps, degenerate text drops") {
    import spark.implicits._
    val rows = Seq(
      ("good", "the quick brown fox jumps over the lazy dog near the river bank"),
      ("symbols", "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____"),
      ("longtoks", "abcdefghijklmnopqrstuvwxyz abcdefghijklmnopqrstuvwxyz"),
      ("boiler", "nav\nnav\nnav\nnav\nnav\nnav\nnav\nnav\ncontent here")
    ).toDF("name", "text")
    val got = rows.select(col("name"), TextAnalysis.qualityKeep(col("text")).as("k"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("good"))
    assert(!got("symbols")) // alpha ratio too low
    assert(!got("longtoks")) // mean word length 26
    assert(!got("boiler")) // 7 of 9 lines are duplicates
  }

  test("contamination: benchmark docs score 1.0, disjoint docs 0.0, overlap in between") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"), // the benchmark doc
      (2L, "alpha beta gamma delta epsilon"), // identical → fully contaminated
      (3L, "zeta eta theta iota kappa"), // disjoint → 0
      (4L, "alpha beta gamma unrelated tokens here") // partial overlap
    ).toDF("doc_id", "text")
    val out = Contamination.ngramContamination(d, d.filter(col("doc_id") === 1),
        col("doc_id"), col("text"), n = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("contamination")).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0)
    assert(out(3L) == 0.0)
    assert(out(4L) > 0.0 && out(4L) < 1.0) // "alpha beta gamma" hits, rest misses
  }

  test("ngramNovelty: unseen ppm exact, ref excluded, short docs one window") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta", true),   // ref: grams {a b g, b g d}
      (2L, "alpha beta gamma delta", false),  // fully covered → 0 ppm
      (3L, "zeta eta theta iota", false),     // fully novel → 1e6 ppm
      (4L, "alpha beta gamma nu xi", false),  // 1 of 3 grams covered
      (5L, "one two", false),                 // short: ONE window "one two"
      (6L, "", false)                         // empty: one "" window, unseen
    ).toDF("doc_id", "text", "is_ref")
    val out = Contamination.ngramNovelty(d, col("doc_id"), col("text"),
        col("is_ref"), n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(!out.contains(1L), "reference docs are not scored")
    assert(out(2L) == ((2L, 0L, 0L)))
    assert(out(3L) == ((2L, 2L, 1000000L)))
    assert(out(4L) == ((3L, 2L, 666666L)))   // (2·1e6) div 3 truncates
    assert(out(5L) == ((1L, 1L, 1000000L)))
    assert(out(6L) == ((1L, 1L, 1000000L)))
  }

  test("nearDupContamination: paraphrased eval leaks flagged, train-train dups not") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river shore"), // ≈1 (train-train, must NOT flag)
      (3L, "completely unrelated text about catalyst optimizer rule batches"),
      (4L, "what is the capital city of france and when was it founded there"), // ≈ eval 101
      (5L, "   ") // token-less: must appear clean, never match eval 103
    ).toDF("doc_id", "text")
    val eval = Seq(
      (101L, "what is the capital city of france and when was it founded here"),
      (102L, "name every planet of the solar system in order from the sun now"),
      (103L, "") // token-less eval: must pair with nothing
    ).toDF("doc_id", "text")
    val out = Contamination.nearDupContamination(train, eval,
        col("doc_id"), col("text"), block = lit("all"), n = 1, threshold = 0.7)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_contaminated"), r.getAs[Long]("n_eval_matches"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L)) // every train row present
    assert(out(4L) == (true, 1L), s"got $out")
    assert(!out(1L)._1 && !out(2L)._1 && !out(3L)._1, s"got $out") // train-train ≈1 pair ignored
    assert(out(5L) == (false, 0L), s"got $out") // empty⋈empty is not contamination
  }

  test("embeddingDecontamination: planted eval twin flagged, train-train twin not") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    def v() = Array.fill(16)(rng.nextGaussian().toFloat)
    def near(a: Array[Float]) = a.map(x => x + 0.01f)
    val (a, b, c) = (v(), v(), v())
    val train = Seq((1L, a), (2L, near(a)), (3L, b), (4L, near(c)))
      .toDF("vec_id", "embedding")
    val eval = Seq((101L, c), (102L, v())).toDF("vec_id", "embedding")
    val out = Similarity.embeddingDecontamination(train, eval,
        block = lit("all"), threshold = 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("is_contaminated"), r.getAs[Long]("n_eval_matches"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(4L) == (true, 1L), s"got $out")        // ≈ eval 101
    assert(!out(1L)._1 && !out(2L)._1 && !out(3L)._1, // 1≈2 is train-train
      s"got $out")
  }

  test("chunking: window count, overlap, tail length, short and empty docs") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: chunks at 0,4,8? n=10,c=4,s=3 → ceil(6/3)+1 = 3
      (2L, "a b"), // shorter than chunk → 1 window of 2
      (3L, "   ") // token-less → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(d, col("doc_id"), col("text"), chunkSize = 4, stride = 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_idx")) ->
        ((r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text")))).toMap
    assert(out.keys.count(_._1 == 1L) == 3)
    assert(out((1L, 0L)) == ((4, "t1 t2 t3 t4")))
    assert(out((1L, 1L)) == ((4, "t4 t5 t6 t7"))) // overlap of 1 token
    assert(out((1L, 2L)) == ((4, "t7 t8 t9 t10")))
    assert(out((2L, 0L)) == ((2, "a b")))
    assert(!out.keys.exists(_._1 == 3L))
    // every token of every doc is covered by at least one window
    val covered = out.collect { case ((1L, _), (_, txt)) => txt.split(" ") }.flatten.toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("text analysis: language profiles score their own stopwords highest") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog of it", "en"),
      ("el perro y la casa de los", "es"),
      ("le chien et la maison des", "fr")
    ).toDF("text", "want")
    val got = df.select(TextAnalysis.languageId(col("text")).as("got"), col("want")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("fingerprint: equal texts equal, shifted window stable") {
    import spark.implicits._
    val df = Seq("abcdefghijklmno", "abcdefghijklmno", "xyzdefghijklmno").toDF("t")
    val fps = df.select(TextAnalysis.docFingerprint(col("t")).as("fp")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    // shares shingles 'defghijk'… → min may coincide; just assert determinism + range
    assert(fps.forall(f => f >= 0 && f < (1L << 48)))
  }
}
