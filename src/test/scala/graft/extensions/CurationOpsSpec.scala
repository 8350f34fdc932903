package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for the round-8 curation operators: cluster-aware splits,
  * domain blocklists, embedding standardization, length-bucketed batching,
  * OOV rate. */
class CurationOpsSpec extends AnyFunSuite with SparkTestSession {

  test("clusterAwareSplit: near-dup cluster members land in the SAME split") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // pairs chain docs into 50 clusters of 4: (1,2),(2,3),(3,4), (5,6)...
    val pairs = (1L to 200L).filter(i => i % 4 != 0)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Sampling.clusterAwareSplit(docs, col("doc_id"), pairs,
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25), salt = "s1")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[String]("split")))
    assert(out.length == 200)
    // every member of a component shares its split
    out.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1)
    }
    // components are the 4-chains: component = smallest id in the chain
    out.foreach { case (id, comp, _) => assert(comp == ((id - 1) / 4) * 4 + 1) }
    // and all three splits actually occur across the 50 clusters
    assert(out.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("domainSuffixes and literal blocklist: longest rule wins") {
    import spark.implicits._
    val d = Seq("a.b.example.com", "example.com", "web.com", "org", "")
      .toDF("domain")
    val sfx = d.select(col("domain"),
      TextAnalysis.domainSuffixes(col("domain")).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sfx("a.b.example.com") ==
      Seq("a.b.example.com", "b.example.com", "example.com", "com"))
    assert(sfx("org") == Seq("org"))
    assert(sfx("") == Seq())
    val rules = Seq("example.com", "b.example.com", "com")
    val hit = d.select(col("domain"),
      TextAnalysis.domainBlockedBy(col("domain"), rules).as("by")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // most specific (longest) rule wins, not the lexicographic max ("com")
    assert(hit("a.b.example.com").contains("b.example.com"))
    assert(hit("example.com").contains("example.com"))
    assert(hit("web.com").contains("com")) // suffix is the whole label "com"
    assert(hit("org").isEmpty)
  }

  test("markBlockedDomains: DataFrame rules agree with the literal expression") {
    import spark.implicits._
    val rules = Seq("example.com", "b.example.com", "com")
    val docs = Seq(
      (1L, "a.b.example.com"), (2L, "example.com"), (3L, "safe.org"),
      (4L, "x.example.com"), (5L, "")
    ).toDF("id", "domain")
    val marked = TextAnalysis.markBlockedDomains(docs, col("id"), col("domain"),
        rules.toDF("rule")).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("is_blocked"), Option(r.getAs[String]("blocked_by"))))).toMap
    assert(marked(1L) == ((true, Some("b.example.com"))))
    assert(marked(2L) == ((true, Some("example.com"))))
    assert(marked(3L) == ((false, None)))
    assert(marked(4L) == ((true, Some("example.com"))))
    assert(marked(5L) == ((false, None)))
    // and the literal-expression path gives the same verdicts
    val lit = docs.select(col("id"),
      TextAnalysis.domainBlockedBy(col("domain"), rules).as("by")).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getString(1))).toMap
    marked.foreach { case (id, (_, by)) => assert(lit(id) == by, s"id=$id") }
  }

  test("standardizeEmbeddings: z-scores match a driver-side computation") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (1L to 50L).map(i => (i, Array.fill(4)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.standardizeEmbeddings(df, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dim")) ->
        r.getAs[Double]("z")).toMap
    assert(got.size == 200)
    for (dim <- 0 until 4) {
      val vs = rows.map(_._2(dim).toDouble)
      val n = vs.size.toDouble
      val s = vs.sum // fine at test scale; the engine's decimal sum is exact
      val ss = vs.map(v => v * v).sum
      val denom = math.sqrt(ss * n - s * s)
      rows.foreach { case (id, arr) =>
        val want = (arr(dim).toDouble * n - s) / denom
        val gotZ = got((id, dim + 1L))
        assert(math.abs(gotZ - want) < 1e-6, s"id=$id dim=$dim")
      }
    }
    // constant dimension -> z = 0, not NaN
    val const = (1L to 5L).map(i => (i, Array(1.5f))).toDF("vec_id", "embedding")
    val z0 = Similarity.standardizeEmbeddings(const, col("vec_id"), col("embedding"))
      .collect().map(_.getAs[Double]("z"))
    assert(z0.forall(_ == 0.0))
  }

  test("batching: deterministic assignment, correct padding accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, 5), (2L, 7), (3L, 9), (4L, 6), (5L, 8), // bucket 0 (width 10)
      (6L, 15), (7L, 12), // bucket 1
      (8L, 25) // bucket 2
    ).toDF("id", "n_tokens")
    val assigned = Batching.assignBatches(docs, col("id"), col("n_tokens"),
        bucketWidth = 10, batchSize = 2).collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("bucket"),
        r.getAs[Long]("batch_seq"), r.getAs[Long]("batch_id")))).toMap
    // bucket 0 in id order: seqs 1..5, batches [1,2][3,4][5]
    assert(assigned(1L) == ((0L, 1L, 0L)) && assigned(2L) == ((0L, 2L, 0L)))
    assert(assigned(3L) == ((0L, 3L, 1L)) && assigned(4L) == ((0L, 4L, 1L)))
    assert(assigned(5L) == ((0L, 5L, 2L)))
    assert(assigned(6L) == ((1L, 1L, 0L)) && assigned(7L) == ((1L, 2L, 0L)))
    assert(assigned(8L) == ((2L, 1L, 0L)))
    val stats = Batching.batchStats(docs, col("id"), col("n_tokens"),
        bucketWidth = 10, batchSize = 2).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("batch_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("max_tokens"),
          r.getAs[Long]("sum_tokens"), r.getAs[Double]("padding_frac")))).toMap
    // batch (0,0): docs 5,7 -> max 7, sum 12, padding 1 - 12/14
    assert(stats((0L, 0L)) == ((2L, 7L, 12L, math.rint((1 - 12.0 / 14) * 1e6) / 1e6)))
    assert(stats((0L, 2L)) == ((1L, 8L, 8L, 0.0))) // singleton: no padding
    assert(stats((2L, 0L)) == ((1L, 25L, 25L, 0.0)))
  }

  test("stratumPercentRank: percent_rank semantics, hot stratum, window-free") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // stratum "hot" holds 90% of rows; scores collide across strata
    val rows = (1L to 2000L).map { i =>
      val st = if (rng.nextInt(10) < 9) "hot" else s"s${rng.nextInt(3)}"
      (i, st, (rng.nextInt(50) / 10.0))
    }
    val df = spark.createDataFrame(rng.shuffle(rows)).toDF("id", "st", "v")
      .repartition(16)
    val out = Sampling.stratumPercentRank(df, col("st"), col("v"), col("id"))
    val got = out.collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap
    rows.groupBy(_._2).foreach { case (_, members) =>
      val ordered = members.sortBy(m => (m._3, m._1))
      val n = ordered.size
      ordered.zipWithIndex.foreach { case ((id, _, _), i) =>
        val want = if (n == 1) 0.0 else math.rint(i.toDouble / (n - 1) * 1e6) / 1e6
        assert(got(id) == want, s"id=$id")
      }
    }
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Window"), plan)
  }

  test("stratumPercentRank: singleton stratum gets 0.0") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "b", 1.0), (3L, "b", 3.0)).toDF("id", "st", "v")
    val got = Sampling.stratumPercentRank(df, col("st"), col("v"), col("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("upsamplePlan: exact deterministic copy multiset, E[copies] = factor") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "src")
    val factor = when(col("src") === "a", 2.5).otherwise(1.0)
    val out = Mixture.upsamplePlan(df, col("id"), factor, salt = "u")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("copy")))
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // replica of the sha-bucket decision
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("SHA-256")
          .digest((id.toString + "u").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8), 16) % 10000
    (1L to 3000L).foreach { id =>
      val want =
        if (id % 3 == 0) (if (bucket(id) < 5000) 3L else 2L)
        else 1L
      assert(byId.getOrElse(id, Seq()).size == want, s"id=$id")
      assert(byId.getOrElse(id, Seq()) == (1L to want), s"copy indices id=$id")
    }
    // factor 2.5 over 1000 "a" ids: expect ~2500 copies, sha-balanced
    val aCopies = out.count { case (id, _) => id % 3 == 0 }
    assert(aCopies > 2300 && aCopies < 2700, s"aCopies=$aCopies")
  }

  test("upsamplePlan: factor < 1 behaves as deterministic down-sample") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, "x")).toDF("id", "src")
    val out = Mixture.upsamplePlan(df, col("id"), lit(0.25), salt = "d")
      .collect().map(_.getAs[Long]("id"))
    assert(out.distinct.length == out.length) // at most one copy each
    assert(out.length > 380 && out.length < 620, s"kept=${out.length}")
  }

  test("containmentPairs: finds the quote Jaccard misses; Against variant agrees") {
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    // VARIED filler (distinct bigrams) — repeated filler would collapse the
    // article's distinct-bigram set and let Jaccard fire too
    val filler1 = (1 to 60).map(i => s"w$i").mkString(" ")
    val filler2 = (61 to 120).map(i => s"w$i").mkString(" ")
    val article = filler1 + " " + quote + " " + filler2
    val d = Seq(
      (1L, "en", quote), // fully contained in 2
      (2L, "en", article),
      (3L, "en", "completely different content about something else entirely here"),
      (4L, "de", quote) // other block: never paired with 1/2
    ).toDF("doc_id", "lang", "text")
    val pairs = Dedup.containmentPairs(d, col("doc_id"), col("text"),
        col("lang"), n = 2, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("containment")))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == 1.0)
    // the same pair's Jaccard is tiny — containment is the right metric here
    val j = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"), col("lang"),
      n = 2, threshold = 0.5).collect()
    assert(!j.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L))
    // query-set variant: directional, same verdicts for query doc 1
    val against = Dedup.containmentPairsAgainst(
        d.filter(col("doc_id") === 1L), d,
        col("doc_id"), col("text"), col("lang"), n = 2, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(against.toSet == Set((1L, 2L)))
  }

  test("randomProjection: deterministic sha-derived matrix, JL norm bound") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val rows = (1L to 100L).map(i => (i, Array.fill(64)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, col("vec_id"), col("embedding"),
        inDims = 64, outDims = 16, salt = "t")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("odim")) ->
        r.getAs[Double]("value")).toMap
    assert(out.size == 1600)
    // driver replica of the sign matrix and projection
    def sign(i: Int, j: Int): Double = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"${i}_${j}t".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
    val root = math.sqrt(16.0)
    rows.take(10).foreach { case (id, v) =>
      for (i <- 1 to 16) {
        var dot = 0.0
        for (j <- 1 to 64) dot += v(j - 1).toDouble * sign(i, j)
        val want = math.rint(dot / root * 1e6) / 1e6
        assert(math.abs(out((id, i.toLong)) - want) <= 1e-6, s"id=$id odim=$i")
      }
    }
    // JL sanity: projected squared norms concentrate around the originals —
    // chi²₁₆-wide per row (loose 5x individual bound), tight in the mean
    val ratios = rows.map { case (id, v) =>
      val orig = v.map(x => x.toDouble * x.toDouble).sum
      val proj = (1 to 16).map(i => out((id, i.toLong))).map(z => z * z).sum
      val ratio = proj / orig
      assert(ratio > 0.2 && ratio < 5.0, s"id=$id ratio=$ratio")
      ratio
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.35, s"mean ratio $mean")
  }

  test("oovRate: top-K boundary deterministic, rates exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa bb bb cc"), // aa:3 bb:2 cc:1
      (2L, "aa bb dd"), // dd:1 — tie with cc broken by token string: cc < dd
      (3L, "")
    ).toDF("id", "text")
    // vocab top-3 by (count desc, token asc) = aa, bb, cc
    val out = TextAnalysis.oovRate(docs, col("id"), col("text"), topK = 3)
      .collect().map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate")))).toMap
    assert(out(1L) == ((6L, 0L, 0.0)))
    assert(out(2L) == ((3L, 1L, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(!out.contains(3L)) // token-less docs are not rated
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("temperatureWeights: α=0.5 flattens, exact decimal normalizer") {
    import spark.implicits._
    // 8 "a" docs, 2 "b" docs
    val df = (1L to 10L).map(i => (i, if (i <= 8) "a" else "b")).toDF("id", "g")
    val out = Mixture.temperatureWeights(df, col("g"), alpha = 0.5,
        budget = 100L)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("weight"),
          r.getAs[Long]("expected_docs"), r.getAs[Double]("up_factor")))).toMap

    // replica with the same IEEE ops + decimal normalizer
    val termA = BigDecimal(round6(math.pow(8.0 / 10.0, 0.5)))
    val termB = BigDecimal(round6(math.pow(2.0 / 10.0, 0.5)))
    val s = (termA + termB).toDouble
    val wA = round6(termA.toDouble / s)
    val wB = round6(termB.toDouble / s)
    assert(out("a") == ((8L, wA, math.floor(wA * 100L).toLong,
      round6(math.floor(wA * 100L) / 8.0))))
    assert(out("b") == ((2L, wB, math.floor(wB * 100L).toLong,
      round6(math.floor(wB * 100L) / 2.0))))
    // α < 1 lifts the tail above its raw share and keeps the order
    assert(wB > 0.2 && wA < 0.8 && wA > wB)
  }

  test("temperatureWeights: α=1 is proportional, α=0 is uniform") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, if (i <= 8) "a" else "b")).toDF("id", "g")
    val prop = Mixture.temperatureWeights(df, col("g"), 1.0, 100L)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("weight")).toMap
    assert(prop("a") == 0.8 && prop("b") == 0.2)
    val unif = Mixture.temperatureWeights(df, col("g"), 0.0, 100L)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("weight")).toMap
    assert(unif("a") == 0.5 && unif("b") == 0.5)
  }

  test("packContextSpans: hand-traced boundary crossings, exclusions, guard") {
    import spark.implicits._
    // stream in id order: doc1 [0,3) doc2 [3,8) doc3 [8,12); blocks of 4
    val docs = Seq((1L, Option(3L)), (2L, Option(5L)), (3L, Option(4L)),
        (4L, Option(0L)), (5L, None))
      .toDF("id", "n_tok")
    val out = Batching.packContextSpans(docs, col("id"), col("n_tok"), 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSet
    assert(out == Set(
      (1L, 0L, 0L, 3L, 0L), // doc1 wholly in block 0 at offset 0
      (2L, 0L, 0L, 1L, 3L), // doc2's first token tops off block 0
      (2L, 1L, 1L, 5L, 0L), // ...the rest fills block 1
      (3L, 2L, 0L, 4L, 0L))) // doc3 is exactly block 2; 4 and 5 excluded
    intercept[IllegalArgumentException](
      Batching.packContextSpans(docs, col("id"), col("n_tok"), 0))
  }

  test("packContextSpans: blocks are exactly full, docs reassemble exactly") {
    import spark.implicits._
    // irregular lengths, many crossings at blockSize 7
    val lens = Seq(5L, 13L, 1L, 1L, 9L, 2L, 21L, 3L)
    val docs = lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "n_tok")
    val rows = Batching.packContextSpans(docs, col("id"), col("n_tok"), 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = lens.sum
    // per-block coverage: every block holds exactly 7 tokens (last: remainder)
    val perBlock = rows.groupBy(_._3).view
      .mapValues(_.map(t => t._5 - t._4).sum).toMap
    val lastBlock = (total - 1) / 7
    for ((b, cov) <- perBlock)
      assert(cov == (if (b == lastBlock) total - 7 * lastBlock else 7L),
        s"block $b covers $cov")
    assert(perBlock.keySet == (0L to lastBlock).toSet, "no empty/missing block")
    // per-doc reassembly: spans tile [0, n) contiguously in block order,
    // and block_off is consistent with the span landing inside the block
    for ((id, g) <- rows.groupBy(_._1)) {
      val spans = g.sortBy(_._3).map(t => (t._4, t._5))
      assert(spans.head._1 == 0L && spans.last._2 == g.head._2)
      for (w <- spans.sliding(2) if w.length == 2)
        assert(w(0)._2 == w(1)._1, s"doc $id spans not contiguous")
      for ((_, _, _, s, e, off) <- g)
        assert(off >= 0 && off + (e - s) <= 7, s"doc $id span exceeds block")
    }
  }
}
