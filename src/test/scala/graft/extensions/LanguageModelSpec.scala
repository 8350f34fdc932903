package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics of the corpus-LM scorers on hand-computable fixtures. The
  * engine-crossing float contract itself (round → decimal-sum) is covered by
  * the x47/x48 oracle rows; here we pin the formulas and the edge cases the
  * oracle can't isolate (token-less docs, unmatched docs, formula shape).
  */
class LanguageModelSpec extends AnyFunSuite with SparkTestSession {

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bpeTrain degenerate corpus: zero merges; x97 degrades to empty, no throw") {
    import spark.implicits._
    // every character pair occurs once < minCount → zero merges
    val d = Seq((1L, "ab", "en", "web", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(LanguageModel.bpeTrain(d, col("text"), nMerges = 5, minCount = 2L)
      .isEmpty, "no pair reaches minCount")
    // the x97 invariant query must degrade to an empty relation (not NPE/head)
    val dir = java.nio.file.Files.createTempDirectory("bpe-degenerate").toString
    d.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("x97_bpe_invariants")(spark, dir)
    assert(out.isEmpty, "degenerate corpus → empty invariant relation")
    assert(out.columns.toSeq == Seq("step1_left", "step1_right", "step1_count",
      "merged_concat_ok", "counts_nonincreasing"))
  }

  test("unigramLogLikelihood: counts, exact decimal sums, token-less doc") {
    import spark.implicits._
    // vocab: a ×2, b ×2, c ×1 → total 5
    val df = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val out = LanguageModel.unigramLogLikelihood(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap

    val lpA = round6(math.log(2.0 / 5.0)) // == lp(b)
    val lpC = round6(math.log(1.0 / 5.0))
    assert(out(1L).getLong(1) == 3)
    assert(out(1L).getDouble(2) == BigDecimal(lpA) * 3) // 2×a + 1×b, exact
    assert(out(1L).getDouble(3) == round6((BigDecimal(lpA) * 3).toDouble / 3))
    assert(out(2L).getLong(1) == 2)
    assert(out(2L).getDouble(2) == (BigDecimal(lpA) + BigDecimal(lpC)).toDouble)
    // token-less doc stays in the output with null scores
    assert(out(3L).getLong(1) == 0)
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3))
  }

  test("unigramLogLikelihood: identical plans on both sides of the vocab gate") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val broadcastPath = LanguageModel.unigramLogLikelihood(
      df, col("doc_id"), col("text"), maxBroadcastVocab = 1000)
    val shufflePath = LanguageModel.unigramLogLikelihood(
      df, col("doc_id"), col("text"), maxBroadcastVocab = 1)
    assert(broadcastPath.except(shufflePath).isEmpty &&
      shufflePath.except(broadcastPath).isEmpty)
  }

  test("bm25: formula, match counts, unmatched docs absent") {
    import spark.implicits._
    val df = Seq((1L, "x y x z"), (2L, "x q"), (3L, "q r")).toDF("doc_id", "text")
    val out = LanguageModel.bm25(df, col("doc_id"), col("text"), Seq("x", "y"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

    // replicate the documented formula with the same IEEE ops
    val (k1, b) = (1.2, 0.75)
    val n = 3.0
    val avgdl = 8L.toDouble / 3L.toDouble
    def idf(dfT: Long): Double = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
    def part(tf: Long, dl: Long): Double =
      tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
    def c(tf: Long, dl: Long, dfT: Long): BigDecimal =
      BigDecimal(round6(idf(dfT) * part(tf, dl)))

    assert(out(1L) == ((2L, (c(2, 4, 2) + c(1, 4, 1)).toDouble))) // x×2, y×1
    assert(out(2L) == ((1L, c(1, 2, 2).toDouble)))                // x×1
    assert(!out.contains(3L)) // no query term → not scored
    assert(out(1L)._2 > out(2L)._2)
  }

  test("bigramLogLikelihood: formula, short docs, interpolation weights") {
    import spark.implicits._
    // bigrams: doc1 "a b","b a"; doc2 "b a"; doc3 none (single token)
    val df = Seq((1L, "a b a"), (2L, "b a"), (3L, "x")).toDF("doc_id", "text")
    val out = LanguageModel.bigramLogLikelihood(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap

    // corpus: c("a b")=1, c("b a")=2; ctx a·=1, b·=2; unigrams a:3 b:2 x:1 / 6
    val lam = 0.9
    val lpAB = round6(math.log(lam * (1.0 / 1.0) + (1.0 - lam) * (2.0 / 6.0)))
    val lpBA = round6(math.log(lam * (2.0 / 2.0) + (1.0 - lam) * (3.0 / 6.0)))
    assert(out(1L).getLong(1) == 2)
    assert(out(1L).getDouble(2) == (BigDecimal(lpAB) + BigDecimal(lpBA)).toDouble)
    assert(out(1L).getDouble(3) ==
      round6((BigDecimal(lpAB) + BigDecimal(lpBA)).toDouble / 2))
    assert(out(2L).getLong(1) == 1)
    assert(out(2L).getDouble(2) == BigDecimal(lpBA).toDouble)
    // single-token doc: no full window — present, unscored
    assert(out(3L).getLong(1) == 0)
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3))
  }

  test("bigramLogLikelihood: identical plans on both sides of the vocab gate") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "b a b")).toDF("doc_id", "text")
    val broadcastPath = LanguageModel.bigramLogLikelihood(
      df, col("doc_id"), col("text"), maxBroadcastVocab = 1000)
    val shufflePath = LanguageModel.bigramLogLikelihood(
      df, col("doc_id"), col("text"), maxBroadcastVocab = 1)
    assert(broadcastPath.except(shufflePath).isEmpty &&
      shufflePath.except(broadcastPath).isEmpty)
  }

  test("hashedImportanceWeights: target-typical docs score higher, edges hold") {
    import spark.implicits._
    // "xx"-tokens live only in target docs, "yy" only in raw-side docs
    val df = Seq(
      (1L, "xx1 xx2 xx1", true), (2L, "xx1 xx3", true),
      (3L, "yy1 yy2 yy1", false), (4L, "yy3 yy1", false),
      (5L, "", false)).toDF("doc_id", "text", "tgt")
    val out = LanguageModel.hashedImportanceWeights(
        df, col("doc_id"), col("text"), col("tgt"), nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out.size == 5)
    assert(out(1L).getLong(1) == 3 && out(3L).getLong(1) == 3)
    // token-less doc stays with null scores
    assert(out(5L).getLong(1) == 0 && out(5L).isNullAt(2) && out(5L).isNullAt(3))
    // target-only vocabulary must out-score raw-only vocabulary
    assert(out(1L).getDouble(3) > out(3L).getDouble(3))
    assert(out(2L).getDouble(3) > out(4L).getDouble(3))
    // a doc's sum is its per-token decimal sum: avg × n round-trips
    assert(out(1L).getDouble(3) == round6(out(1L).getDouble(2) / 3))
  }

  test("tfIdfTopTerms: sklearn-smoothed formula, rank order, k cap") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "b")).toDF("doc_id", "text")
    val out = LanguageModel.tfIdfTopTerms(df, col("doc_id"), col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    def tfidf(tf: Long, dfreq: Long): Double =
      round6(tf * (math.log(4.0 / (1.0 + dfreq)) + 1.0)) // N = 3 docs
    // doc 1: a (tf 2, df 2) beats b (tf 1, df 2)
    assert(out((1L, "a")) == ((2L, tfidf(2, 2), 1)))
    assert(out((1L, "b")) == ((1L, tfidf(1, 2), 2)))
    // doc 2: c is rarer (df 1) than a (df 2) → c ranks first
    assert(out((2L, "c"))._3 == 1 && out((2L, "a"))._3 == 2)
    assert(out((2L, "c"))._2 == tfidf(1, 1))
    assert(out((3L, "b")) == ((1L, tfidf(1, 2), 1)))
    assert(out.size == 5) // k=2 cap: no doc emits more than 2 terms
  }

  test("tfIdfTopTerms: equal tfidf ties break by term; empty docs emit nothing") {
    import spark.implicits._
    val df = Seq((1L, "z q"), (2L, ""), (3L, "z q")).toDF("doc_id", "text")
    val out = LanguageModel.tfIdfTopTerms(df, col("doc_id"), col("text"), k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> r.getString(1)).toMap
    // z and q have identical (tf, df) → identical tfidf → term asc order
    assert(out((1L, 1)) == "q" && out((1L, 2)) == "z")
    assert(out((3L, 1)) == "q" && out((3L, 2)) == "z")
    assert(!out.keySet.exists(_._1 == 2L))
  }

  test("pmiCollocations: formula, minCount guard, topK order") {
    import spark.implicits._
    // "x y" appears 3×, "y z" twice, plus filler tokens to pad the totals
    val df = Seq(
      (1L, "x y f1 f2"), (2L, "x y f3 f4"), (3L, "x y f5 f6"),
      (4L, "y z f7 f8"), (5L, "y z f9 f10")).toDF("doc_id", "text")
    val all = LanguageModel.pmiCollocations(df, col("text"), minCount = 2L,
      topK = 10).collect()
    val byBg = all.map(r => r.getString(0) -> r).toMap
    // only the two repeated bigrams survive minCount = 2
    assert(byBg.keySet == Set("x y", "y z"))
    val nUni = 20.0; val nBi = 15.0
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      round6(math.log((cab / nBi) / ((ca / nUni) * (cb / nUni))))
    assert(byBg("x y").getLong(1) == 3 && byBg("x y").getLong(2) == 3 &&
      byBg("x y").getLong(3) == 5)
    assert(byBg("x y").getDouble(4) == pmi(3, 3, 5))
    assert(byBg("y z").getDouble(4) == pmi(2, 5, 2))
    // output is ordered (pmi desc, bigram asc)
    val pmis = all.map(_.getDouble(4)).toSeq
    assert(pmis == pmis.sorted.reverse)
    // topK caps the output
    assert(LanguageModel.pmiCollocations(df, col("text"), minCount = 1L,
      topK = 3).count() == 3)
  }

  test("vocabMinhashSim: identical vocabularies agree fully, estimates track Jaccard") {
    import spark.implicits._
    // a and b share ALL types (frequencies differ — must not matter);
    // c overlaps a in 8 of 24 union types (J = 1/3); d is fully disjoint
    val aText = (0 until 16).map(i => s"w$i").mkString(" ")
    val cText = ((0 until 8) ++ (100 until 116)).map(i => s"w$i").mkString(" ")
    val df = Seq(
      ("a", aText), ("a", aText + " " + aText),
      ("b", (15 to 0 by -1).map(i => s"w$i w$i").mkString(" ")),
      ("c", cText), ("d", "zz1 zz2 zz3")).toDF("src", "text")
    val out = LanguageModel.vocabMinhashSim(df, col("src"), col("text"),
        nPerms = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == 6, "all unordered pairs present")
    assert(out(("a", "b")) == ((64L, 1.0)), "same vocabulary → all minima agree")
    val (nAc, simAc) = out(("a", "c"))
    assert(simAc == nAc / 64.0)
    // J(a,c) = 1/3; 64 perms → s.e. ≈ 0.06, assert within 4 s.e.
    assert(math.abs(simAc - 1.0 / 3) < 0.25, s"estimate $simAc far from 1/3")
    assert(out(("a", "d"))._1 == 0L, "disjoint vocabularies never agree")
    // multiplicities of 1/64 are exactly representable at 6 dp
    assert(out.values.forall { case (n, s) => s == n / 64.0 })
  }

  test("bpeTrain: matches hand-computed merges on the Sennrich corpus shape") {
    import spark.implicits._
    // classic BPE example: {low×5, lowest×2, newer×6, wider×3}
    val df = Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++
      Seq.fill(6)("newer") ++ Seq.fill(3)("wider")
    val d = df.map(w => Tuple1(w)).toDF("text")
    val out = LanguageModel.bpeTrain(d, col("text"), nMerges = 4,
        minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1)
    // step 1: er (newer 6 + wider 3 = 9); step 2: lo (5 + 2 = 7);
    // step 3: low (7); step 4: ties at 6 — ("n","e") beats ("ne","w") etc.
    // lexicographically at count 6
    assert(out(0) == ((1L, "e", "r", "er", 9L)))
    assert(out(1) == ((2L, "l", "o", "lo", 7L)))
    assert(out(2) == ((3L, "lo", "w", "low", 7L)))
    assert(out(3)._5 == 6L)
    // counts never increase step over step
    assert(out.sliding(2).forall(w => w.length < 2 || w(1)._5 <= w(0)._5))
  }

  test("bpeTrain: greedy non-overlap application and early stop") {
    import spark.implicits._
    // 'aaaa' x3: pair (a,a) counts 3 overlapping occurrences x3 words = 9;
    // applying merges non-overlapping: aaaa -> [aa, aa]
    val d = Seq.fill(3)("aaaa").map(Tuple1(_)).toDF("text")
    val out = LanguageModel.bpeTrain(d, col("text"), nMerges = 8,
        minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "aa", 9L)))
    assert(out(1) == ((2L, "aaaa", 3L)), s"got ${out.toSeq}")
    // after [aaaa] no adjacent pair reaches minCount → early stop at 2 merges
    assert(out.length == 2, s"got ${out.toSeq}")
  }

  test("bpeTrain: deterministic under repartitioning") {
    import spark.implicits._
    val words = (0 until 50).map(i => s"tok${i % 7}word${i % 3}")
    val d = words.map(Tuple1(_)).toDF("text")
    val a = LanguageModel.bpeTrain(d, col("text"), nMerges = 6).collect()
      .map(_.toSeq).toSeq
    val b = LanguageModel.bpeTrain(d.repartition(13), col("text"), nMerges = 6)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("rrfFuse: hand-computed fusion, topN cut, agreement and best rank") {
    import spark.implicits._
    val a = Seq(("q1", 10L, 0.9), ("q1", 11L, 0.8), ("q1", 12L, 0.7))
      .toDF("qid", "id", "score")
    val b = Seq(("q1", 12L, 0.9), ("q1", 11L, 0.5), ("q1", 13L, 0.2))
      .toDF("qid", "id", "score")
    val out = LanguageModel.rrfFuse(Seq("a" -> a, "b" -> b), rrfK = 60, topN = 2)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getInt(3), r.getDouble(4)))).toMap
    // ranks: a → 10:1, 11:2 (12 cut); b → 12:1, 11:2 (13 cut)
    val r1 = round6(1.0 / 61)
    val r2 = round6(1.0 / 62)
    assert(out == Map(
      10L -> ((1L, 1, r1)),
      11L -> ((2L, 2, round6(r2 + r2))),
      12L -> ((1L, 1, r1))))
  }

  test("rrfFuse: scores round to 6dp before ranking so near-ties break by id") {
    import spark.implicits._
    // 0.5 vs 0.5 + 1e-9 are the same score at 6dp → rank by id asc
    val l = Seq(("q", 2L, 0.5 + 1e-9), ("q", 1L, 0.5)).toDF("qid", "id", "score")
    val out = LanguageModel.rrfFuse(Seq("l" -> l), rrfK = 60, topN = 10)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(out == Map(1L -> 1, 2L -> 2))
  }

  test("rrfFuse: null qid/id/score rows drop; guards reject bad parameters") {
    import spark.implicits._
    val l = Seq((Option("q"), Option(1L), Option(1.0)),
        (None, Option(2L), Option(1.0)),
        (Option("q"), None, Option(1.0)),
        (Option("q"), Option(3L), None))
      .toDF("qid", "id", "score")
    val out = LanguageModel.rrfFuse(Seq("l" -> l)).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L))
    intercept[IllegalArgumentException](LanguageModel.rrfFuse(Seq.empty))
    intercept[IllegalArgumentException](LanguageModel.rrfFuse(Seq("l" -> l), rrfK = 0))
    intercept[IllegalArgumentException](LanguageModel.rrfFuse(Seq("l" -> l), topN = 0))
  }
}
