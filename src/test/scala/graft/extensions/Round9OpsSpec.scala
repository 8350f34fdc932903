package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Specs for the round-9 operators: BPE encode application, triangle
  * counts, prefix-filter Jaccard join, boilerplate profile, rolling
  * z-score anomalies, KS drift.
  */
class Round9OpsSpec extends AnyFunSuite with SparkTestSession {

  // --- LanguageModel.bpeEncodeProfile ---------------------------------------

  test("bpeEncodeProfile counts tokens under chained greedy merges") {
    import spark.implicits._
    // "ther" -> th+er (2 tokens); "rere" -> r,er,e? no: greedy scans left:
    // (e,r) at positions 2-3 -> r,[er],e = 3 symbols; "thth" -> 2; "x" -> 1
    val df = Seq((1L, "ther rere thth x"), (2L, ""), (3L, "ononon"))
      .toDF("id", "text")
    val out = LanguageModel.bpeEncodeProfile(df, col("id"), col("text"),
        Seq("t" -> "h", "e" -> "r", "o" -> "n"))
      .orderBy("id").collect()
    // doc 1: words ther(4c->2t) rere(4c->3t) thth(4c->2t) x(1c->1t)
    assert(out(0).getLong(1) == 4L)        // n_words
    assert(out(0).getLong(2) == 13L)       // n_word_chars
    assert(out(0).getLong(3) == 8L)        // n_tokens
    // doc 2: wordless -> zeros
    assert(out(1).getLong(1) == 0L && out(1).getLong(3) == 0L)
    // doc 3: ononon -> on,on,on = 3 tokens from 6 chars
    assert(out(2).getLong(3) == 3L)
  }

  test("bpeEncodeProfile with char-disjoint merges equals replace-counting") {
    // the x99 oracle contract: for char-disjoint single-char pairs, chained
    // greedy merge counts equal independent substring-occurrence counts
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Seq("t" -> "h", "e" -> "r", "o" -> "n", "a" -> "s", "i" -> "d")
    val native = LanguageModel.bpeEncodeProfile(docs, col("doc_id"),
      col("text"), merges)
    val occ = merges.map { case (a, b) =>
      s"(length(w) - length(replace(w, '$a$b', ''))) div 2" }.mkString(" + ")
    val replica = docs
      .select(col("doc_id").as("id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_word_chars"),
        sum(expr(s"length(w) - ($occ)")).cast("long").as("n_tokens"))
    assert(native.join(replica, Seq("id"))
      .filter(native("n_tokens") =!= replica("n_tokens"))
      .count() == 0)
  }

  test("tokenizerFertility: per-group ratios, zero-word group, NULL group drop") {
    import spark.implicits._
    // same merge table as the profile test: ther->2, rere->3, thth->2, x->1
    val df = Seq(
      (Option("en"), "ther rere"),   // 2 words, 8 chars, 5 tokens
      (Option("en"), "thth"),        // 1 word, 4 chars, 2 tokens
      (Option("de"), "x"),           // 1 word, 1 char, 1 token
      (Option("xx"), ""),            // a doc with no words at all
      (Option.empty[String], "ther") // NULL group: dropped entirely
    ).toDF("lang", "text")
    val out = LanguageModel.tokenizerFertility(df, col("lang"), col("text"),
        Seq("t" -> "h", "e" -> "r", "o" -> "n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("en", "de", "xx"))
    val en = out("en")
    assert((en.getLong(1), en.getLong(2), en.getLong(3), en.getLong(4)) ==
      ((2L, 3L, 12L, 7L)))
    assert(en.getLong(5) == 2333333L)  // 7/3 tokens per word
    assert(en.getLong(6) == 1714286L)  // 12/7 chars per token
    val de = out("de")
    assert(de.getLong(5) == 1000000L && de.getLong(6) == 1000000L)
    val xx = out("xx")                 // no words: zero counts, NULL ratios
    assert(xx.getLong(1) == 1L && xx.getLong(2) == 0L && xx.getLong(4) == 0L)
    assert(xx.isNullAt(5) && xx.isNullAt(6))
  }

  // --- LinkGraph.triangleCounts ---------------------------------------------

  test("triangleCounts on K4 gives every node 3 triangles") {
    import spark.implicits._
    val edges = (for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val out = graft.ops.LinkGraph.triangleCounts(edges, col("src"), col("dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangleCounts: direction/duplicates collapse, stars have none") {
    import spark.implicits._
    // triangle 1-2-3 given with mixed directions + duplicates; star at 10
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (1L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("src", "dst")
    val out = graft.ops.LinkGraph.triangleCounts(edges, col("src"), col("dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // --- Dedup.prefixJaccardPairs ---------------------------------------------

  test("prefixJaccardPairs equals the brute-force threshold join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120)
    val fast = Dedup.prefixJaccardPairs(docs, col("doc_id"), col("text"),
      thresholdPct = 60, n = 2)
    val sets = docs.filter(size(TextAnalysis.tokens(col("text"))) >= 2)
      .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
    val brute = sets.as("a").join(sets.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long"))
      .withColumn("uni",
        size(col("a.sh")).cast("long") + size(col("b.sh")) - col("inter"))
      .filter(col("inter") * 100L >= col("uni") * 60L)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
    assert(fast.count() == brute.count())
    assert(fast.except(brute).count() == 0 && brute.except(fast).count() == 0)
    assert(brute.count() > 0)   // non-vacuous at this threshold
  }

  test("prefixJaccardPairs ceil-boundary prefix keeps the (9,8)-set pair") {
    import spark.implicits._
    // the round-10 regression shape (sf0.001 pair 33/436): |A| = 9, |B| = 8
    // shared tokens at t = 0.8 — J = 8/9 ≥ 0.8 — where A's one UNSHARED
    // token is the globally rarest, so the only shared prefix token sits at
    // EXACTLY position ⌈t·|A|⌉-boundary. A double-division prefix length
    // truncated this prefix one short and silently dropped the pair.
    val shared = ('a' to 'h').map(c => s"w$c$c")
    val a = ("uniqueword" +: shared).mkString(" ")
    val b = shared.mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Dedup.prefixJaccardPairs(df, col("doc_id"), col("text"),
        thresholdPct = 80, n = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.888889)))
  }

  // --- TextAnalysis.boilerplateProfile --------------------------------------

  test("boilerplateProfile flags cross-doc repeated passages per group") {
    import spark.implicits._
    val footer = "all rights reserved by the site"
    val df = Seq(
      (1L, s"alpha beta gamma delta epsilon $footer", "s1"),
      (2L, s"one two three four five six $footer", "s1"),
      (3L, s"$footer and unique tail words here", "s1"),
      (4L, s"totally different text with no repeats at all", "s1"),
      (5L, s"same footer other group $footer", "s2")
    ).toDF("id", "text", "src")
    val out = TextAnalysis.boilerplateProfile(df, col("id"), col("text"),
        col("src"), n = 5, minDocs = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the 6-token footer has two 5-gram windows; both repeat in docs 1,2,3
    assert(out(1L)._2 == 2L && out(2L)._2 == 2L && out(3L)._2 == 2L)
    assert(out(4L)._2 == 0L)
    assert(out(5L)._2 == 0L)   // group s2: only 1 doc has the footer
    // doc 3: 11 tokens -> 7 grams, 2 boilerplate -> 285714 ppm
    assert(out(3L)._1 == 7L && out(3L)._3 == 285714L)
  }

  // --- ops.Anomaly.rollingZScore --------------------------------------------

  test("rollingZScore flags an injected spike, not the steady stream") {
    import spark.implicits._
    // 40 steady values 10.0 +- 0.5 then a 100.0 spike
    val rows = (1 to 40).map(i =>
      (i.toLong, "m", i.toLong, 10.0 + (i % 3) * 0.5)) :+
      (41L, "m", 41L, 100.0)
    val df = rows.toDF("event_id", "etype", "ts", "value")
    val out = graft.ops.Anomaly.rollingZScore(df, col("etype"),
        Seq(col("ts")), Seq("event_id"), col("value"),
        window = 50, z = 3, minPrev = 20)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out(41L))                       // the spike
    assert(out.count(_._2) == 1)           // and only the spike
  }

  test("rollingZScore trailing frame excludes the current row") {
    import spark.implicits._
    // constant series: variance of the WINDOW is 0, so any deviation from
    // the window flags; the current row being IN the window would make
    // dev == 0 for every row and nothing could ever flag
    val rows = (1 to 30).map(i => (i.toLong, "m", i.toLong, 5.0)) :+
      (31L, "m", 31L, 6.0)
    val out = graft.ops.Anomaly.rollingZScore(rows.toDF("event_id", "etype", "ts", "value"),
        col("etype"), Seq(col("ts")), Seq("event_id"), col("value"),
        window = 50, z = 3, minPrev = 20)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out(31L))
  }

  test("rollingZScore rejects values outside the overflow-safe envelope") {
    import spark.implicits._
    // bound at window=50, z=3: |v_milli| <= 3037000499/150 ~ 2.02e7, i.e.
    // |value| <= ~20246. An in-envelope run is unaffected; an out-of-
    // envelope value must FAIL LOUDLY (raise_error), never wrap silently.
    assert(graft.ops.Anomaly.vMilliBound(50, 3) == 3037000499L / 150)
    val ok = (1 to 25).map(i => (i.toLong, "m", i.toLong, 20000.0))
    val okOut = graft.ops.Anomaly.rollingZScore(
      ok.toDF("event_id", "etype", "ts", "value"), col("etype"),
      Seq(col("ts")), Seq("event_id"), col("value"), 50, 3, 20).collect()
    assert(okOut.length == 25 && okOut.forall(!_.getBoolean(6)))
    val bad = ok :+ (26L, "m", 26L, 30000.0) // v_milli 3e7 > bound
    val ex = intercept[Exception] {
      graft.ops.Anomaly.rollingZScore(
        bad.toDF("event_id", "etype", "ts", "value"), col("etype"),
        Seq(col("ts")), Seq("event_id"), col("value"), 50, 3, 20).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c => Option(c.getMessage)
      .exists(_.contains("overflow-safe bound"))))
    // null values pass the guard untouched (null in, null v_milli out)
    val withNull = ok :+ (26L, "m", 26L, null.asInstanceOf[Any])
    val nOut = graft.ops.Anomaly.rollingZScore(
      withNull.map { case (a, b, c, d) => (a, b, c,
        if (d == null) None else Some(d.asInstanceOf[Double])) }
        .toDF("event_id", "etype", "ts", "value"),
      col("etype"), Seq(col("ts")), Seq("event_id"), col("value"),
      50, 3, 20).collect()
    assert(nOut.length == 26)
  }

  // --- extensions.Drift.ksDrift ---------------------------------------------

  test("ksDrift: identical slices 0, disjoint slices n_a*n_b, empty NULL") {
    import spark.implicits._
    val df = Seq(
      // g1: A and B identical -> D = 0
      ("g1", 1L, false), ("g1", 2L, false), ("g1", 1L, true), ("g1", 2L, true),
      // g2: A all below B -> D = n_a*n_b = 4
      ("g2", 1L, false), ("g2", 2L, false), ("g2", 10L, true), ("g2", 11L, true),
      // g3: only A -> KS undefined
      ("g3", 5L, false)
    ).toDF("grp", "v", "isb")
    val out = Drift.ksDrift(df, col("grp"), col("v"), col("isb"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out("g1") == ((2L, 2L, 0L)))
    assert(out("g2") == ((2L, 2L, 4L)))
    assert(out("g3") == ((1L, 0L, -1L)))
  }

  // --- Similarity.hardNegatives ---------------------------------------------

  test("hardNegatives returns top-k most-similar OTHER-label vectors") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0),     // query
      (2L, Array(1.0f, 0.1f), 0),     // same label: excluded even though closest
      (3L, Array(1.0f, 0.5f), 1),     // different label, closer
      (4L, Array(0.0f, 1.0f), 1),     // different label, orthogonal
      (5L, Array(-1.0f, 0.0f), 2)     // different label, opposite
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs.filter(col("vec_id") === 1L),
        vecs, k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 4L))   // neighbor ids
    assert(out.forall(_.getInt(3) != 0))                 // never own label
    assert(out.head.getDouble(4) > out(1).getDouble(4))  // ranked by sim
  }

  // --- Mixture.waterfillAllocation ------------------------------------------

  test("waterfillAllocation levels the budget under per-source caps") {
    import spark.implicits._
    // caps: a=2, b=10, c=10 (rows of 1 token each); budget 12 -> a whole,
    // b and c leveled at 5 each
    val rows = Seq.fill(2)(("a", "t")) ++ Seq.fill(10)(("b", "t")) ++
      Seq.fill(10)(("c", "t"))
    val df = rows.toDF("src", "text")
    val out = Mixture.waterfillAllocation(df, col("src"), lit(1L), budget = 12L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("a") == ((2L, 2L, true)))
    assert(out("b") == ((10L, 5L, false)))
    assert(out("c") == ((10L, 5L, false)))
  }

  test("waterfillAllocation edges: surplus budget, infeasible smallest cap") {
    import spark.implicits._
    val df = (Seq.fill(4)(("a", 1L)) ++ Seq.fill(10)(("b", 1L)))
      .toDF("src", "w")
    // budget covers everything -> all at cap
    val full = Mixture.waterfillAllocation(df, col("src"), col("w"), 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(full == Map("a" -> 4L, "b" -> 10L))
    // budget 6 with caps (4, 10): 4 not coverable for both -> level 3 each
    val tight = Mixture.waterfillAllocation(df, col("src"), col("w"), 6L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tight == Map("a" -> 3L, "b" -> 3L))
  }

  // --- Ensemble.quantileNormalize -------------------------------------------

  test("quantileNormalize maps group percentiles onto the global quantiles") {
    import spark.implicits._
    // group A scores 1..4, group B scores 101..104: after normalization the
    // same within-group position must land on the same global score
    val df = (Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (5L, "B", 101L), (6L, "B", 102L), (7L, "B", 103L), (8L, "B", 104L)))
      .toDF("id", "grp", "score")
    val out = Ensemble.quantileNormalize(df, col("id"), col("grp"),
        col("score"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getLong(4))).toMap
    // same src_pct in both groups → identical qnorm
    for (i <- 0 to 3)
      assert(out(1L + i)._1 == out(5L + i)._1 &&
        out(1L + i)._2 == out(5L + i)._2,
        s"position $i: ${out(1L + i)} vs ${out(5L + i)}")
    // top of each group maps to the global max
    assert(out(4L)._2 == out(8L)._2)
    // monotone within a group
    assert(out(1L)._2 <= out(2L)._2 && out(2L)._2 <= out(3L)._2 &&
      out(3L)._2 <= out(4L)._2)
  }

  test("ksDrift matches a driver replica on corpus data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Drift.ksDrift(docs, col("lang"), col("n_chars"),
      pmod(col("doc_id"), lit(2)) === 1)
    // replica: exact two-sample KS per lang computed on the driver
    val rows = docs.select(col("lang"), col("n_chars"),
        pmod(col("doc_id"), lit(2)) === 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val expect = rows.groupBy(_._1).map { case (lang, xs) =>
      val a = xs.filter(!_._3).map(_._2).sorted
      val b = xs.filter(_._3).map(_._2).sorted
      val support = (a ++ b).distinct.sorted
      val d = if (a.isEmpty || b.isEmpty) -1L
        else support.map(x =>
          math.abs(a.count(_ <= x).toLong * b.length -
            b.count(_ <= x).toLong * a.length)).max
      lang -> (a.length.toLong, b.length.toLong, d)
    }
    val got = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == expect)
  }
}
