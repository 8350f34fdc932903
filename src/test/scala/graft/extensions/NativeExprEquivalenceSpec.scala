package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extensions.{Dedup, TextAnalysis}

/** The native NGrams/MinHashSig expressions claim value-identity with the
  * Column-API formulations they replaced — this spec pins that claim on real
  * corpus text (sf0.001 documents) plus hand-built edge cases.
  */
class NativeExprEquivalenceSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)

  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = TextAnalysis.tokens(text)
    val count = greatest(size(toks) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(1), count),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  private def hofMinhash(sh: org.apache.spark.sql.Column, k: Int) =
    aggregate(sh, array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, seed) => least(m, xxhash64(s, seed))))

  test("NGrams matches the HOF shingle formulation for n=1,2,3 on corpus text") {
    for (n <- Seq(1, 2, 3)) {
      val mismatches = docs
        .select(Dedup.shingles(col("text"), n).as("native"),
          hofShingles(col("text"), n).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
  }

  test("NGrams edge cases: empty tokens, fewer tokens than n") {
    val rows = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("   "), Tuple1("one"), Tuple1("one two"))).toDF("text")
    val out = rows.select(Dedup.shingles(col("text"), 3).as("native"),
        hofShingles(col("text"), 3).as("hof"))
      .collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    // empty text → the single all-tokens window = one empty-string shingle
    assert(out(0).getSeq[String](0) == Seq(""))
  }

  test("DotProduct matches the aggregate/zip_with formulation on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hofDot = aggregate(
      zip_with(col("embedding"), col("e2"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val pairs = e.select(col("vec_id"), col("embedding"))
      .crossJoin(e.limit(1).select(col("embedding").as("e2")))
    val mismatches = pairs
      .select(graft.extensions.Similarity.dot(col("embedding"), col("e2")).as("native"),
        hofDot.as("hof"))
      // bit-identical is the claim — exact equality, no tolerance
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("SignLshBucket matches the HOF formulation on real embeddings") {
    def hofBucket(v: org.apache.spark.sql.Column, nBits: Int) = {
      val bits = (0 until nBits).map { plane =>
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, j) => x.cast("double") * when(xxhash64(lit(plane), j) > 0, 1.0).otherwise(-1.0)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }
      concat(bits: _*)
    }
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mismatches = e
      .select(graft.extensions.Similarity.lshBucket(col("embedding"), 12).as("native"),
        hofBucket(col("embedding"), 12).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("BitsetIntersectCount matches the zip_with/bit_count formulation") {
    def hofCount(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseAND(y))),
        lit(0), (acc, x) => acc + x)
    val rng = new scala.util.Random(41)
    val rows = (1 to 300).map { _ =>
      (Array.fill(rng.nextInt(8) + 1)(rng.nextLong()),
        Array.fill(rng.nextInt(8) + 1)(rng.nextLong()))
    } :+ ((Array(0L), Array(-1L))) :+ ((Array(-1L), Array(-1L)))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    // HOF zip_with null-pads the shorter array (null AND → null → bit_count
    // null → counted 0 by +) and the native loop stops at min length — same
    // totals; compare on equal-length slices to keep the claim exact anyway
    val n = least(size(col("a")), size(col("b")))
    val mismatches = df.select(
        graft.functions.BitsetIntersectCount.bitsetIntersectCount(
          slice(col("a"), lit(1), n), slice(col("b"), lit(1), n)).as("native"),
        hofCount(slice(col("a"), lit(1), n), slice(col("b"), lit(1), n)).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  private def hofWindows(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  test("NgramWindows matches the HOF window formulation for n=1,2,3") {
    for (n <- Seq(1, 2, 3)) {
      val mismatches = docs
        .select(graft.functions.NgramWindows
            .ngramWindows(TextAnalysis.tokens(col("text")), n).as("native"),
          hofWindows(col("text"), n).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
  }

  test("NgramWindows edge cases: multiplicity kept, short docs empty") {
    val rows = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("one"), Tuple1("a b a b a"))).toDF("text")
    val out = rows.select(graft.functions.NgramWindows
        .ngramWindows(TextAnalysis.tokens(col("text")), 2).as("w"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq.empty && out(1) == Seq.empty)
    // every position window, repeats preserved (where NGrams would dedupe)
    assert(out(2) == Seq("a b", "b a", "a b", "b a"))
  }

  test("TokenEntropy matches the explode/groupBy replica on corpus text") {
    val base = docs.select(monotonically_increasing_id().as("rid"), col("text"))
      .unionAll(spark.createDataFrame(Seq(
        (-1L, ""), (-2L, "same same same"), (-3L, "one"),
        (-4L, "a b c d"))).toDF("rid", "text"))
    val native = base.select(col("rid"),
      graft.functions.TokenEntropy.tokenEntropy(TextAnalysis.tokens(col("text"))).as("e"))
    // replica: per-(doc, type) counts, contributions rounded to integer
    // micro-nats with the same IEEE shape, integer-summed per doc
    val toks = base.select(col("rid"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val m = base.select(col("rid"), size(TextAnalysis.tokens(col("text"))).as("m"))
    val c = toks.groupBy("rid", "tok").agg(count(lit(1)).as("c"))
    val p = col("c").cast("double") / col("m").cast("double")
    val replica = m.join(
        c.join(m, Seq("rid"))
          .groupBy("rid")
          .agg(count(lit(1)).as("n_types"),
            sum(round(-p * log(p) * lit(1000000.0), 0).cast("long")).as("micros")),
        Seq("rid"), "left")
      .select(col("rid"), col("m").cast("long").as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("micros"), lit(0L)).as("micros"))
    val mismatches = native
      .select(col("rid"), col("e.n_tokens").as("n_tokens"),
        col("e.n_types").as("n_types"), col("e.entropy_micros").as("micros"))
      .except(replica)
      .count()
    assert(mismatches == 0)
  }

  test("DocFingerprint64 matches the HOF formulation on corpus text + edges") {
    def hofFingerprint(text: org.apache.spark.sql.Column, shingleLen: Int, maxSamples: Int) = {
      val n = greatest(length(text) - (shingleLen - 1), lit(1))
      val stride = ((n + lit(maxSamples - 1)) / lit(maxSamples)).cast("long")
      array_min(transform(sequence(lit(1), n, stride),
        i => conv(substring(sha2(text.substr(i.cast("int"), lit(shingleLen)), 256), 1, 12), 16, 10).cast("long")))
    }
    val corpus = docs.select(col("text"))
      .unionAll(spark.createDataFrame(Seq(Tuple1(""), Tuple1("short"), Tuple1("exactly8"),
        Tuple1("a" * 2000))).toDF("text"))
    val mismatches = corpus
      .select(TextAnalysis.docFingerprint(col("text")).as("native"),
        hofFingerprint(col("text"), 8, 512).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("native expressions match HOF forms on random multibyte unicode text") {
    // corpus text is ASCII-ish; CJK/emoji/combining chars exercise the
    // char-vs-byte paths (substringSQL, UTF8String hashing) differently
    val rng = new scala.util.Random(23)
    val alphabet = "abc 語言模型 émü 🙂🚀 \t\nΩß文字θ "
    val rows = (1 to 200).map { _ =>
      Tuple1((1 to rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val df = spark.createDataFrame(rows).toDF("text")

    val fpHof = {
      val n = greatest(length(col("text")) - 7, lit(1))
      val stride = ((n + lit(511)) / lit(512)).cast("long")
      array_min(transform(sequence(lit(1), n, stride),
        i => conv(substring(sha2(col("text").substr(i.cast("int"), lit(8)), 256), 1, 12), 16, 10).cast("long")))
    }
    val shHof = {
      val toks = TextAnalysis.tokens(col("text"))
      val count = greatest(size(toks) - 1, lit(1))
      array_distinct(transform(sequence(lit(1), count),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
    }
    val out = df.select(
      (TextAnalysis.docFingerprint(col("text")) =!= fpHof).as("fp_diff"),
      (Dedup.shingles(col("text"), 2) =!= shHof).as("sh_diff"),
      (Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 16) =!=
        hofMinhash(shHof, 16)).as("mh_diff"))
    assert(out.filter(col("fp_diff") || col("sh_diff") || col("mh_diff")).count() == 0)
  }

  test("MinHashSig matches the Column form on ARRAY<STRING> containing nulls") {
    // xxhash64 is non-nullable: a null string child leaves the running hash at
    // the seed 42, so the Column form folds hashInt(seed, 42) per null element
    // — the native expression must fold the same constant, not skip.
    val nullStr = lit(null).cast("string")
    val arrays = Seq(
      array(lit("a"), nullStr, lit("b")),
      array(nullStr),
      array(nullStr, nullStr),
      array().cast("array<string>"))
    val df = spark.range(1)
    arrays.zipWithIndex.foreach { case (arr, i) =>
      val row = df.select(Dedup.minhashSignature(arr, 16).as("native"),
        hofMinhash(arr, 16).as("hof")).collect()(0)
      assert(row.getSeq[Long](0) == row.getSeq[Long](1), s"case $i")
    }
  }

  test("NearestCells matches the array_sort/zip_with formulation on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // deterministic pseudo-random centroids — the claim is value-identity for
    // ANY centroid set, not just k-means output
    val rng = new scala.util.Random(7)
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val cents = Seq.fill(16)(Seq.fill(dim)(rng.nextDouble() * 2 - 1))
    val centroidsLit = typedLit(cents)
    val normsLit = typedLit(cents.map(c => c.map(x => x * x).sum))
    def hofNearest(v: org.apache.spark.sql.Column, n: Int) =
      slice(transform(array_sort(zip_with(
        zip_with(centroidsLit, normsLit,
          (cvec, n2) => n2 - lit(2.0) * graft.functions.DotProduct.dotProduct(v, cvec)),
        sequence(lit(0), lit(15)),
        (d, i) => struct(d.as("d"), i.as("cell")))), s => s("cell")), 1, n)
    for (n <- Seq(1, 4, 16)) {
      val mismatches = e.select(
          graft.functions.NearestCells.nearestCells(col("embedding"), cents, n).as("native"),
          hofNearest(col("embedding"), n).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mismatches == 0, s"nProbe=$n")
    }
    // tie-breaking: duplicated centroids must rank by cell id
    val dupCents = Seq(cents.head, cents(1), cents.head)
    val row = e.limit(5).select(
      graft.functions.NearestCells.nearestCells(col("embedding"), dupCents, 3).as("native"))
      .collect()
    row.foreach { r =>
      val cells = r.getSeq[Int](0)
      assert(cells.indexOf(0) < cells.indexOf(2), cells.toString) // 0 before its twin 2
    }
  }

  test("MinHashSig matches the aggregate/zip_with formulation (k=32) on corpus text") {
    val mismatches = docs
      .select(Dedup.minhashSignature(Dedup.shingles(col("text")), 32).as("native"),
        hofMinhash(hofShingles(col("text"), 3), 32).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("NgramStats matches an explode/groupBy re-derivation on corpus text") {
    import org.apache.spark.sql.functions.{count => fcount}
    for (n <- Seq(2, 3)) {
      // reference: non-distinct sliding windows (only full windows), counted
      val toks = TextAnalysis.tokens(col("text"))
      val windows = docs.select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) >= n)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("t")) - (n - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(n))))).as("g"))
      val ref = windows.groupBy("doc_id", "g").agg(fcount(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("total"), fcount(lit(1)).as("distinct"), max("c").as("top"))
      val native = docs.select(col("doc_id"),
          graft.functions.NgramStats.ngramStats(toks, n).as("s"))
        .select(col("doc_id"), col("s.total"), col("s.distinct"), col("s.top"))
        .filter(col("total") > 0)
      assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty, s"n=$n")
    }
  }

  test("NgramStats edge cases: empty, fewer tokens than n, all-identical tokens") {
    val rows = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("one two"), Tuple1("a a a a a"), Tuple1("x y x y x"))).toDF("text")
    val out = rows.select(graft.functions.NgramStats
        .ngramStats(TextAnalysis.tokens(col("text")), 3).as("s"))
      .select("s.total", "s.distinct", "s.top").collect()
    assert(out(0).getLong(0) == 0 && out(0).getLong(1) == 0 && out(0).getLong(2) == 0)
    assert(out(1).getLong(0) == 0) // 2 tokens < n=3 → no full window
    assert(out(2).getLong(0) == 3 && out(2).getLong(1) == 1 && out(2).getLong(2) == 3)
    assert(out(3).getLong(0) == 3 && out(3).getLong(1) == 2 && out(3).getLong(2) == 2)
  }

  test("BitsetFromPositions matches the transform/aggregate HOF mask build") {
    import spark.implicits._
    val rng = new scala.util.Random(59)
    val nWords = 4
    val rows = (1 to 300).map { i =>
      // positions over [0, 256) incl. duplicates, empty arrays, full words
      val n = rng.nextInt(30)
      (i.toLong, Seq.fill(n)(rng.nextInt(64 * nWords)))
    }
    val df = rows.toDF("id", "ps")
    val hof = df.select(col("id"),
      transform(sequence(lit(0), lit(nWords - 1)), w =>
        aggregate(filter(col("ps"), p => floor(p / 64).cast("int") === w),
          lit(0L), (acc, p) => acc.bitwiseOR(
            call_function("shiftleft", lit(1L),
              pmod(p, lit(64)).cast("int"))))).as("m"))
    val native = df.select(col("id"),
      graft.functions.BitsetFromPositions.bitsetFromPositions(col("ps"), nWords).as("m"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // empty positions -> all-zero words, not nulls
    val empty = Seq((1L, Seq.empty[Int])).toDF("id", "ps")
      .select(graft.functions.BitsetFromPositions
        .bitsetFromPositions(col("ps"), nWords).as("m"))
      .first().getSeq[Long](0)
    assert(empty == Seq(0L, 0L, 0L, 0L))
  }

  test("BitsetFromPositions rejects an executor-OOM-sized nWords at analysis") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("id", "ps")
    // compute() allocates 8*nWords bytes PER ROW; an unbounded SQL literal
    // like bitset_from_positions(ps, 100000000) must fail type-check, not OOM
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.BitsetFromPositions
        .bitsetFromPositions(col("ps"), 100000000).as("m")).collect()
    }
    assert(e.getMessage.contains("bitset_from_positions"))
    // the documented ceiling itself still analyzes
    df.select(graft.functions.BitsetFromPositions
      .bitsetFromPositions(col("ps"), graft.functions.BitsetFromPositions.MaxWords)
      .as("m")).queryExecution.analyzed
  }

  test("MergePair matches a driver replica on corpus words + greedy edges") {
    import spark.implicits._
    def replica(s: Seq[String], a: String, b: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    // corpus-derived char sequences: merge the most banal English pair
    val chars = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .limit(500)
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("s"))
    val rows = chars
      .select(col("s"), graft.functions.MergePair.mergePair(col("s"), "t", "h")
        .as("m"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == replica(r.getSeq[String](0), "t", "h"))
    }
    // greedy non-overlap: [a,a,a] with (a,a) → [aa,a]; run of 4 → [aa,aa]
    val edge = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq.empty[String],
      Seq("x")).toDF("s")
    val got = edge.select(graft.functions.MergePair.mergePair(col("s"), "a", "a"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got == Seq(Seq("aa", "a"), Seq("aa", "aa"), Seq(), Seq("x")))
  }
}
