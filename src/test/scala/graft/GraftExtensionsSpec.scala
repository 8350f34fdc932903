package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions (§2.10). */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestSession {

  test("register() exposes ngrams/minhash_sig/simhash64 to SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT ngrams(array('a','b','c'), 2) AS sh,
                simhash64(ngrams(array('a','b','c'), 2)) AS sk,
                minhash_sig(array('a b','b c'), 4) AS sig""").head()
    assert(row.getSeq[String](0) == Seq("a b", "b c"))
    // SQL path must equal the Column path exactly
    import org.apache.spark.sql.functions._
    val viaColumns = spark.range(1)
      .select(graft.functions.SimHash64.simhash64(
        graft.functions.NGrams.ngrams(array(lit("a"), lit("b"), lit("c")), 2)))
      .head().getLong(0)
    assert(row.getLong(1) == viaColumns)
    assert(row.getSeq[Long](2).length == 4)

    val simRow = spark.sql(
      """SELECT dot_product(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
                            array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d,
                length(sign_lsh_bucket(array(CAST(0.5 AS DOUBLE), CAST(-1.5 AS DOUBLE)), 8)) AS b""").head()
    assert(simRow.getDouble(0) == 11.0)
    assert(simRow.getInt(1) == 8)

    val st = spark.sql(
      "SELECT ngram_stats(array('a','b','a','b','a'), 2) AS s").head()
      .getStruct(0)
    assert(st.getLong(0) == 4 && st.getLong(1) == 2 && st.getLong(2) == 2)
  }

  test("register() exposes the round-12 expressions to SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT jaro_winkler_similarity('martha', 'marhta') AS jw,
                hilbert2(3, 5, 4) AS h,
                hilbert2_decode(hilbert2(3, 5, 4), 4) AS xy,
                token_entropy(array('a','a','b','b')) AS ent,
                doc_fingerprint64('hello world doc', 8, 64) AS fp""").head()
    assert(math.abs(row.getDouble(0) - 0.9611111111111111) < 1e-12)
    // decode must invert encode exactly
    assert(row.getSeq[Long](2) == Seq(3L, 5L))
    // 4 tokens, 2 types, uniform → entropy ln(2) nats = 693148 micros
    val ent = row.getStruct(3)
    assert(ent.getLong(0) == 4L && ent.getLong(1) == 2L &&
      ent.getLong(2) == 693148L)
    // SQL path ≡ Column path
    import org.apache.spark.sql.functions._
    val viaCol = spark.range(1).select(
        graft.functions.JaroWinklerSimilarity.jaroWinkler(lit("martha"), lit("marhta")),
        graft.functions.HilbertCurve.hilbert2(lit(3L), lit(5L), 4),
        graft.functions.DocFingerprint64.docFingerprint64(lit("hello world doc"), 8, 64))
      .head()
    assert(row.getDouble(0) == viaCol.getDouble(0))
    assert(row.getLong(1) == viaCol.getLong(1))
    assert(row.get(4) == viaCol.get(2))
  }

  test("builder.withExtensions(new GraftExtensions) injects the same functions") {
    // `spark.sql.extensions=graft.GraftExtensions` is the cluster-config route,
    // but it is read at SparkContext creation — unreachable from a shared test
    // context. withExtensions applies the same class at session build time.
    val prior = spark // keep the shared session's context alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val n = s2.sql("SELECT size(ngrams(array('x','y','z','w'), 3)) AS n").head().getInt(0)
      assert(n == 2)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("non-literal n is rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT ngrams(array('a','b'), cast(id AS INT)) FROM range(1)").head()
    }
    assert(e.getMessage.contains("literal INT"))
  }

  test("optimizer rule rewrites thresholded levenshtein predicates banded") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq(("kitten", "sitten"), ("kitten", "kitchen"),
      ("kitten", "apple"), (null, "x")).toDF("a", "b")

    def thresholds(q: org.apache.spark.sql.DataFrame): Seq[Boolean] = {
      val b = Seq.newBuilder[Boolean]
      q.queryExecution.optimizedPlan.foreach(_.expressions.foreach(
        _.foreach {
          case l: org.apache.spark.sql.catalyst.expressions.Levenshtein =>
            b += l.threshold.isDefined
          case _ =>
        }))
      b.result()
    }
    // all four literal forms rewrite to the banded expression...
    for (cond <- Seq(levenshtein(col("a"), col("b")) <= 1,
        levenshtein(col("a"), col("b")) < 2,
        lit(1) >= levenshtein(col("a"), col("b")),
        lit(2) > levenshtein(col("a"), col("b")))) {
      val q = df.filter(cond)
      assert(thresholds(q).forall(identity), s"not banded: $cond")
      // ...with identical semantics (matches, non-matches, null rows out)
      assert(q.collect().map(_.getString(1)).toSet == Set("sitten"))
    }
    // guards: a column threshold and an always-false k stay unrewritten
    val colK = df.filter(levenshtein(col("a"), col("b")) <= length(col("b")))
    assert(thresholds(colK).forall(!_))
    assert(df.filter(levenshtein(col("a"), col("b")) <= -1).count() == 0)
  }
}
