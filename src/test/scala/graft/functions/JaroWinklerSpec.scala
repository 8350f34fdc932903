package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extensions.Dedup

/** Native Jaro–Winkler: value parity with the oracle reference (DuckDB
  * `jaro_winkler_similarity` — constants below were read from DuckDB 1.0.0
  * directly), codegen path, null/empty semantics, and the blocked-pairs
  * operator's shape.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // (a, b, expected) — textbook cases + the semantics-pinning edges:
  // boost threshold (crate/trace sits above 0.7 with no common prefix;
  // abcdefgh/abzzzzzz has prefix 2 but jaro 0.5 ≤ 0.7 so NO boost),
  // zero-match (xy/yx window=0), empties.
  private val cases = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.8400000000000001),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("abcdefgh", "abzzzzzz", 0.5),
    ("xy", "yx", 0.0),
    ("crate", "trace", 0.7333333333333334),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("aaaa", "aaab", 0.8833333333333334),
    ("", "abc", 0.0),
    ("abc", "", 0.0),
    ("", "", 0.0))

  test("value parity with the DuckDB reference, symmetric, via codegen") {
    // fallback disabled: a codegen bug must fail, not silently interpret
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      val out = df.select(
        JaroWinklerSimilarity.jaroWinkler(col("a"), col("b")).as("ab"),
        JaroWinklerSimilarity.jaroWinkler(col("b"), col("a")).as("ba"))
        .collect()
      cases.zip(out).foreach { case ((a, b, exp), r) =>
        assert(r.getDouble(0) == exp, s"jw($a,$b)")
        assert(r.getDouble(1) == exp, s"jw($b,$a) asymmetric")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("null propagates; non-string inputs rejected at analysis") {
    val df = Seq((Some("abc"), Option.empty[String])).toDF("a", "b")
    val r = df.select(JaroWinklerSimilarity.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(r.isNullAt(0))
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(JaroWinklerSimilarity.jaroWinkler(col("a"), col("b")))
        .collect()
    }
    assert(err.getMessage.contains("jaro_winkler") ||
      err.getMessage.contains("STRING"))
  }

  test("bestFuzzyMatch: best link, margin, null margin, tie-break, no-match") {
    val left = Seq((10L, "b", "martha"), (20L, "b", "qqqqq"), (30L, "c", "dwayne"))
      .toDF("id", "blk", "nm")
    val right = Seq(
      (1L, "b", "marhta"),   // best for 10 (0.961111)
      (2L, "b", "martha"),   // exact 1.0 — beats 1
      (3L, "b", "martha"),   // tie with 2 at 1.0 → smaller id wins
      (4L, "c", "duane")     // only candidate for 30 → margin NULL
    ).toDF("id", "blk", "nm")
    val out = graft.extensions.Dedup.bestFuzzyMatch(left, right,
        col("id"), col("nm"), col("blk"), col("id"), col("nm"), col("blk"),
        threshold = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out.keySet == Set(10L, 30L)) // 20 has no candidate ≥ 0.8
    assert(out(10L) == ((2L, 1.0, Some(0.0))))  // tie → id 2; runner-up also 1.0
    assert(out(30L) == ((4L, 0.84, None)))
  }

  test("jaroWinklerPairs: blocked pairs, threshold on rounded score, order") {
    val df = Seq(
      (1L, "b1", "martha"), (2L, "b1", "marhta"), (3L, "b1", "zzzzz"),
      (4L, "b2", "martha"),             // other block: never pairs with 1/2
      (5L, "b2", "dwayne"), (6L, "b2", "duane"),
      (7L, null.asInstanceOf[String], "martha") // null block drops
    ).toDF("id", "blk", "nm")
    val out = Dedup.jaroWinklerPairs(df, col("id"), col("nm"), col("blk"),
        threshold = 0.84)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 0.961111), (5L, 6L, 0.84)))
    // threshold excludes the 0.84 pair when raised past the rounded score
    val strict = Dedup.jaroWinklerPairs(df, col("id"), col("nm"), col("blk"),
        threshold = 0.8400005)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L)))
  }
}
