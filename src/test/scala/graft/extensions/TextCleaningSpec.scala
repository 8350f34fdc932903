package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** cleanText / normalizeForDedup semantics on crawl-grade dirty fixtures —
  * the interesting paths x53 can only reach via manufactured dirt.
  */
class TextCleaningSpec extends AnyFunSuite with SparkTestSession {

  private def runClean(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.cleanText(col("t"))).first().getString(0)
  }

  private def runNorm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.normalizeForDedup(col("t"))).first().getString(0)
  }

  test("cleanText: control chars dropped, runs collapsed, blank lines squeezed") {
    assert(runClean("\u0001\u0002 a\t\t b \u0007c ") == "a b c")
    assert(runClean("p1\n\n\n\n\np2") == "p1\n\np2")     // 5 newlines → 2
    assert(runClean("p1\n\np2") == "p1\n\np2")           // 2 stay (paragraph break)
    assert(runClean("a\u0001\u0007b") == "ab")   // control chars vanish
    assert(runClean("a\nb") == "a\nb")                   // \n survives the ctl strip
    assert(runClean("a\tb") == "a b")                    // ...but tab runs become a space
  }

  test("cleanText is idempotent") {
    val nasty = "\u0000 x\t\ty \u001f\n\n\n\nz  "
    assert(runClean(runClean(nasty)) == runClean(nasty))
  }

  test("extractUrls / urlDomain / domainProfile") {
    import spark.implicits._
    val df = Seq(
      (1L, "see https://A.com/x and http://a.com/y plus https://b.org/z"),
      (2L, "no urls here"),
      (3L, "trailing https://c.net")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.domainProfile(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(out(1L) == ((3L, Seq("a.com", "b.org")))) // case-folded, distinct, sorted
    assert(out(2L) == ((0L, Seq.empty)))
    assert(out(3L) == ((1L, Seq("c.net"))))
  }

  test("normalizeForDedup: case/punct/whitespace variants converge") {
    val canonical = runNorm("Hello, World!  Foo-bar.")
    assert(canonical == "hello world foobar")
    // re-crawl variants that must hash identically
    assert(runNorm("hello world   foobar") == canonical)
    assert(runNorm("HELLO WORLD\tFOOBAR") == canonical)
    assert(runNorm("Hello; World? (foobar)") == canonical)
    assert(runNorm(runNorm("Hello, World!  Foo-bar.")) == canonical) // idempotent
  }

  private def runCanon(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("u").select(TextAnalysis.canonicalUrl(col("u"))).first().getString(0)
  }

  test("canonicalUrl: cosmetic variants of one page converge") {
    val canonical = "https://example.com/p/7?a=1&b=2"
    assert(runCanon("https://example.com/p/7?a=1&b=2") == canonical)
    assert(runCanon("https://WWW.Example.COM:443/p/7/?b=2&a=1#section") == canonical)
    assert(runCanon("https://example.com/p/7?utm_source=x&utm_medium=y&a=1&b=2&fbclid=z") == canonical)
    assert(runCanon(runCanon("https://WWW.example.com/p/7/?b=2&a=1")) ==
      runCanon("https://WWW.example.com/p/7/?b=2&a=1")) // idempotent
  }

  test("canonicalUrl: semantic differences are preserved") {
    // scheme, path case, port ≠ default, non-tracking params all distinguish
    assert(runCanon("http://example.com/p") != runCanon("https://example.com/p"))
    assert(runCanon("https://example.com/P") != runCanon("https://example.com/p"))
    assert(runCanon("https://example.com:8080/p") == "https://example.com:8080/p")
    assert(runCanon("https://example.com/p?ref=nav") == "https://example.com/p")
    assert(runCanon("https://example.com/p?refresh=1") ==
      "https://example.com/p?refresh=1") // prefix of a tracking key is kept
  }

  test("canonicalUrl: bare hosts, empty queries, and non-URLs") {
    assert(runCanon("https://www.example.com") == "https://example.com")
    assert(runCanon("https://example.com/?utm_source=x") == "https://example.com")
    assert(runCanon("ftp://example.com/a") == "ftp://example.com/a") // identity
    assert(runCanon("not a url at all") == "not a url at all")
  }

  test("kAnonymity: class sizes exact, small classes suppressed, columns kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "web", 100L), (2L, "en", "web", 150L), (3L, "en", "web", 120L),
      (4L, "en", "code", 100L), (5L, "fr", "web", 100L))
      .toDF("id", "lang", "source", "len")
    val out = TextAnalysis.kAnonymity(df,
        Seq(col("lang"), col("source"), expr("len div 200")), k = 3L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("qi_class_size"), r.getAs[Boolean]("suppress")))).toMap
    assert(out.size == 5, "every input row present, QI helper columns dropped")
    assert(out(1L) == ((3L, false)) && out(2L) == ((3L, false)) &&
      out(3L) == ((3L, false)), "the (en,web,0) class has 3 members")
    assert(out(4L) == ((1L, true)), "singleton class suppressed")
    assert(out(5L) == ((1L, true)), "fr differs in one attribute only — still exposed")
  }

  test("kAnonymity: NULL quasi-identifiers form real classes and are flagged") {
    import spark.implicits._
    // null lang is a legitimate equivalence class — a privacy audit must
    // class and flag those rows, not lose them to a null-unsafe join
    val df = Seq(
      (1L, Option("en"), "web"), (2L, Option("en"), "web"),
      (3L, Option.empty[String], "web"), (4L, Option.empty[String], "web"),
      (5L, Option.empty[String], "code"))
      .toDF("id", "lang", "source")
    val out = TextAnalysis.kAnonymity(df, Seq(col("lang"), col("source")), k = 2L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("qi_class_size"), r.getAs[Boolean]("suppress")))).toMap
    assert(out.size == 5, s"all rows survive, incl. null-QI ones — got $out")
    assert(out(3L) == ((2L, false)) && out(4L) == ((2L, false)),
      "the (NULL, web) class has 2 members and is not suppressed at k=2")
    assert(out(5L) == ((1L, true)), "the (NULL, code) singleton is flagged")
  }
}
