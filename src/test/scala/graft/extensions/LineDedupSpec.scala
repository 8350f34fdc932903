package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The multi-line path of [[Dedup.lineDedup]] — x50 exercises the machinery
  * at token granularity (the synthetic corpus is single-line), so the actual
  * RefinedWeb-style boilerplate removal on newline-separated documents is
  * pinned here.
  */
class LineDedupSpec extends AnyFunSuite with SparkTestSession {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "FOOTER\nunique one\nCOMMON"),
      (2L, "FOOTER\nunique two"),
      (3L, "COMMON\nFOOTER"),
      (4L, "FOOTER")
    ).toDF("doc_id", "text")
  }

  private def collectOut(maxDocFreq: Int) =
    Dedup.lineDedup(fixture, col("doc_id"), col("text"), maxDocFreq)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cross-doc lines removed everywhere, unique lines kept in order") {
    val out = collectOut(maxDocFreq = 1)
    // FOOTER in 4 docs, COMMON in 2 → both are boilerplate at maxDocFreq=1
    assert(out(1L) == ((3L, 2L, "unique one")))
    assert(out(2L) == ((2L, 1L, "unique two")))
    assert(out(3L) == ((2L, 2L, "")))   // fully-boilerplate doc survives, empty
    assert(out(4L) == ((1L, 1L, "")))
  }

  test("maxDocFreq raises the bar per-line, not per-doc") {
    val out = collectOut(maxDocFreq = 2)
    // COMMON (2 docs) now passes; FOOTER (4 docs) still removed
    assert(out(1L) == ((3L, 1L, "unique one\nCOMMON")))
    assert(out(3L) == ((2L, 1L, "COMMON")))
  }

  test("in-document repetition does not inflate a line's doc frequency") {
    import spark.implicits._
    val df = Seq((1L, "dup\ndup\nxx"), (2L, "yy")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, col("doc_id"), col("text"), maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "dup\ndup\nxx") // dup is in ONE doc → kept, order intact
    assert(out(2L) == "yy")
  }

  test("random multi-line corpora match a driver-side replica") {
    import spark.implicits._
    val rng = new scala.util.Random(53)
    val pool = (1 to 30).map(i => s"line-$i")
    val corpus = (1L to 200L).map { id =>
      val n = 1 + rng.nextInt(8)
      (id, Seq.fill(n)(pool(rng.nextInt(pool.size))).mkString("\n"))
    }
    val maxDocFreq = 3
    val out = Dedup.lineDedup(corpus.toDF("doc_id", "text"),
        col("doc_id"), col("text"), maxDocFreq)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

    val docFreq = corpus.flatMap { case (id, t) => t.split("\n", -1).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    corpus.foreach { case (id, t) =>
      val lines = t.split("\n", -1)
      val kept = lines.filter(l => docFreq(l) <= maxDocFreq)
      assert(out(id) == ((lines.length.toLong,
        (lines.length - kept.length).toLong, kept.mkString("\n"))), s"doc $id")
    }
  }

  test("token-unit mode (sep = space) prunes by document frequency") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a d"), (3L, "a b")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, col("doc_id"), col("text"),
        maxDocFreq = 2, sep = " ")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // a in 3 docs → pruned; b in 2 docs → kept; c/d unique → kept
    assert(out(1L) == ((3L, 1L, "b c")))
    assert(out(2L) == ((2L, 1L, "d")))
    assert(out(3L) == ((2L, 1L, "b")))
  }
}
