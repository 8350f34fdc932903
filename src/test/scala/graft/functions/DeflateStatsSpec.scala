package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DeflateStatsSpec extends AnyFunSuite with SparkTestSession {

  /** Driver-side replica with the same pinned codec (level 6, zlib). */
  private def deflateLen(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  test("matches the driver-side Deflater replica on corpus + edge docs") {
    import spark.implicits._
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100).select("text").collect().map(_.getString(0)).toSeq ++
      Seq("", "a", "aaaaaaaaaaaaaaaaaaaaaaaa", "héllo → wörld …",
        ("x" * 100000) + "tail", scala.util.Random.alphanumeric.take(5000).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = df.select(col("id"),
        DeflateStats.deflateStats(col("text")).as("d"))
      .select(col("id"), col("d.n_bytes"), col("d.n_deflate"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((t, i) <- texts.zipWithIndex) {
      assert(out(i.toLong) ==
        ((t.getBytes("UTF-8").length.toLong, deflateLen(t))), s"doc $i")
    }
  }

  test("signal direction: repetitive text compresses far better than random") {
    import spark.implicits._
    val rep = "the same line again and again\n" * 200
    val rnd = new scala.util.Random(7)
    val noise = Iterator.continually(rnd.nextPrintableChar()).take(rep.length).mkString
    val df = Seq((1L, rep), (2L, noise)).toDF("id", "text")
    val r = df.select(col("id"),
        graft.extensions.TextAnalysis.compressionRatio(col("text")).as("c"))
      .select(col("id"), col("c.ratio")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < 0.05, s"templated text must compress hard: ${r(1L)}")
    assert(r(2L) > 0.5, s"noise must not: ${r(2L)}")
  }

  test("x82 invariants hold on hostile shapes (incl. beyond-window mega doc)") {
    import spark.implicits._
    val mega = scala.util.Random.alphanumeric.take(200000).mkString // > 32 KB window
    val df = Seq("", "a", "ab" * 40, mega, "日本語テキスト" * 30)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val d1 = DeflateStats.deflateStats(col("text"))
    val d2 = DeflateStats.deflateStats(concat(col("text"), col("text")))
    val bad = df.select(col("doc_id"), d1.as("c1"), d2.as("c2"))
      .filter(!(col("c1.n_deflate") > 0L &&
          col("c1.n_deflate") <= col("c1.n_bytes") + lit(64L) +
            col("c1.n_bytes") / lit(1024L)) ||
        !(col("c2.n_deflate") <= col("c1.n_deflate") * 2L + lit(128L)) ||
        !(col("c1.n_bytes") < 64L || col("c1.n_bytes") > 30000L ||
          col("c2.n_deflate") <= col("c1.n_deflate") +
            col("c1.n_bytes") / lit(4L) + lit(64L)))
      .count()
    assert(bad == 0)
  }
}
