package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** r18 (VERDICT #7): the tokenizer trainer-fit memo is keyed by corpus
  * CONTENT fingerprint, so in-session regeneration of the dataset at the
  * SAME path must miss the memo and refit — a (session, dir) key would
  * serve the stale model.
  */
class TokenizerFitCacheSpec extends AnyFunSuite with SparkTestSession {

  test("a changed corpus at the same path misses the trainer-fit memo") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fitcache")
      .toFile.getAbsolutePath
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // corpus A: pair statistics dominated by (a, b)
    write(Seq.fill(20)("abab abab abab"))
    val m1 = SparkEntry.queries("x96_bpe_merges")(spark, dir)
      .collect().map(_.toString).toSeq
    assert(m1.nonEmpty && m1.head.contains("a"))

    // corpus B regenerated at the SAME path (different size and content)
    write(Seq.fill(30)("cdcd cdcd") ++ Seq.fill(5)("xy xy xy"))
    val m2 = SparkEntry.queries("x96_bpe_merges")(spark, dir)
      .collect().map(_.toString).toSeq
    assert(m1 != m2, "stale fit served after in-session regeneration")
    assert(m2.exists(r => r.contains("c")), "refit does not reflect corpus B")
  }
}
