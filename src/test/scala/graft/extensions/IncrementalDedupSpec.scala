package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bloom-accelerated incremental dedup must be EXACTLY the anti-join: the
  * filter only routes rows between the free path and the verify join.
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private lazy val prior = spark.range(0, 600, 3)
    .select(concat(lit("key-"), col("id")).as("k"), col("id").as("pid"))
  private lazy val batch = spark.range(0, 600, 2)
    .select(concat(lit("key-"), col("id")).as("k"), col("id").as("bid"))

  private def exactAnti = batch.join(prior.select("k"), Seq("k"), "left_anti")

  test("dropSeen equals the exact anti-join (low fpp)") {
    val got = IncrementalDedup.dropSeen(batch, col("k"), prior, col("k"), fpp = 0.01)
    assert(got.exceptAll(exactAnti).isEmpty && exactAnti.exceptAll(got).isEmpty)
  }

  test("dropSeen equals the exact anti-join when the filter is saturated with false positives") {
    // fpp=0.4 forces many batch rows through the rescue join; output unchanged
    val got = IncrementalDedup.dropSeen(batch, col("k"), prior, col("k"), fpp = 0.4)
    assert(got.exceptAll(exactAnti).isEmpty && exactAnti.exceptAll(got).isEmpty)
  }

  test("no false negatives: every prior key is absent from the output") {
    val got = IncrementalDedup.dropSeen(batch, col("k"), prior, col("k"))
    assert(got.join(prior, Seq("k"), "inner").count() == 0)
  }

  test("batch-internal duplicates are preserved (dedup is vs prior only)") {
    val doubled = batch.unionByName(batch)
    val got = IncrementalDedup.dropSeen(doubled, col("k"), prior, col("k"))
    assert(got.count() == 2 * exactAnti.count())
  }

  test("null batch keys are kept as new (anti-join semantics)") {
    val withNull = batch.unionByName(
      Seq((null.asInstanceOf[String], -1L)).toDF("k", "bid"))
    val got = IncrementalDedup.dropSeen(withNull, col("k"), prior, col("k"))
    assert(got.filter(col("bid") === -1L).count() == 1)
  }

  test("unicode and empty-string keys survive the bytes-level probe round-trip") {
    val p = Seq("héllo", "日本語テキスト", "", "emoji🎉").toDF("k")
    val b = Seq("héllo", "日本語テキスト", "", "emoji🎉", "new-один", "ß").toDF("k")
    val got = IncrementalDedup.dropSeen(b, col("k"), p, col("k"))
      .select("k").as[String].collect().toSet
    assert(got == Set("new-один", "ß"))
  }

  test("keyBloom has no false negatives and honors the fpp order of magnitude") {
    val bloom = IncrementalDedup.keyBloom(prior, col("k"), expectedItems = 200,
      fpp = 0.01)
    val inPrior = prior.select("k").as[String].collect()
    assert(inPrior.forall(k => bloom.mightContainBinary(k.getBytes("UTF-8"))))
    val absent = (10000 until 20000).map(i => s"nope-$i")
    val fps = absent.count(k => bloom.mightContainBinary(k.getBytes("UTF-8")))
    assert(fps < absent.size * 0.05, s"fpp blew past 5x the requested 1%: $fps")
  }
}
