package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extensions.Contamination

/** Count–Min and bottom-k sketches + the Bloom-prefiltered contamination
  * twin: deterministic guarantees (CMS never undercounts, Bloom has no
  * false negatives), estimate envelopes, degenerate shapes, and exact
  * output equality between the Bloom path and the broadcast path.
  */
class SketchesSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("countMinProfile: never undercounts, exact at generous width") {
    // 100 distinct terms, zipf-ish counts 1..100
    val rows = (1 to 100).flatMap(t => Seq.fill(t)(s"term$t"))
    val df = rows.toDF("t")
    val out = Sketches.countMinProfile(df, col("t"), depth = 4, width = 4096)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(out.size == 100)
    out.foreach { case (t, (exact, est, geOk, over)) =>
      assert(exact == t.drop(4).toLong)
      assert(geOk && est >= exact && over == est - exact)
    }
    // 100 terms into 4×4096 cells: collisions possible but few — the grid
    // is effectively exact and total overcount should be zero here
    assert(out.values.map(_._4).sum == 0L)
  }

  test("countMinProfile: tight width forces collisions, ge_ok still holds") {
    val rows = (1 to 500).flatMap(t => Seq.fill(1 + t % 7)(s"w$t"))
    val out = Sketches.countMinProfile(rows.toDF("t"), col("t"),
      depth = 3, width = 64).collect()
    assert(out.length == 500)
    // the deterministic guarantee survives heavy collision pressure
    assert(out.forall(_.getBoolean(3)))
    // and collisions actually happened (otherwise this test checks nothing)
    assert(out.map(_.getLong(4)).sum > 0L)
    // CMS error bound intuition: average overcount per probe is ~N/width;
    // with depth=3 mins the bulk must sit well under the single-row bound
    val n = rows.size
    val violations = out.count(_.getLong(4) > 3L * n / 64)
    assert(violations <= out.length / 20,
      s"$violations of ${out.length} terms exceed 3eN/w")
  }

  test("countMinProfile: nulls dropped, depth/width guards") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("t")
    val out = Sketches.countMinProfile(df, col("t")).collect()
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 1L))
    intercept[IllegalArgumentException] {
      Sketches.countMinProfile(df, col("t"), depth = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.countMinProfile(df, col("t"), width = 8)
    }
  }

  test("bottomKOverlap: estimates track exact Jaccard, zero-overlap rows kept") {
    // A and B share 500 of 1000 terms (J=1/3); C is disjoint from both
    val a = (1 to 1000).map(i => ("A", s"t$i"))
    val b = (501 to 1500).map(i => ("B", s"t$i"))
    val c = (1 to 300).map(i => ("C", s"u$i"))
    val df = (a ++ b ++ c ++ a.take(10)).toDF("g", "t") // dupes collapse
    val out = Sketches.bottomKOverlap(df, col("g"), col("t"), k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3)
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_a") == 1000L && ab.getAs[Long]("n_b") == 1000L)
    assert(ab.getAs[Long]("n_common") == 500L)
    assert(math.abs(ab.getAs[Double]("jaccard_exact") - 1.0 / 3) < 1e-6)
    assert(ab.getAs[Boolean]("approx_ok"),
      s"estimate ${ab.getAs[Double]("kmv_estimate")} outside envelope of 1/3")
    // disjoint pairs survive with exact zero and a near-zero estimate
    val ac = out(("A", "C"))
    assert(ac.getAs[Long]("n_common") == 0L &&
      ac.getAs[Double]("jaccard_exact") == 0.0 && ac.getAs[Boolean]("approx_ok"))
  }

  test("bottomKOverlap: sub-k groups degrade to exact") {
    // both groups have < k distinct terms: sketch == distinct set, so the
    // merged-k estimate IS the exact Jaccard
    val df = ((1 to 40).map(i => ("x", s"t$i")) ++
      (21 to 60).map(i => ("y", s"t$i"))).toDF("g", "t")
    val r = Sketches.bottomKOverlap(df, col("g"), col("t"), k = 256)
      .collect().head
    assert(r.getAs[Long]("n_common") == 20L)
    assert(r.getAs[Double]("kmv_estimate") == r.getAs[Double]("jaccard_exact"))
  }

  test("bloomPrefilteredContamination == ngramContamination, FP-stressed") {
    // word-soup docs; benchmark = every 7th doc. mBits=64 (ONE word) makes
    // virtually every probe a false positive — the exact confirm join must
    // still reduce the result to exactly the broadcast path's output.
    val docs = (1 to 120).map { i =>
      val words = (0 until 20).map(j => s"w${(i * 37 + j * 11) % 211}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val exact = key(Contamination.ngramContamination(
      docs, bench, col("doc_id"), col("text"), n = 3))
    for (m <- Seq(64, 1 << 12, 1 << 18)) {
      val bloom = key(Contamination.bloomPrefilteredContamination(
        docs, bench, col("doc_id"), col("text"), n = 3, mBits = m))
      assert(bloom == exact, s"bloom path diverged at mBits=$m")
    }
  }

  test("bloom prefilter guards: mBits multiple of 64, kHashes range") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Contamination.bloomPrefilteredContamination(df, df, col("doc_id"),
        col("text"), mBits = 100)
    }
    intercept[IllegalArgumentException] {
      Contamination.bloomPrefilteredContamination(df, df, col("doc_id"),
        col("text"), kHashes = 0)
    }
  }
}
