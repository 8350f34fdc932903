package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** recallAtK + bruteForceL2TopK — the measurement layer behind the
  * x157/x158 ANN-quality audit. Hand-traced set arithmetic, the
  * truth-keyed zero-recall stance for estimators that return nothing, the
  * rank>k ignore contract (a k=50 fixture serving a k=5 measurement), and
  * the L2 ground truth's self-inclusion contract (matching the PQ family).
  */
class RecallSpec extends AnyFunSuite with SparkTestSession {

  private def topk(rows: Seq[(Long, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("query_id", "neighbor_id", "rank")
  }

  test("recallAtK hand-trace: |est ∩ truth| / |truth| per query") {
    val truth = topk(Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)))
    val est = topk(Seq((1L, 10L, 1), (1L, 12L, 2), (1L, 99L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)))
    val got = Similarity.recallAtK(est, truth, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) === ((3L, 2L, 0.666667)))
    assert(got(2L) === ((3L, 3L, 1.0)))
  }

  test("an estimator that returns NOTHING for a query scores 0, not absent") {
    val truth = topk(Seq((1L, 10L, 1), (2L, 20L, 1)))
    val est = topk(Seq((1L, 10L, 1))) // query 2 missing (empty LSH bucket)
    val got = Similarity.recallAtK(est, truth, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got === Map(1L -> 1.0, 2L -> 0.0))
  }

  test("rank>k rows are ignored on BOTH sides (k=5 truth serving k=2)") {
    val truth = topk(Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (1L, 13L, 4), (1L, 14L, 5)))
    // est's rank-3 row hits truth's rank-1 — must NOT count at k=2
    val est = topk(Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3)))
    val got = Similarity.recallAtK(est, truth, 2).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 2L) // n_truth: ranks 1..2 only
    assert(got(0).getLong(2) === 1L) // hits: just neighbor 11
    assert(got(0).getDouble(3) === 0.5)
  }

  test("bruteForceL2TopK: exact L2² order, self kept, ties to lower id") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),  // dist2 to q=origin: 1
      (2L, Array(0.0f, 2.0f)),  // 4
      (3L, Array(1.0f, 0.0f))   // 1 — exact tie with 1, loses on id
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceL2TopK(
      corpus.filter(col("vec_id") === 0L), corpus, k = 3).collect()
      .map(r => (r.getInt(3), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // self (dist2=0) ranks first — the PQ-family contract
    assert(got.toSeq === Seq((1, 0L, 0.0), (2, 1L, 1.0), (3, 3L, 1.0)))
  }

  test("bruteForceL2TopK agrees with the cosine brute on normalized vectors") {
    import spark.implicits._
    // on unit vectors L2² = 2 − 2·cos, so the orders must coincide
    val rng = new scala.util.Random(5)
    val corpus = (0L until 40L).map { i =>
      val v = Array.fill(8)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") < 3)
    val l2 = Similarity.bruteForceL2TopK(q, corpus, k = 4)
      .filter(col("rank") > 1) // drop self — the cosine brute excludes it
      .collect().map(r => (r.getLong(0), r.getInt(3) - 1) -> r.getLong(1)).toMap
    val cos = Similarity.bruteForceTopK(q, corpus, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(l2 === cos)
  }
}
