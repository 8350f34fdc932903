package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PcaSpec extends AnyFunSuite with SparkTestSession {

  private val S = 1000000L

  /** Exact driver replica of the integer fixed-point algorithm. */
  private def replica(vecs: Seq[Array[Double]], iters: Int)
      : (Seq[Long], Long) = {
    val d = vecs.head.length
    val n = vecs.size.toLong
    val xm = vecs.map(v => v.map(x => math.round(x * S)))
    val m = Array.tabulate(d)(i => xm.map(_(i)).sum / n)
    val c = xm.map(v => Array.tabulate(d)(i => v(i) - m(i)))
    val cov = Array.tabulate(d, d)((i, j) =>
      c.map(r => r(i) * r(j) / S).sum / n)
    var v = Array.fill(d)(S)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j) / S).sum)
      val dv = math.max(w.map(math.abs).max / S, 1L)
      v = w.map(_ / dv)
    }
    var k = 0
    for (i <- 1 until d) if (math.abs(v(i)) > math.abs(v(k))) k = i
    if (v(k) < 0) v = v.map(x => -x)
    val w2 = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j) / S).sum)
    val num = (0 until d).map(i => v(i) * w2(i) / S).sum
    val den = (0 until d).map(i => v(i) * v(i) / S).sum
    (c.map(r => (0 until d).map(i => r(i) * v(i)).sum / S), num * S / math.max(den, 1L))
  }

  test("matches the exact integer replica; finds the dominant direction") {
    import spark.implicits._
    // variance concentrated along (1, 1, 0, 0)/√2; small noise on dims 2-3
    val vecs = (0 until 40).map { i =>
      val t = (i - 20) * 0.1
      Array(t + 0.01 * (i % 3), t - 0.01 * (i % 5), 0.02 * (i % 7), 0.3)
    }
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val out = Similarity.pcaTopComponent(df, col("vec_id"), col("embedding"),
        dims = 4, iterations = 12)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // float→double micro-rounding must match the engine's float cast
    val asF = vecs.map(v => v.map(x => x.toFloat.toDouble))
    val (scores, lam) = replica(asF, 12)
    for (i <- vecs.indices)
      assert(out(i.toLong)._1 == scores(i), s"row $i projection")
    assert(out.values.map(_._2).toSet == Set(lam), "constant eigenvalue")
    // the projection orders rows along the dominant axis: monotone in t
    val proj = (0 until 40).map(i => out(i.toLong)._1)
    assert(proj.zip(proj.tail).forall { case (a, b) => a < b },
      "projections strictly increase along the dominant direction")
    // eigenvalue ≈ variance of t·√2-ish axis, far above the noise dims
    assert(lam > 1000000L, s"top eigenvalue too small: $lam")
  }

  test("partition-independent and sign-deterministic") {
    import spark.implicits._
    // dominant direction deliberately NEGATIVE-leaning: sign fix must still
    // produce identical output regardless of iteration internals
    val vecs = (0 until 30).map { i =>
      val t = (i - 15) * 0.2
      Array(-t, 0.05 * (i % 4), t * 0.5)
    }
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pcaTopComponent(d, col("vec_id"), col("embedding"),
          dims = 3, iterations = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val a = run(df)
    assert(run(df.repartition(7)) == a, "partitioning must not change output")
    // the largest-|v| component is positive → scores correlate with -dim0
    val byId = a.map(t => t._1 -> t._2).toMap
    assert(byId(0L) != byId(29L), "projection separates the extremes")
  }

  test("elements outside the |x| <= 30 envelope raise, never wrap") {
    import spark.implicits._
    val bad = Seq((1L, Seq(0.5, 31.0)), (2L, Seq(0.1, 0.2)))
      .toDF("id", "v")
    val ex = intercept[Exception] {
      Similarity.pcaTopComponent(bad, col("id"), col("v"), dims = 2).collect()
    }
    val msg = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(c => Option(c.getMessage)).mkString(" | ")
    assert(msg.contains("overflow-safe envelope 30"))
    // boundary value 30.0 is inside the envelope
    val ok = Seq((1L, Seq(30.0, -30.0)), (2L, Seq(-30.0, 30.0)))
      .toDF("id", "v")
    assert(Similarity.pcaTopComponent(ok, col("id"), col("v"), dims = 2)
      .count() == 2L)
  }

  test("ragged vectors are rejected, not silently mis-summed") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaTopComponent(df, col("id"), col("v"), dims = 2)
    }
    assert(e.getMessage.contains("counts differ") ||
      e.getMessage.contains("dims"))
  }
}
