package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for Ensemble.raterAgreement (x145): the textbook 2×2 kappa
  * worked example, pairwise NULL deletion, and the degenerate
  * (chance-agreement = 1) edge.
  *
  * Output columns: n, n_unlabeled, n_tt, n_tf, n_ft, n_ff, po_micro,
  * kappa_micro, degenerate. The kappa num/den are internal DECIMAL(38,0)
  * (n² would overflow BIGINT at corpus scale); the counts in the output are
  * the exact audit.
  */
class RaterAgreementSpec extends AnyFunSuite with SparkTestSession {

  private def mk(tt: Int, tf: Int, ft: Int, ff: Int) = {
    import spark.implicits._
    (Seq.fill(tt)((true, true)) ++ Seq.fill(tf)((true, false)) ++
      Seq.fill(ft)((false, true)) ++ Seq.fill(ff)((false, false)))
      .toDF("a", "b")
  }

  test("textbook 2x2: n=50, po=.7, pe=.5, kappa=.4") {
    val r = Ensemble.raterAgreement(mk(20, 5, 10, 15), col("a"), col("b"))
      .collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 0L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((20L, 5L, 10L, 15L)))
    assert(r.getLong(6) == 700000L)                 // po
    assert(r.getLong(7) == 400000L && !r.getBoolean(8)) // kappa = 500/1250
  }

  test("NULL labels are excluded pairwise and counted") {
    import spark.implicits._
    val df = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (true, true), (true, true), (false, false),
      (null, true), (true, null)).toDF("a", "b")
    val r = Ensemble.raterAgreement(df, col("a"), col("b")).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L && r.getLong(5) == 1L)
    assert(r.getLong(6) == 1000000L)                // perfect observed
    assert(r.getLong(7) == 1000000L)                // and perfect kappa
  }

  test("both raters constant -> degenerate, kappa NULL, no blow-up") {
    val r = Ensemble.raterAgreement(mk(4, 0, 0, 0), col("a"), col("b"))
      .collect()(0)
    assert(r.isNullAt(7) && r.getBoolean(8))
    // one rater constant is NOT degenerate: kappa is exactly 0
    val r2 = Ensemble.raterAgreement(mk(3, 1, 0, 0), col("a"), col("b"))
      .collect()(0)
    assert(r2.getLong(7) == 0L && !r2.getBoolean(8))
  }
}
