package graft.extensions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for Dedup.lshPlanAudit (x144): hand-computed S-curve points
  * for k=4 on a 250‰ grid, the FP/FN mass sums, the chosen-plan rule, and the
  * guards. `1−(1−s^r)^b` at s=½ is exactly representable for these (b,r), so
  * every expected micro value below is pencil-and-paper.
  */
class LshPlanAuditSpec extends AnyFunSuite with SparkTestSession {

  test("k=4 curve points, masses, and chosen plan — hand-traced") {
    val rows = Dedup.lshPlanAudit(spark, k = 4, thresholdPermille = 500,
        stepPermille = 250)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r).toMap
    assert(rows.size == 9) // 3 factorizations x 3 grid points

    // p(s=1/2): (4,1) 1-(1/2)^... = .9375; (2,2) .4375; (1,4) .0625
    assert(rows((4, 1, 500)).getLong(3) == 937500L)
    assert(rows((2, 2, 500)).getLong(3) == 437500L)
    assert(rows((1, 4, 500)).getLong(3) == 62500L)

    // fp mass = p at s=250 only: (2,2): 1-(1-1/16)^2 = .12109375 -> 121094
    val p22 = rows((2, 2, 500))
    assert(p22.getLong(5) == 121094L)
    // fn mass = (1e6-437500) + (1e6 - round(1e6*(1-(1-9/16)^2)))
    //         = 562500 + (1000000 - 808594) = 753906
    assert(p22.getLong(6) == 753906L)

    // chosen: |p(t)-500000| = 437500 / 62500 / 437500 -> (2,2) wins
    assert(rows.forall { case ((b, _, _), r) => r.getBoolean(7) == (b == 2) })
    // p_at_t is constant across a plan's grid rows
    assert(rows((2, 2, 250)).getLong(4) == 437500L)
  }

  test("tie on |p(t)-1/2| breaks to MORE bands") {
    // k=2, t=500: (2,1): 1-(1-s)^2 = .75 -> dist 250000
    //             (1,2): s^2 = .25      -> dist 250000 -> b=2 chosen
    val chosen = Dedup.lshPlanAudit(spark, k = 2, thresholdPermille = 500,
        stepPermille = 500)
      .collect().map(r => (r.getInt(0), r.getBoolean(7))).toMap
    assert(chosen == Map(2 -> true, 1 -> false))
  }

  test("guards: off-grid threshold and bad step rejected") {
    intercept[IllegalArgumentException] {
      Dedup.lshPlanAudit(spark, 32, thresholdPermille = 475)
    }
    intercept[IllegalArgumentException] {
      Dedup.lshPlanAudit(spark, 32, thresholdPermille = 1000)
    }
    intercept[IllegalArgumentException] {
      Dedup.lshPlanAudit(spark, 1, thresholdPermille = 500)
    }
  }
}
