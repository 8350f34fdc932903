package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Specs for the time-series/recency operators: decayed activity scoring,
  * chi-square contingency, lag autocorrelation.
  */
class TimeSeriesDecaySpec extends AnyFunSuite with SparkTestSession {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  // --- Decay.decayedActivity ------------------------------------------------

  test("decayedActivity halves weight per half-life, exact integer sum") {
    import spark.implicits._
    // half-life 100 s; latest event at t=200: weights 1e6, 5e5, 2.5e5
    val df = Seq(("u1", t(200), 2.0), ("u1", t(100), 2.0),
      ("u1", t(0), 2.0), ("u2", t(200), 1.0),
      ("u3", null.asInstanceOf[Timestamp], 9.0)).toDF("k", "ts", "v")
    val out = Decay.decayedActivity(df, col("k"), col("ts"), col("v"), 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    assert(out("u1") == ((3L, 2000L * 1000000L + 2000L * 500000L +
      2000L * 250000L)))
    assert(out("u2") == ((1L, 1000L * 1000000L)))
    assert(!out.contains("u3")) // null ts excluded entirely
  }

  test("decayedActivity enforces per-event and per-key overflow envelopes") {
    import spark.implicits._
    def chain(x: Throwable): Seq[Throwable] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).take(10).toSeq
    def msgOf(x: Throwable): String =
      chain(x).flatMap(c => Option(c.getMessage)).mkString(" | ")
    // per-event: |round(v*1000)| > (2^63-1)/1e6 must raise, not wrap
    val e1 = intercept[Exception] {
      Decay.decayedActivity(Seq(("u", t(0), 1e10)).toDF("k", "ts", "v"),
        col("k"), col("ts"), col("v"), 100L).collect()
    }
    assert(msgOf(e1).contains("overflow-safe per-event bound"))
    // per-key: two near-max events sum past 2^63-1 in exact decimal — the
    // BIGINT materialization must raise (a Long sum would silently wrap)
    val vMax = 9.2e9 // vm 9.2e12, * 1e6 weight = 9.2e18 each
    val e2 = intercept[Exception] {
      Decay.decayedActivity(
        Seq(("u", t(100), vMax), ("u", t(100), vMax)).toDF("k", "ts", "v"),
        col("k"), col("ts"), col("v"), 100L).collect()
    }
    assert(msgOf(e2).contains("exceeds 2^63-1 for key"))
    // and a single near-max event is IN envelope and exact
    val ok = Decay.decayedActivity(
      Seq(("u", t(100), vMax)).toDF("k", "ts", "v"),
      col("k"), col("ts"), col("v"), 100L).collect()(0)
    assert(ok.getLong(3) == 9200000000000L * 1000000L)
  }

  // --- Drift.chi2Contingency ------------------------------------------------

  test("chi2Contingency zero under independence, hand-check 2x2, dof") {
    import spark.implicits._
    // independent: both groups 50/50 over {a,b} -> chi2 contribution 0
    val ind = (Seq.fill(2)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq.fill(3)(("g2", "a")) ++ Seq.fill(3)(("g2", "b")))
      .toDF("grp", "cat")
    val outInd = graft.extensions.Drift.chi2Contingency(ind, col("grp"),
      col("cat")).collect()
    assert(outInd.forall(_.getDouble(2) == 0.0))
    assert(outInd.forall(_.getLong(3) == 1L)) // (2-1)*(2-1)
    // dependent 2x2: g1 {a:4}, g2 {b:4}; e = 2 in all cells ->
    // each cell term (4-2)^2/2 or (0-2)^2/2 = 2 -> per-group chi2 = 4
    val dep = (Seq.fill(4)(("g1", "a")) ++ Seq.fill(4)(("g2", "b")))
      .toDF("grp", "cat")
    val outDep = graft.extensions.Drift.chi2Contingency(dep, col("grp"),
      col("cat")).collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(outDep("g1") == ((4L, 4.0)))  // structural-zero cell counted
    assert(outDep("g2") == ((4L, 4.0)))
    // null labels are excluded entirely — never silently dropped from o
    // while inflating margins
    val withNulls = (Seq.fill(4)(("g1", "a")) ++ Seq.fill(4)(("g2", "b")) ++
      Seq((null, "a"), ("g1", null))).toDF("grp", "cat")
    val outN = graft.extensions.Drift.chi2Contingency(withNulls, col("grp"),
      col("cat")).collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(outN == outDep) // identical to the null-free table
  }

  // --- TimeSeries.lagAutocorr -----------------------------------------------

  test("lagAutocorr alternating series: r(-1) at lag 1, r(+1) at lag 2") {
    import spark.implicits._
    // one event in even seconds, three in odd seconds, 40 buckets
    val rows = (0 until 40).flatMap { i =>
      Seq.fill(if (i % 2 == 0) 1 else 3)((t(i.toLong), 1))
    }
    val df = rows.toDF("ts", "x")
    val out = TimeSeries.lagAutocorr(df, col("ts"), 1L, Seq(1, 2))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(5)))).toMap
    assert(out(1L) == ((39L, -1.0)))
    assert(out(2L) == ((38L, 1.0)))
  }

  test("lagAutocorr densifies gaps and nulls r for constant series") {
    import spark.implicits._
    // constant one-event-per-second with a hole at t=5: the dense zero
    // breaks constancy at lag 1 (r defined), while a truly constant
    // series yields den 0 -> r NULL
    val gap = (0 to 10).filter(_ != 5).map(i => (t(i.toLong), 1))
      .toDF("ts", "x")
    val g = TimeSeries.lagAutocorr(gap, col("ts"), 1L, Seq(1)).collect()(0)
    assert(g.getLong(1) == 10L)      // 11 dense buckets incl. the zero
    assert(!g.isNullAt(5) && g.getDouble(5) < 0.0)
    val const = (0 to 10).map(i => (t(i.toLong), 1)).toDF("ts", "x")
    val c = TimeSeries.lagAutocorr(const, col("ts"), 1L, Seq(1)).collect()(0)
    assert(c.isNullAt(5))            // zero variance: no correlation
  }

  test("lagAutocorr rejects series outside the B*maxC overflow envelope") {
    import spark.implicits._
    // two events 3.2e9 buckets apart: B*maxC = 3.2e9 > floor(sqrt(2^63-1)),
    // so the driver-side envelope check must fire BEFORE the dense range
    // (and its (B*maxC)^2-scale cross products) is ever built
    val far = Seq((new Timestamp(0L), 1), (new Timestamp(3200000000000L), 1))
      .toDF("ts", "x")
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.lagAutocorr(far, col("ts"), 1L, Seq(1))
    }
    assert(ex.getMessage.contains("floor(sqrt(2^63-1))"))
  }
}
