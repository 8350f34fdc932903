package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Approx-quantile profile: envelope verdicts on known distributions, the
  * NULL contracts, and the permille fan-out shape. The estimate itself is
  * engine-specific (GK merge order) and deliberately absent from the
  * output — these tests pin the audited CONTRACT, not sketch internals.
  */
class QuantilesSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def profile(rows: Seq[(Option[String], Option[Long])],
      pmls: Seq[Int], accuracy: Int = 10000) =
    Quantiles.approxQuantileProfile(rows.toDF("g", "v"), col("g"), col("v"),
        pmls, accuracy)
      .collect()
      .map(r => (Option(r.getString(0)), r.getInt(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap

  test("uniform 1..1000: every permille verdict true, exact fan-out") {
    val rows = (1L to 1000L).map(v => (Some("a"): Option[String]) -> Option(v))
    val out = profile(rows, Seq(250, 500, 900))
    assert(out.size == 3)
    for (p <- Seq(250, 500, 900)) {
      val (n, ok) = out((Some("a"), p))
      assert(n == 1000L)
      assert(ok, s"p=$p verdict false on a uniform distribution")
    }
  }

  test("skewed and constant groups stay inside the envelope at minimal accuracy") {
    // constant group: single value carries every rank; 90/10 two-value
    // group: the median MUST be the majority value and p=900 sits at the
    // boundary between the two — the envelope's floor/ceil slack is what
    // keeps a correct sketch green here
    val rows =
      (1 to 500).map(_ => (Some("const"): Option[String]) -> Option(7L)) ++
      (1 to 900).map(_ => (Some("skew"): Option[String]) -> Option(1L)) ++
      (1 to 100).map(_ => (Some("skew"): Option[String]) -> Option(2L))
    val out = profile(rows, Seq(100, 500, 900, 950), accuracy = 100)
    for (((g, p), (n, ok)) <- out) {
      assert(ok, s"group $g p=$p verdict false")
      assert(n == (if (g == Some("const")) 500L else 1000L))
    }
    assert(out.size == 8)
  }

  test("NULL values are excluded; NULL group is its own group") {
    val rows: Seq[(Option[String], Option[Long])] = Seq(
      Some("a") -> Some(1L), Some("a") -> Some(2L), Some("a") -> None,
      None -> Some(5L), None -> Some(6L), None -> None)
    val out = profile(rows, Seq(500))
    assert(out((Some("a"), 500)) == ((2L, true)))
    assert(out((None, 500)) == ((2L, true)))
    assert(out.size == 2)
  }

  test("contract guards: permille range, duplicates, accuracy bounds") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Quantiles.approxQuantileProfile(df, col("g"), col("v"), Seq(0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.approxQuantileProfile(df, col("g"), col("v"), Seq(500, 500))
    }
    intercept[IllegalArgumentException] {
      Quantiles.approxQuantileProfile(df, col("g"), col("v"), Seq(500),
        accuracy = 10)
    }
  }
}
