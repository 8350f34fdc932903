package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HLL++ per-group cardinality profile: determinism, error envelope,
  * null semantics, density arithmetic.
  */
class CardinalitySpec extends AnyFunSuite with SparkTestSession {

  test("approxDistinctProfile: envelope vs exact, nulls, density, determinism") {
    import spark.implicits._
    // g1: 1000 rows over 100 distinct; g2: all-duplicate; g3: nulls only
    val rows = (1 to 1000).map(i => ("g1", Some((i % 100).toLong))) ++
      (1 to 50).map(_ => ("g2", Some(7L))) ++
      (1 to 5).map(_ => ("g3", Option.empty[Long]))
    val df = rows.toDF("g", "v")
    def run() = Cardinality.approxDistinctProfile(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val out = run()
    val (n1, a1, d1) = out("g1")
    assert(n1 == 1000L)
    assert(math.abs(a1 - 100L) <= 20L) // 4*rsd envelope at rsd=0.05
    assert(d1 == a1 * 1000000L / 1000L)
    assert(out("g2") == ((50L, 1L, 20000L)))      // tiny sets are exact
    assert(out("g3")._2 == 0L)                    // nulls are not a value
    assert(run() == out)                          // hash-deterministic
    // rsd contract range is enforced
    intercept[IllegalArgumentException] {
      Cardinality.approxDistinctProfile(df, col("g"), col("v"), rsd = 0.5)
    }
  }
}
