package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PushdownFence: a value-transparent optimizer barrier — same rows out,
  * but the fenced predicate must stay ABOVE a repartition instead of being
  * pushed to the scan (the r17 fan-out contract).
  */
class PushdownFenceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("fence(pred) filters exactly like pred (incl. null predicate rows)") {
    val df = Seq((1L, "aa"), (2L, "b"), (3L, null), (4L, "dddd"))
      .toDF("id", "t")
    val pred = length(col("t")) >= 2 // null t -> null pred -> dropped
    val plain = df.filter(pred).select("id").as[Long].collect().sorted
    val fenced = df.filter(PushdownFence.fence(pred))
      .select("id").as[Long].collect().sorted
    assert(fenced.sameElements(plain))
    assert(fenced.sameElements(Array(1L, 4L)))
  }

  test("fenced filter is not pushed below a repartition; plain filter is") {
    val df = spark.range(0, 100).toDF("id").repartition(4)
    def planOf(q: org.apache.spark.sql.DataFrame): String =
      q.queryExecution.optimizedPlan.toString
    // plain deterministic predicate: pushed below the repartition
    val plain = planOf(df.filter(col("id") % 7 === 0))
    assert(plain.indexOf("Repartition") < plain.indexOf("Filter"),
      s"expected plain filter pushed below repartition:\n$plain")
    // fenced predicate: stays above the repartition
    val fenced = planOf(df.filter(PushdownFence.fence(col("id") % 7 === 0)))
    assert(fenced.indexOf("Filter") < fenced.indexOf("Repartition"),
      s"expected fenced filter above repartition:\n$fenced")
  }

  test("fence is value-transparent in projections under codegen") {
    val df = Seq(("x", 1), ("yy", 2)).toDF("t", "n")
    val out = df.select(
      PushdownFence.fence(concat(col("t"), lit("!"))).as("c"),
      PushdownFence.fence(col("n") * 2).as("d"))
      .as[(String, Int)].collect().toSet
    assert(out == Set(("x!", 2), ("yy!", 4)))
  }
}
