package graft.ops

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed layout must eliminate the join-time shuffle entirely. */
class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("join of two tables bucketed on the key runs with no exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    // disable auto-broadcast: at test scale Spark would broadcast the small
    // side and hide the point — at fact×fact scale the choice is shuffle vs
    // bucketed co-location, which is what this asserts
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("Exchange hashpartitioning"), plan)

      // and it computes the right thing
      val viaBuckets = joined.agg(count(lit(1)), sum("l_quantity")).head()
      val plain = orders.join(lineitem, "o_orderkey")
        .agg(count(lit(1)), sum("l_quantity")).head()
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
