package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev audit: prints formatted physical plans of selected queries and greps for
  * the scale smells — missing PushedFilters, missing broadcast, single-partition
  * exchanges, non-codegen stages. Run per round after correctness is green.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val smells = Seq(
        "SinglePartition" -> plan.contains("SinglePartition"),
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-PushedFilters" -> (plan.contains("PushedFilters: []") && name.startsWith("q0")),
        "SortMergeJoin" -> plan.contains("SortMergeJoin")
      ).filter(_._2).map(_._1)
      println(f"$name%-32s ${if (smells.isEmpty) "clean" else smells.mkString(", ")}")
      if (args.length > 1) println(plan)
    }
    spark.stop()
  }
}
