package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering.
  *
  * The reference's row order is Python list order (SURVEY §7.4.3); the engine makes
  * it an explicit `seq` column. A naive `row_number().over(Window.orderBy(...))`
  * collapses the whole table into ONE partition — fine at test scale, fatal at
  * 100 TB. This is the two-phase formulation: range-repartition on the sort keys
  * (parallel sort), number rows locally per partition, then add per-partition
  * offsets computed from a partition-count side job (numPartitions rows on the
  * driver — metadata-sized, not data-sized).
  *
  * Requires the sort keys to be a total order (unique) for a deterministic result.
  */
object SeqNumber {

  def withGlobalSeq(df: DataFrame, outCol: String, sortCols: Column*): DataFrame = {
    val ranged = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())

    // Window partitioned by __pid: shuffle-free after the range partitioning
    // (each pid is already one partition) and never single-partition.
    val localW = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val numbered = ranged.withColumn("__local_rn", row_number().over(localW))

    val counts = numbered.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // exclusive prefix sum: pid i's offset = rows in all lower pids
    var acc = 0L
    val offsetByPid = counts.map { case (pid, cnt) =>
      val off = acc; acc += cnt; (pid, off)
    }.toMap

    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsetByPid.toSeq.toDF("__pid2", "__offset"))

    numbered
      .join(offsetDf, col("__pid") === col("__pid2"))
      .withColumn(outCol, col("__offset") + col("__local_rn"))
      .drop("__pid", "__pid2", "__local_rn", "__offset")
  }
}
