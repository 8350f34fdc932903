package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed global row numbering.
  *
  * The reference's row order is Python list order (SURVEY §7.4.3); the engine makes
  * it an explicit `seq` column. A naive `row_number().over(Window.orderBy(...))`
  * collapses the whole table into ONE partition — fine at test scale, fatal at
  * 100 TB. This is the parallel formulation: range-repartition on the sort keys
  * (distributed sort), then `zipWithIndex` over the materialized RDD.
  *
  * Why `.rdd.zipWithIndex` and not a two-job count-then-offset DataFrame plan:
  * the range partitioner's boundaries come from SAMPLING, re-drawn on every
  * DataFrame execution — a counts job and an output job run as separate
  * executions can disagree about which side of a boundary a row lands on,
  * silently duplicating/skipping seq values. `df.rdd` instantiates the
  * physical RDD (and its RangePartitioner) exactly once; zipWithIndex's
  * internal size pass and every downstream action share that instance, so the
  * numbering is consistent by construction.
  *
  * Requires the sort keys to be a total order (unique) for a deterministic result.
  * `seq` is 1-based (the reference enumerates from 1, worker.py:227).
  */
object SeqNumber {

  def withGlobalSeq(df: DataFrame, outCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed,
      sorted.schema.add(StructField(outCol, LongType, nullable = false)))
  }
}
