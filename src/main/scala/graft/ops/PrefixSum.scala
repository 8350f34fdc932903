package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed global prefix sum (the parallel scan primitive).
  *
  * A naive `sum().over(Window.orderBy(...))` collapses the table into ONE
  * partition — the same trap [[SeqNumber]] exists for. Parallel formulation:
  * range-repartition on the sort keys (distributed sort), one pass for
  * per-partition totals, `scanLeft` the (tiny, numPartitions-sized) totals on
  * the driver into per-partition offsets, then one pass emitting
  * `offset + running`. Two linear passes, no single-partition stage.
  *
  * Same instance-consistency argument as SeqNumber: both passes run over the
  * SAME materialized RDD (`df.rdd` once), so the range partitioner's sampled
  * boundaries cannot disagree between the totals job and the output job.
  *
  * Requires the sort keys to totally order the rows (unique) for a
  * deterministic result; `value` is read as LONG, and a NULL value
  * contributes 0 to the running sum (coalesced before the scan — a corpus
  * with a null weight must not die with an opaque NPE deep inside an RDD
  * task).
  */
object PrefixSum {

  /** Adds `outCol` = inclusive running sum of `value` in `sortCols` order. */
  def withGlobalCumsum(df: DataFrame, value: Column, outCol: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.withColumn("__v", coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd
    val vIdx = sorted.schema.fieldIndex("__v")
    val partTotals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _) // offsets(i) = total of partitions < i
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r => run += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ run) }
    }
    spark.createDataFrame(out,
        sorted.schema.add(StructField(outCol, LongType, nullable = false)))
      .drop("__v")
  }

  /** Per-STRATUM inclusive running sum of `value` in `sortCols` order — the
    * same two-pass parallel scan as [[withGlobalCumsum]], never a
    * per-stratum window (a hot stratum would buffer its whole partition in
    * one WindowExec task; here a stratum's rows stay spread across range
    * partitions and only its per-partition TOTALS meet on the driver).
    *
    * The driver state is one `(stratum → long)` map per partition — bounded
    * by partitions × distinct strata, the same enum-scale contract as
    * [[graft.extensions.Mixture]]'s group collect. Strata should be
    * enum-like (source, language, split); row-cardinality strata belong in
    * [[withGlobalCumsum]]'s sort key instead.
    *
    * `sortCols` must totally order rows WITHIN each stratum (the stratum
    * itself is prepended to the range-partitioning key, so one range
    * partition never splits a (stratum, sortCols) tie).
    *
    * Nulls: a NULL `value` contributes 0 (same coalesce as
    * [[withGlobalCumsum]]); NULL `stratum` rows form their own stratum under
    * a NUL (`\\u0000`) sentinel (a control character that is no real
    * source/language/split label) instead of relying on null map keys or NPE-ing
    * mid-task.
    */
  def withStratumCumsum(df: DataFrame, stratum: Column, value: Column,
      outCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.withColumn("__v", coalesce(value.cast("long"), lit(0L)))
      .withColumn("__s", coalesce(stratum.cast("string"), lit("\u0000")))
      .repartitionByRange((col("__s") +: sortCols): _*)
      .sortWithinPartitions((col("__s") +: sortCols): _*)
    val rdd = sorted.rdd
    val vIdx = sorted.schema.fieldIndex("__v")
    val sIdx = sorted.schema.fieldIndex("__s")
    val partTotals = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { r =>
        val s = r.getString(sIdx)
        m.update(s, m.getOrElse(s, 0L) + r.getLong(vIdx))
      }
      Iterator((i, m.toMap))
    }.collect().sortBy(_._1).map(_._2)
    // offsets(i)(s) = total of stratum s over partitions < i
    val offsets = partTotals.scanLeft(Map.empty[String, Long]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, 0L) + v) }
    }.init
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val base = bc.value(i)
      val run = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { r =>
        val s = r.getString(sIdx)
        val nv = run.getOrElse(s, base.getOrElse(s, 0L)) + r.getLong(vIdx)
        run.update(s, nv)
        Row.fromSeq(r.toSeq :+ nv)
      }
    }
    spark.createDataFrame(out,
        sorted.schema.add(StructField(outCol, LongType, nullable = false)))
      .drop("__v", "__s")
  }

  /** GPT-style stream packing: rows (chunks) are concatenated into one global
    * token stream in `sortCols` order and assigned to fixed `budget`-token
    * packs by their stream START position — the sequence-packing step between
    * a chunked corpus and training batches. Adds `stream_pos` (0-based start
    * offset of the row in the stream) and `pack_id` (= stream_pos / budget).
    */
  def packStream(chunks: DataFrame, nTokens: Column, budget: Int,
      sortCols: Column*): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    withGlobalCumsum(chunks.withColumn("__n", nTokens.cast("long")), col("__n"),
        "__cum", sortCols: _*)
      .withColumn("stream_pos", col("__cum") - col("__n"))
      .withColumn("pack_id", (col("stream_pos") / budget).cast("long"))
      .drop("__n", "__cum")
  }
}
