package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.extensions.Quantize

/** Streaming IVF-SQ8 scoring monitor — the ingest-time twin of the batch
  * [[graft.extensions.Similarity.ivfSq8TopK]] (round-15 verdict ask #7):
  * the round-15 at-scale measurements picked SQ8 as the compression point
  * that HOLDS recall at honest density (0.74/0.69 at sf1/sf3 vs the PQ
  * family's 0.22–0.35), so the recall-critical index for a 100 TB ingest
  * deserves the same streaming story [[StreamingIvfPq]] gives the 32×
  * compression point. A FIXED offline-fitted model (coarse cells + the
  * per-dimension SQ8 min/max stats) and a BOUNDED set of monitor queries
  * watch an unbounded corpus-vector stream, maintaining per query the
  * running asymmetric-distance top-k.
  *
  * PARITY CONTRACT vs batch (strict, the [[StreamingIvfPq]] stance): each
  * arriving vector's cell, uint8 codes, and per-query rounded asymmetric
  * distance ‖q − dequant(codes)‖² come from the SAME in-plan expressions
  * as the batch operator ([[Quantize.quantize]]/[[Quantize.dequantize]] +
  * the NearestCells argmin), and the per-query fold keeps the k best
  * (dist2_est asc, id asc) — order- and batching-invariant, re-delivery
  * idempotent. On any stream prefix the monitor state EQUALS
  * `ivfSq8TopK(queries, prefix, k, cells, nProbe, mins, maxs)` for every
  * monitor query (modulo the batch op's extra `cell` column).
  *
  * Plan shape per micro-batch: cell assignment and SQ8 encoding are a
  * narrow map over in-plan literals (zero joins, zero shuffle on the
  * stream side); the query side — nProbe rows per monitor query with the
  * full-precision vector (asymmetric SQ-ADC: only the CORPUS is coded) —
  * is a static bounded relation broadcast into a stream-static equi-join
  * ON CELL; only the |queries|-keyed top-k state shuffles, ≤ k (dist, id)
  * pairs + one counter per query. A dimension-mismatched vector raises
  * in-plan (the round-15 [[Quantize.quantize]] guard — batch parity, not
  * a silent drop); NULL ids and NULL/empty vectors drop before scoring.
  */
object StreamingIvfSq8 {

  import StreamingIvfPq.{AnnRow, AnnState, Cand, insert}

  def ivfSq8Stream(events: DataFrame, id: Column, vec: Column,
      queries: DataFrame, k: Int, cells: Seq[Seq[Double]], nProbe: Int,
      mins: Array[Double], maxs: Array[Double]): Dataset[AnnRow] = {
    require(k >= 1 && k <= 10000, s"k must be in [1,1e4], got $k")
    require(cells.nonEmpty, "ivfSq8Stream needs coarse cells")
    require(nProbe >= 1 && nProbe <= cells.size,
      s"nProbe must be in [1,${cells.size}], got $nProbe")
    require(mins.length == maxs.length && mins.nonEmpty,
      "mins/maxs must be equal-length and non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    // query side: full-precision probe vectors, one row per probed cell
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("__qv"))
      .withColumn("cell", explode(
        graft.functions.NearestCells.nearestCells(col("__qv"), cells,
          nProbe)))
    // stream side: the batch encode expressions verbatim — scan-local cell
    // argmin + SQ8 codes, both from in-plan literals
    val enc = Quantize.quantize(
      events.filter(id.isNotNull && vec.isNotNull && size(vec) > 0)
        .select(id.cast("long").as("neighbor_id"),
          vec.cast("array<double>").as("__v")),
      col("__v"), mins, maxs)
      .select(col("neighbor_id"),
        element_at(graft.functions.NearestCells.nearestCells(col("__v"),
          cells, 1), 1).as("cell"),
        col("codes"))
    val vhat = Quantize.dequantize(col("codes"), mins, maxs)
    val cands = enc.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        round(aggregate(
          zip_with(col("__qv"), vhat, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d), 6).as("dist2_est"))
      .as[Cand]
    cands.groupByKey(_.query_id)
      .flatMapGroupsWithState[AnnState, AnnRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (qid: Long, it: Iterator[Cand], state: GroupState[AnnState]) =>
          var st = state.getOption.getOrElse(
            AnnState(Array.emptyDoubleArray, Array.emptyLongArray, 0L))
          it.foreach { c =>
            st = insert(st, c.dist2_est, c.neighbor_id, k).copy(n = st.n + 1)
          }
          state.update(st)
          Iterator.single(AnnRow(qid, st.n, st.ids, st.ds))
      }
  }
}
