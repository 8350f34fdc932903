package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming IVF-PQ scoring monitor — the ingest-time twin of the batch
  * [[graft.extensions.Similarity.ivfPqTopK]], completing the ANN stack's
  * streaming story: a FIXED offline-fitted index model (coarse cells +
  * PQ codebooks) and a BOUNDED set of monitor queries watch an unbounded
  * stream of corpus vectors, maintaining per query the running ADC top-k —
  * the "is fresh data drifting away from / crowding my probes?" monitor a
  * training-data pipeline runs while a corpus ingests.
  *
  * PARITY CONTRACT vs batch (the [[StreamingBottomK]] stance — strict, not
  * enveloped): each arriving vector's cell, codes, and per-query rounded
  * ADC distance are computed by the SAME in-plan expressions as the batch
  * operator, and the per-query top-k fold keeps the k best
  * (dist2_est asc, id asc) — an order- and batching-invariant, re-delivery
  * idempotent fold. On any stream prefix the monitor state therefore
  * EQUALS `ivfPqTopK(queries, prefix, k, cells, nProbe, codebooks)` for
  * every monitor query (modulo the batch op's extra `cell` column).
  *
  * Plan shape per micro-batch: cell assignment and PQ encoding are argmins
  * over in-plan literals (the codegen'd NearestCells expression — zero
  * joins, zero shuffle); the query side — nProbe rows per monitor query,
  * each carrying its m×k ADC table — is a STATIC bounded relation
  * broadcast into a stream-static equi-join ON CELL (the
  * [[StreamingClassify]] broadcast-model shape, never a cross product);
  * only the |queries|-keyed top-k state shuffles, ≤ k (dist, id) pairs +
  * one counter per query — absolutely bounded, no timeout, no watermark.
  *
  * Vectors with a NULL id or NULL/empty vector are dropped before scoring
  * (an unscoreable vector has no ADC distance; the batch scan's cast/argmin
  * would equally never rank it). `n_cands` counts the candidates that
  * reached each query's fold (its probed-cell hits), so consumers can tell
  * "no update" from "updates that didn't qualify"; keep the newest stamp
  * per query (largest n_cands, the family convention).
  */
object StreamingIvfPq {

  /** One emission: monitor query, candidates folded so far, current top-k
    * neighbor ids + rounded ADC distances in rank order (best first).
    */
  case class AnnRow(query_id: Long, n_cands: Long, neighbor_ids: Array[Long],
      dist2s: Array[Double])

  /** Internal candidate row (public: Catalyst codegen instantiates it). */
  case class Cand(query_id: Long, neighbor_id: Long, dist2_est: Double)

  /** Parallel-array top-k state sorted by (dist2 asc, id asc) + counter. */
  case class AnnState(ds: Array[Double], ids: Array[Long], n: Long)

  /** Rank order: smaller distance first, ties by neighbor id ascending. */
  private[streaming] def beats(d1: Double, id1: Long, d2: Double,
      id2: Long): Boolean =
    d1 < d2 || (d1 == d2 && id1 < id2)

  /** Insert (d, id) into the rank-sorted top-k if it qualifies. The dup
    * lookup runs FIRST (the round-12 StreamingWeightedSample advisory
    * applied from the start): a re-delivered id is a no-op when its
    * distance matches and a re-score (stale entry dropped, new distance
    * re-ranked) when it doesn't — deterministic vectors make the re-score
    * path unreachable in practice, but the fold stays total.
    */
  private[streaming] def insert(st: AnnState, d: Double, id: Long,
      k: Int): AnnState = {
    val dup = st.ids.indexOf(id)
    if (dup >= 0 && st.ds(dup) == d) return st
    val (ds0, ids0) =
      if (dup < 0) (st.ds, st.ids)
      else (st.ds.patch(dup, Nil, 1), st.ids.patch(dup, Nil, 1))
    var j = 0
    while (j < ds0.length && !beats(d, id, ds0(j), ids0(j))) j += 1
    if (ds0.length >= k && j >= k) return AnnState(ds0, ids0, st.n)
    val outLen = math.min(ds0.length + 1, k)
    AnnState(
      (ds0.take(j) :+ d) ++ ds0.drop(j) take outLen,
      (ids0.take(j) :+ id) ++ ids0.drop(j) take outLen,
      st.n)
  }

  def ivfPqStream(events: DataFrame, id: Column, vec: Column,
      queries: DataFrame, k: Int, cells: Seq[Seq[Double]], nProbe: Int,
      codebooks: Seq[Seq[Seq[Double]]]): Dataset[AnnRow] = {
    require(k >= 1 && k <= 10000, s"k must be in [1,1e4], got $k")
    require(cells.nonEmpty, "ivfPqStream needs coarse cells")
    require(nProbe >= 1 && nProbe <= cells.size,
      s"nProbe must be in [1,${cells.size}], got $nProbe")
    require(codebooks.nonEmpty, "ivfPqStream needs codebooks")
    val spark = events.sparkSession
    import spark.implicits._
    val m = codebooks.size
    val sub = codebooks.head.head.size
    val booksLit = typedLit(codebooks)
    // query side: identical table arithmetic to the batch operator —
    // tables(j)(c) = ||q_j - codebook_j(c)||², one row per probed cell
    val qv = col("__qv")
    val tables = transform(booksLit, (book, j) =>
      transform(book, cvec => aggregate(
        zip_with(slice(qv, j * lit(sub) + 1, lit(sub)), cvec,
          (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, d) => acc + d)))
    val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("__qv"))
      .withColumn("__tbl", tables)
      .withColumn("cell", explode(
        graft.functions.NearestCells.nearestCells(col("__qv"), cells, nProbe)))
      .drop("__qv")
    // stream side: scan-local cell + codes from in-plan literals (the batch
    // encode expressions verbatim)
    val enc = events
      .filter(id.isNotNull && vec.isNotNull && size(vec) > 0)
      .select(id.cast("long").as("neighbor_id"),
        vec.cast("array<double>").as("__v"))
      .select(col("neighbor_id"),
        element_at(graft.functions.NearestCells.nearestCells(col("__v"),
          cells, 1), 1).as("cell"),
        array(codebooks.zipWithIndex.map { case (book, j) =>
          element_at(graft.functions.NearestCells.nearestCells(
            slice(col("__v"), j * sub + 1, sub), book, 1), 1)
        }: _*).as("codes"))
    val dist = (0 until m).map(j =>
      element_at(element_at(col("__tbl"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val cands = enc.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        round(dist, 6).as("dist2_est"))
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
