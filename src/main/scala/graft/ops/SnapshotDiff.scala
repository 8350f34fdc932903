package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the first question every incremental pipeline run
  * asks: against the previous version of an id-keyed corpus, which documents
  * are `added`, `removed`, `changed`, `unchanged`? The answer drives
  * everything downstream (re-embed only `added`+`changed`, retire registry
  * entries for `removed`, skip the rest) — contrast [[graft.extensions.IncrementalDedup]],
  * which answers the different question "which NEW docs duplicate the
  * corpus".
  *
  * Comparison is by content sha256, so `changed` means the bytes changed,
  * not the row moved; pass an already-normalized column (e.g.
  * [[graft.extensions.TextAnalysis.normalizeForDedup]]) to diff up to
  * canonical equivalence instead.
  *
  * Scale shape: both sides reduce to (id, 64-hex sha) projections in their
  * scans — document bytes never reach the join — and meet in ONE
  * shuffle_hash full-outer equi-join on the id (hinted: the projections sit
  * behind scans Spark would otherwise sort-merge at corpus scale). Output is
  * one row per id in either snapshot.
  */
object SnapshotDiff {

  def diff(previous: DataFrame, current: DataFrame, id: Column,
      content: Column): DataFrame = {
    val p = previous.select(id.as("id"), sha2(content, 256).as("sha_old"))
    val c = current.select(id.as("id"), sha2(content, 256).as("sha_new"))
    p.join(c.hint("shuffle_hash"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("sha_old").isNull, "added")
          .when(col("sha_new").isNull, "removed")
          .when(col("sha_old") === col("sha_new"), "unchanged")
          .otherwise("changed").as("status"),
        col("sha_old"), col("sha_new"))
  }
}
