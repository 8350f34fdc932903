package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SnapshotDiffSpec extends AnyFunSuite with SparkTestSession {

  test("diff classifies added / removed / changed / unchanged correctly") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((1L, "a"), (3L, "c-modified"), (4L, "d")).toDF("doc_id", "text")
    val out = SnapshotDiff.diff(prev, cur, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "removed",
      3L -> "changed", 4L -> "added"))
  }

  test("normalized content column diffs up to canonical equivalence") {
    import spark.implicits._
    val prev = Seq((1L, "Hello, World!")).toDF("doc_id", "text")
    val cur = Seq((1L, "hello   world")).toDF("doc_id", "text")
    val raw = SnapshotDiff.diff(prev, cur, col("doc_id"), col("text"))
      .first().getString(1)
    val canon = SnapshotDiff.diff(prev, cur, col("doc_id"),
        graft.extensions.TextAnalysis.normalizeForDedup(col("text")))
      .first().getString(1)
    assert(raw == "changed" && canon == "unchanged")
  }
}
