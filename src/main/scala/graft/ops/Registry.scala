package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** J1/J2 — the content-addressed dedup registry (/root/reference/app.py:148-270).
  *
  * The reference keeps a JSON list of entries and probes it with an OR of two
  * equality keys — `content_sha256` (what the bytes are) or `zip_sha256` (what
  * the archive file is), first match wins (app.py:191-203). An OR-of-equi-keys
  * predicate would force a nested-loop join, so at scale this is two broadcast
  * equi-joins (the registry is a metadata-sized index) unioned with first-match
  * priority; `insert-if-absent` is the complementary anti join.
  */
object Registry {

  /** Candidates that are NOT yet registered (insert-if-absent set,
    * app.py:279-298): anti join on content hash, then anti join on zip hash.
    */
  def newEntries(candidates: DataFrame, registry: DataFrame): DataFrame = {
    val reg = broadcast(registry)
    candidates
      .join(reg.select(col("content_sha256").as("__k1")),
        col("content_sha256") === col("__k1"), "left_anti")
      .join(reg.select(col("zip_sha256").as("__k2")),
        col("zip_sha256") === col("__k2"), "left_anti")
  }

  /** First matching registry entry per candidate (content hash preferred, then
    * zip hash — mirrors the reference's list scan where both keys of one entry
    * are checked together, app.py:191-203). Null registry columns ⇒ no match.
    */
  def findMatches(candidates: DataFrame, registry: DataFrame): DataFrame = {
    val regC = broadcast(registry.select(col("content_sha256").as("__ck"),
      col("zip_name").as("match_by_content")))
    val regZ = broadcast(registry.select(col("zip_sha256").as("__zk"),
      col("zip_name").as("match_by_zip")))
    candidates
      .join(regC, col("content_sha256") === col("__ck"), "left")
      .join(regZ, col("zip_sha256") === col("__zk"), "left")
      .withColumn("matched_zip_name", coalesce(col("match_by_content"), col("match_by_zip")))
      .drop("__ck", "__zk", "match_by_content", "match_by_zip")
  }

  /** Registers candidates, keeping the registry idempotent: re-registering an
    * already-present content hash adds no entry (app.py:279-281). Within the
    * incoming batch, first-by-created_at wins per content hash.
    */
  def register(registry: DataFrame, candidates: DataFrame): DataFrame = {
    val fresh = newEntries(candidates, registry)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_sha256"))
          .orderBy(col("created_at"), col("zip_name"))))
      .filter(col("__rn") === 1).drop("__rn")
    registry.unionByName(fresh.select(registry.columns.map(col): _*))
  }
}
