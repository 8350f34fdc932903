package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities — for when AQE's runtime skew handling isn't
  * available (non-shuffle-join paths) or a hot key is known up front.
  *
  * Both ops are semantics-preserving rewrites of their skewed originals:
  * `saltedJoin` = inner equi-join, `saltedOrderedListAgg` = `sort_array ∘
  * collect_list` — verified by equivalence tests. The price is controlled
  * duplication (small side ×nSalts) or an extra partial-agg level; the win is
  * a hot key spreading over nSalts tasks instead of pinning one.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, with the large side's hot keys
    * spread across `nSalts` shuffle partitions. The salt is derived
    * deterministically from `saltFrom` (any column(s) roughly unique per large
    * row — a row id, a path), NOT from rand(): task retries must re-derive
    * identical salts or shuffle replays double-count rows.
    * The small side is replicated nSalts× (explode) — keep nSalts modest
    * (8–64) and the small side genuinely small.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, nSalts: Int = 16): DataFrame = {
    require(nSalts >= 1)
    val l = large.withColumn("__salt", pmod(xxhash64(saltFrom), lit(nSalts)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase ordered list aggregation: the scale path for the engine's core
    * grouping op (A1, SURVEY §2.3) when one group is huge (a folder with
    * millions of files). Phase 1 builds per-(key, salt) sorted sublists;
    * phase 2 concatenates the sublists and re-sorts — identical result to
    * `groupBy(key).agg(sort_array(collect_list(elem)))` because sort_array is
    * a total order on `elem` (make its first struct field the sort key).
    *
    * A single collect_list over a hot key materializes the whole group in one
    * task's memory; the salted form caps phase-1 state at |group|/nSalts and
    * phase 2 merges nSalts pre-sorted arrays.
    */
  def saltedOrderedListAgg(df: DataFrame, key: Column, elem: Column,
      saltFrom: Column, nSalts: Int = 16, outCol: String = "items"): DataFrame = {
    require(nSalts >= 1)
    df.select(key.as("__key"), elem.as("__elem"),
        pmod(xxhash64(saltFrom), lit(nSalts)).cast("int").as("__salt"))
      .groupBy(col("__key"), col("__salt"))
      .agg(sort_array(collect_list(col("__elem"))).as("__sub"))
      .groupBy(col("__key"))
      .agg(sort_array(flatten(collect_list(col("__sub")))).as(outCol))
      .withColumnRenamed("__key", "key")
  }

  /** Two-phase salted top-k per key, adding a 1-based `rank` column: the
    * scale path for per-key caps (top-N docs per domain/source, top-k tokens
    * per language) when keys are LOW-cardinality — a direct per-key rank
    * window would sort each key's entire population in one task. Phase 1
    * ranks within (key, salt): any global per-key top-k row is necessarily a
    * per-salt top-k row, so phase 2's window ranks ≤ k·nSalts candidate rows
    * per key, never the population. Identical output to a single
    * `row_number().over(partitionBy(key).orderBy(order)) <= k` filter —
    * `order` must totally order rows within a key (include a unique
    * tie-break) or ranks are partitioning-dependent.
    */
  def saltedTopKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      saltFrom: Column, k: Int, nSalts: Int = 32): DataFrame = {
    require(k >= 1 && nSalts >= 1)
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(nSalts)).cast("int"))
    val wPartial = Window.partitionBy(keys :+ col("__salt"): _*).orderBy(order: _*)
    val candidates = salted.withColumn("__r", row_number().over(wPartial))
      .filter(col("__r") <= k).drop("__r", "__salt")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    candidates.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
