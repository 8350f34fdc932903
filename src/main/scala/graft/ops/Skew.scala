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
}
