package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle once at write time so repeated joins
  * and aggregations on the bucket key run with NO exchange at read time — the
  * standard layout for fact tables that are joined on the same key by every
  * query (at 100 TB, one saved shuffle per query pays for the bucketed write
  * immediately).
  *
  * Spark bucketing rides the session catalog (`saveAsTable`); both sides of a
  * join must be bucketed on the join key with compatible bucket counts and
  * `spark.sql.sources.bucketing.enabled` (default true).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Sorting within buckets
    * additionally enables exchange-AND-sort-free merge paths.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with matching layouts the
    * physical plan contains no ShuffleExchange for either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
