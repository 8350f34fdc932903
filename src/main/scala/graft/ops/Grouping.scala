package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1 — the engine's core repartitioning op: file rows → prompt groups
  * (`_build_groups`, /root/reference/worker.py:23-50).
  *
  * Semantics (subfolder mode): each top-level subfolder becomes one group with
  * id `"name/"` holding its recursive files in sorted-relpath order; each
  * top-level file is its own single-file group. Flat mode: only top-level files,
  * one group each (subfolders ignored entirely).
  *
  * In Spark this is a hash aggregation with an ordered list-agg — it shuffles
  * once on the group key, which is exactly the partitioning the enrichment
  * stage wants (each group is processed whole on one executor).
  */
object Grouping {

  /** files: relation from [[Ingest.scanDirectory]] (needs rel_path, file_name,
    * file_type, file_size, kind, payload). Returns
    * `(seq, group_id, is_folder, n_files, n_supported, files ARRAY<STRUCT>)`
    * with `seq` a dense global order over sorted group_id (SURVEY §7.4.3).
    *
    * `nSalts > 1` switches the list-agg to the two-phase salted form (see
    * [[Skew.saltedOrderedListAgg]]): per-(group, salt) sorted sublists, then
    * flatten + re-sort — same result (rel_path is a total order within a
    * group), but a folder with millions of files builds its array across
    * nSalts tasks instead of materializing wholly in one. Default stays
    * single-phase: one fewer shuffle, right for group sizes that fit a task.
    */
  def buildGroups(files: DataFrame, groupBySubfolder: Boolean,
      nSalts: Int = 1): DataFrame = {
    val depth = size(split(col("rel_path"), "/"))
    val top = element_at(split(col("rel_path"), "/"), 1)

    val keyed =
      if (groupBySubfolder)
        files
          .withColumn("group_id",
            when(depth > 1, concat(top, lit("/"))).otherwise(col("rel_path")))
          .withColumn("is_folder", depth > 1)
      else
        files.filter(depth === 1)
          .withColumn("group_id", col("rel_path"))
          .withColumn("is_folder", lit(false))

    val fileStruct = struct(
      col("rel_path"), col("file_name"), col("file_type"),
      col("file_size"), col("kind"), col("payload"))

    val grouped =
      if (nSalts <= 1)
        keyed
          .groupBy(col("group_id"), col("is_folder"))
          .agg(
            count(lit(1)).as("n_files"),
            count(col("kind")).as("n_supported"),
            sort_array(collect_list(fileStruct)).as("files"))
      else
        keyed
          .withColumn("__salt", pmod(xxhash64(col("rel_path")), lit(nSalts)).cast("int"))
          .groupBy(col("group_id"), col("is_folder"), col("__salt"))
          .agg(
            count(lit(1)).as("__n"),
            count(col("kind")).as("__ns"),
            sort_array(collect_list(fileStruct)).as("__sub"))
          .groupBy(col("group_id"), col("is_folder"))
          .agg(
            sum(col("__n")).as("n_files"),
            sum(col("__ns")).as("n_supported"),
            sort_array(flatten(collect_list(col("__sub")))).as("files"))

    SeqNumber.withGlobalSeq(grouped, "seq", col("group_id"))
  }

  /** Re-adds groups for top-level folders the file scan can't see because they
    * are empty — the reference emits an "Empty folder" result row for them
    * (/root/reference/worker.py:299-304). `emptyDirs` comes from a driver-side
    * listing (metadata-sized).
    */
  def withEmptyFolderGroups(groups: DataFrame, emptyDirs: Seq[String]): DataFrame = {
    if (emptyDirs.isEmpty) return groups
    val spark = groups.sparkSession
    import spark.implicits._
    val empties = emptyDirs.map(d => if (d.endsWith("/")) d else d + "/").toDF("group_id")
      .withColumn("is_folder", lit(true))
      .withColumn("n_files", lit(0L))
      .withColumn("n_supported", lit(0L))
      .withColumn("files", lit(null).cast(groups.schema("files").dataType))
      .join(groups.select("group_id"), Seq("group_id"), "left_anti")
    val unioned = groups.drop("seq").unionByName(empties)
    SeqNumber.withGlobalSeq(unioned, "seq", col("group_id"))
  }
}
