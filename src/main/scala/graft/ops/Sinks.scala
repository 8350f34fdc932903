package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** K1–K7 — result sinks (/root/reference/worker.py:220-236,373-437).
  *
  * The reference's artifacts are single files (one CSV, one JSON array, one txt
  * per group): per SURVEY §7.4.4 results are group-cardinality (small even when
  * inputs are 100 TB), so single-file semantics use coalesce(1)+rename or a
  * driver-side collect — the heavy data path upstream stays distributed.
  */
object Sinks {

  /** K1 — CSV with header, exactly one file at `path` (worker.py:374-384).
    * The reference re-sorts CSV rows by group id (worker.py:383); callers pass
    * the ordering column(s).
    */
  def writeCsvSingle(df: DataFrame, path: String, orderBy: Seq[String]): Unit = {
    val ordered = if (orderBy.nonEmpty) df.orderBy(orderBy.map(col): _*) else df
    val tmp = path + ".tmpdir"
    ordered.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    promoteSingleFile(tmp, path, ".csv")
  }

  /** K2 — pretty JSON array-of-objects, one file (worker.py:376-378). Spark's
    * native JSON sink is NDJSON; the array+indent shape is sink-time
    * serialization of the (small) result table, driver-side by design.
    */
  def writeJsonArray(df: DataFrame, path: String, orderBy: Seq[String]): Unit = {
    val ordered = if (orderBy.nonEmpty) df.orderBy(orderBy.map(col): _*) else df
    val rows = ordered.toJSON.collect()
    val body = rows.mkString("[\n  ", ",\n  ", "\n]")
    ZipUtil.atomicWrite(path, body)
  }

  /** K3 — one text file per result row (worker.py:386-400); naming from
    * `_output_filename` (worker.py:178-184): folder group `base/` →
    * `base_folder_output.txt`, file group `name.ext` → `name.txt`.
    * foreachPartition keeps the write distributed (local-fs semantics in
    * local mode; a shared filesystem on a cluster).
    */
  def writePerGroupText(results: DataFrame, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val named = results.withColumn("__fname", outputFilename(col("group_id"), col("is_folder")))
    named.select("__fname", "output").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          Files.writeString(Paths.get(dir, r.getString(0)), r.getString(1))
        }
    }
  }

  /** Naming rule as a column (worker.py:178-184). */
  def outputFilename(groupId: org.apache.spark.sql.Column, isFolder: org.apache.spark.sql.Column) =
    when(isFolder,
      concat(regexp_replace(groupId, "/$", ""), lit("_folder_output.txt")))
      .otherwise(concat(Scalars.stemName(groupId), lit(".txt")))

  /** K4 — concatenated results with sequence renumber (worker.py:220-236):
    * row i's occurrences of "000000001" become zfill(i,9), rows joined by \n in
    * seq order. Returns the concatenated string (callers atomically write it,
    * stamped `results_yyyyMMdd_HHmmss.txt` by the reference).
    */
  def concatenatedResults(results: DataFrame): String = {
    // Results are group-cardinality; the renumber index is over their global seq
    // order. seq is already dense from Grouping, so reuse it instead of a new
    // single-partition window.
    val renumbered = results
      .withColumn("__line", Scalars.renumberToken(col("output"), col("seq")))
      .orderBy("seq")
      .select("__line")
    renumbered.collect().map(_.getString(0)).mkString("\n")
  }

  /** K4 sink form: same renumbered concatenation, streamed straight to `path`
    * (atomic temp-file + rename). Bounded driver memory: `toLocalIterator`
    * holds at most ONE partition of lines at a time, so a pathological
    * million-group job degrades to sequential partition fetches instead of
    * materializing the whole artifact driver-side the way the String form
    * must.
    */
  def writeConcatenatedResults(results: DataFrame, path: String): Unit = {
    val renumbered = results
      .withColumn("__line", Scalars.renumberToken(col("output"), col("seq")))
      .orderBy("seq")
      .select("__line")
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(
      Option(target.getParent).getOrElse(Paths.get(".")), ".tmp-", null)
    val w = Files.newBufferedWriter(tmp)
    try {
      var first = true
      renumbered.toLocalIterator().forEachRemaining { r =>
        if (!first) w.write("\n")
        w.write(r.getString(0))
        first = false
      }
    } finally w.close()
    Files.move(tmp, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** K7 — meta document sink with redaction (app.py:444-452): the api_key never
    * reaches disk; only its last 8 chars do.
    */
  def writeMetaRedacted(meta: DataFrame, path: String): Unit = {
    val redacted =
      if (meta.columns.contains("api_key"))
        meta.withColumn("api_key_last8", Scalars.last8(col("api_key"))).drop("api_key")
      else meta
    val rows = redacted.toJSON.collect()
    ZipUtil.atomicWrite(path, if (rows.length == 1) rows.head else rows.mkString("[", ",", "]"))
  }

  private def promoteSingleFile(tmpDir: String, target: String, ext: String): Unit = {
    val dir = Paths.get(tmpDir)
    val listing = Files.list(dir) // must be closed — each leaks an fd otherwise
    val found =
      try {
        scala.jdk.CollectionConverters.IteratorHasAsScala(listing.iterator()).asScala
          .find(p => p.getFileName.toString.startsWith("part-") && p.getFileName.toString.endsWith(ext))
          .getOrElse(throw new IllegalStateException(s"no part file in $tmpDir"))
      } finally listing.close()
    Files.createDirectories(Paths.get(target).toAbsolutePath.getParent)
    Files.move(found, Paths.get(target), java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ZipUtil.deleteRecursively(dir)
  }
}
