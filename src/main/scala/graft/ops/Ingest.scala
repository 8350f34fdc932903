package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources S1–S8 (SURVEY.md §2.1) over Spark's `binaryFile` datasource.
  *
  * One recursive binary scan feeds everything downstream (catalog, grouping,
  * text decode, image data-URLs, hashing) — the reference walks the tree once
  * per concern (/root/reference/worker.py:15-21,52-67,77-94); here Catalyst
  * shares the scan and prunes columns (`content` is only read by plans that
  * use it, thanks to parquet-style column pruning in the binaryFile reader).
  */
object Ingest {

  /** Supported extensions (/root/reference/worker.py:9-10). */
  val TextExts: Seq[String] = Seq(".txt", ".md")
  val ImageExts: Seq[String] = Seq(".jpg", ".jpeg", ".png", ".tif", ".tiff")

  /** S1+S3+S4 — recursive scan of a directory into the engine's file relation:
    * `(rel_path, file_name, file_type, file_size, content, modified_ts, kind)`.
    * `kind` ∈ text|image|null implements the P1 extension classifier.
    */
  def scanDirectory(spark: SparkSession, dir: String): DataFrame =
    fromBinaryRelation(
      spark.read.format("binaryFile").option("recursiveFileLookup", "true").load(dir),
      dir)

  /** Raw binaryFile relation (`path, length, content, modificationTime`) →
    * the engine's file relation. Shared by the batch scan and the streaming
    * file source so path normalization has exactly one implementation.
    */
  def fromBinaryRelation(raw: DataFrame, dir: String): DataFrame = {
    val base = new java.io.File(dir).toURI.toString // "file:/abs/dir/"
    withFileColumns(raw
      .withColumn("rel_path", Scalars.normalizeRelPath(
        regexp_replace(col("path"), java.util.regex.Pattern.quote(base), "")))
      .select(col("rel_path"), col("length").as("file_size"),
        col("content"), col("modificationTime").as("modified_ts")))
  }

  /** Derives name/type/kind columns for any relation carrying `rel_path`. */
  def withFileColumns(files: DataFrame): DataFrame =
    files
      .withColumn("file_name", Scalars.baseName(col("rel_path")))
      .withColumn("file_type", Scalars.fileExtension(col("file_name")))
      .withColumn("kind",
        when(col("file_type").isin(TextExts: _*), "text")
          .when(col("file_type").isin(ImageExts: _*), "image")
          .otherwise(lit(null).cast("string")))

  /** S5 — the `input.csv` catalog (/root/reference/worker.py:52-67):
    * `(file_name, full_path, file_type, file_size)` sorted by full_path;
    * catalog rows keep "unknown" for extension-less files.
    */
  def inputCatalog(files: DataFrame): DataFrame =
    files.select(
      col("file_name"),
      concat(lit("input/"), col("rel_path")).as("full_path"),
      col("file_type"),
      col("file_size"))
      .orderBy("full_path")

  /** S3/S4 — per-file prompt payload: UTF-8 text for text files, data-URL for
    * images (/root/reference/worker.py:77-94). Non-supported kinds → null.
    */
  def withPayload(files: DataFrame): DataFrame =
    files.withColumn("payload",
      when(col("kind") === "text", decode(col("content"), "UTF-8"))
        .when(col("kind") === "image",
          Scalars.dataUrl(Scalars.mimeFromExtension(col("file_type")), col("content"))))

  /** S6 — flat *.zip listing with size + mtime, newest first
    * (/root/reference/app.py:493-518). Driver-side nio listing: this is a
    * metadata-sized store index, not a data scan.
    */
  def listZips(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = new java.io.File(dir)
    val rows = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.toLowerCase.endsWith(".zip"))
      .map(f => (f.getName, f.length(), new java.sql.Timestamp(f.lastModified())))
      .toSeq
    rows.toDF("name", "size_bytes", "modified_ts")
      .withColumn("size_label", Scalars.formatFileSize(col("size_bytes")))
      .orderBy(col("modified_ts").desc, col("name"))
  }

  /** S7 — subfolder listing with child counts, excluding hidden names
    * (/root/reference/app.py:537-563).
    */
  def listFolders(spark: SparkSession, dir: String, hidden: Set[String] = Set("results")): DataFrame = {
    import spark.implicits._
    val d = new java.io.File(dir)
    val rows = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !hidden.contains(f.getName))
      .map(f => (f.getName, Option(f.list()).map(_.length).getOrElse(0),
        new java.sql.Timestamp(f.lastModified())))
      .toSeq
    rows.toDF("name", "n_items", "modified_ts")
      .withColumn("items_label", Scalars.pluralizeItems(col("n_items")))
      .orderBy(col("modified_ts").desc, col("name"))
  }

  /** S8 — schema-tolerant JSON document read (meta.json / registry shape,
    * /root/reference/app.py:148-169): PERMISSIVE + explicit schema keeps corrupt
    * or legacy files from failing the job, mirroring the reference's swallow-
    * and-default behavior.
    */
  def readJsonDoc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE")
      .option("multiLine", "true").json(path)
}
