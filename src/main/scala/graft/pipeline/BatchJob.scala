package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** The flagship DAG (SURVEY §3.1): ingest → classify → group → enrich → footer →
  * results ∥ cost summary ∥ sinks — the reference's `process_job`
  * (/root/reference/worker.py:246-437) as one declarative Spark plan.
  */
object BatchJob {

  case class Sunk(results: DataFrame, costSummary: DataFrame, catalog: DataFrame)

  /** Run the pipeline over a real directory tree. */
  def fromDirectory(spark: SparkSession, inputDir: String, cfg: Enrich.JobConfig,
      groupBySubfolder: Boolean = true,
      clientFactory: () => Enrich.ModelClient = () => new Enrich.MockModelClient()): Sunk = {
    val files = Ingest.withPayload(Ingest.scanDirectory(spark, inputDir))
    // File-less top-level dirs are invisible to the file scan; in subfolder
    // mode the reference emits an "Empty folder" row for each — including
    // dirs whose only contents are (recursively) empty subdirs, since its
    // recursive file listing comes back [] (worker.py:23-39,299-304). Flat
    // mode ignores directories entirely (worker.py:40-48): no empty rows.
    val emptyDirs =
      if (!groupBySubfolder) Nil
      else Option(new java.io.File(inputDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && !hasAnyFile(f))
        .map(_.getName).toSeq
    run(files, cfg, groupBySubfolder, emptyDirs, clientFactory)
  }

  private def hasAnyFile(dir: java.io.File): Boolean =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .exists(c => c.isFile || (c.isDirectory && hasAnyFile(c)))

  /** Run the pipeline over any file relation (rel_path, file_size, content …). */
  def run(files: DataFrame, cfg: Enrich.JobConfig, groupBySubfolder: Boolean,
      emptyDirs: Seq[String] = Nil,
      clientFactory: () => Enrich.ModelClient = () => new Enrich.MockModelClient()): Sunk = {
    val groups = Grouping.withEmptyFolderGroups(
      Grouping.buildGroups(files, groupBySubfolder), emptyDirs)
    val results = Enrich.enrich(groups, clientFactory, cfg)
    Sunk(results, CostAgg.summarize(results), Ingest.inputCatalog(files))
  }

  /** Adapter: expose the synthetic `documents` table as a file tree
    * (`source/doc_<id>.txt` ← text), so the full pipeline runs against the
    * driver's parquet substrate (TESTDATA.md) with the same operators it runs
    * on real directories.
    */
  def documentsAsFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    Ingest.withPayload(Ingest.withFileColumns(
      docs.select(
        concat(col("source"), lit("/doc_"), col("doc_id"), lit(".txt")).as("rel_path"),
        col("n_chars").as("file_size"),
        encode(col("text"), "UTF-8").as("content"),
        lit(null).cast("timestamp").as("modified_ts"))))
  }

  /** The flagship query: documents → pipeline → enriched results joined with the
    * per-run cost columns; deterministic via MockModelClient.
    */
  def flagship(spark: SparkSession, sfDir: String, cfg: Enrich.JobConfig = Enrich.JobConfig()): DataFrame = {
    val files = documentsAsFiles(spark, sfDir)
    val groups = Grouping.buildGroups(files, groupBySubfolder = true)
    Enrich.enrich(groups, () => new Enrich.MockModelClient(), cfg)
  }
}
