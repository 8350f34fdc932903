package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.RegistryEntry
import graft.ops._

/** The reference's full job lifecycle (SURVEY §3.1,
  * /root/reference/app.py:642-656 + worker.py:246-437) as one driver-side
  * orchestration over the distributed operators:
  *
  *   prepare (zip → content-hash → registry dedup → extract)
  *   → BatchJob (ingest → group → enrich → cost rollup)
  *   → sinks (csv/json/text/concat per flags) → deterministic results zip
  *   → redacted meta.
  *
  * Everything filesystem-shaped (zips, meta documents, the registry index) is
  * deliberately driver-side metadata work; the data path in between is the
  * distributed DAG.
  */
object JobRunner {

  case class JobSpec(
      jobId: String,
      cfg: Enrich.JobConfig = Enrich.JobConfig(),
      groupBySubfolder: Boolean = true,
      outputFormats: Set[String] = Set("text", "csv", "json"), // app.py:746-758
      saveConcatResults: Boolean = false,
      includeMetadata: Boolean = true,
      apiKey: String = "")

  case class JobResult(
      results: DataFrame,
      costSummary: DataFrame,
      resultsZip: String)

  /** F11 — storage name for an ingested archive
    * (/root/reference/app.py:205-225): sanitized stem capped at 80 chars,
    * 12-hex content-hash suffix, `_2`/`_3`… on collision, forced `.zip`.
    */
  def storageZipName(rawName: String, contentSha256: String, existing: Set[String]): String = {
    val base = rawName.replace('\\', '/').split('/').last
    val noExt = if (base.toLowerCase.endsWith(".zip")) base.dropRight(4) else base
    val sanitized = noExt.replaceAll("[^A-Za-z0-9_.-]+", "_")
      .replaceAll("^[._-]+", "").replaceAll("[._-]+$", "")
    val stem = (if (sanitized.isEmpty) "input" else sanitized).take(80) // app.py:209
    val candidate = s"${stem}_${contentSha256.take(12)}"
    val name = Iterator.from(1)
      .map(i => if (i == 1) s"$candidate.zip" else s"${candidate}_$i.zip")
      .find(!existing.contains(_)).get
    name
  }

  /** Registry document I/O (S8/K8, /root/reference/app.py:148-177): JSON with
    * schema-tolerant read — corrupt/missing → empty registry, mirroring the
    * reference's swallow-and-default.
    */
  def loadRegistry(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[RegistryEntry].toDF()
    if (!Files.exists(Paths.get(path))) empty
    else
      try {
        val df = Ingest.readJsonDoc(spark, path, empty.schema)
        if (df.columns.sameElements(empty.columns)) df.na.drop("all") else empty
      } catch { case _: Exception => empty }
  }

  def saveRegistry(registry: DataFrame, path: String): Unit = {
    val rows = registry.orderBy("created_at", "zip_name").toJSON.collect()
    ZipUtil.atomicWrite(path, rows.mkString("[\n  ", ",\n  ", "\n]"))
  }

  /** Prepare-input half (J1/J5/S2/A2/K5): content-hash the source, probe the
    * registry on both keys, store a new deterministic zip only if absent, and
    * return the (possibly pre-existing) entry. Folder and zip of the same
    * content dedup to one stored artifact — the reference's keystone property.
    */
  def registerInput(spark: SparkSession, source: String, storeDir: String,
      registryPath: String, sourceKind: String, now: String): RegistryEntry = {
    Files.createDirectories(Paths.get(storeDir))
    val isZip = source.toLowerCase.endsWith(".zip")
    val contentSha =
      if (isZip) ZipUtil.contentSha256OfZip(source)
      else ZipUtil.contentSha256OfDirectory(source)

    val registry = loadRegistry(spark, registryPath)
    val existing = registry.collect().map(r => RegistryEntry(
      r.getAs[String]("zip_name"), r.getAs[String]("zip_sha256"),
      r.getAs[String]("content_sha256"), r.getAs[Long]("size_bytes"),
      r.getAs[String]("created_at"), r.getAs[String]("source")))

    val zipShaOfSource = if (isZip) ZipUtil.fileSha256(source) else ""
    // self-heal like the reference (app.py:196-198): a registry hit only
    // counts if its stored artifact still exists — otherwise re-store
    existing.find(e => (e.content_sha256 == contentSha ||
        (zipShaOfSource.nonEmpty && e.zip_sha256 == zipShaOfSource)) &&
        Files.exists(Paths.get(storeDir, e.zip_name))) match {
      case Some(hit) => hit // dedup: nothing stored (app.py:279-298)
      case None =>
        // collision set = registry names ∪ on-disk names (app.py:215-225):
        // an orphan file from a crash between copy and registry write must
        // not make the next run's Files.copy throw
        val taken = existing.map(_.zip_name).toSet ++
          Option(new java.io.File(storeDir).list()).getOrElse(Array.empty[String])
        val name = storageZipName(
          Paths.get(source).getFileName.toString, contentSha, taken)
        val stored = Paths.get(storeDir, name).toString
        if (isZip) Files.copy(Paths.get(source), Paths.get(stored))
        else ZipUtil.writeDeterministicZip(source, stored)
        val entry = RegistryEntry(name, ZipUtil.fileSha256(stored), contentSha,
          Files.size(Paths.get(stored)), now, sourceKind)
        import spark.implicits._
        saveRegistry(registry.unionByName(Seq(entry).toDF()), registryPath)
        entry
    }
  }

  /** Process half: run the pipeline over the extracted input and emit every
    * artifact the reference's flags select (worker.py:357-437).
    */
  def runJob(spark: SparkSession, jobDir: String, inputDir: String, spec: JobSpec,
      clientFactory: () => Enrich.ModelClient = () => new Enrich.MockModelClient()): JobResult = {
    // pipeline runs under the engine's probe-verified defaults (AQE skew
    // split, UTC) even on a caller-built session — SCOPED: the caller's
    // own conf (their AQE choice, their timezone) is restored on exit, so
    // borrowing their session doesn't permanently reconfigure it. The
    // checkpoint below materializes eagerly, so nothing in the returned
    // JobResult still depends on the engine conf after restore.
    graft.Sessions.withRuntimeDefaults(spark) {
    val resultsDir = Paths.get(jobDir, "results")
    Files.createDirectories(resultsDir)

    val sunk = BatchJob.fromDirectory(spark, inputDir, spec.cfg,
      spec.groupBySubfolder, clientFactory)
    // Checkpoint, not persist: every sink below re-reads the result set
    // (group-scale, one row per group) and the DataFrame escapes in the
    // returned JobResult — an unreleased persist() would pin cache for the
    // application lifetime, and recomputation is unacceptable (clientFactory
    // calls are side-effecting: a live model client bills per request).
    // RELIABLE checkpoint when the application configured a checkpoint dir:
    // local-checkpoint blocks are unreplicated and lineage-truncated, so on a
    // real cluster an executor loss (or dynamic-allocation decommission)
    // between materialization and the last sink would fail the job with
    // "checkpoint block not found" instead of recovering. With no checkpoint
    // dir (single-JVM runs, tests) fall back to localCheckpoint — same
    // GC-owned-block hygiene, executor loss is process death there anyway.
    val results =
      if (spark.sparkContext.getCheckpointDir.isDefined) sunk.results.checkpoint()
      else sunk.results.localCheckpoint()
    val out = results.select(col("seq"), col("group_id").as("file"), col("output"))

    if (spec.outputFormats.contains("csv"))
      Sinks.writeCsvSingle(out.select("file", "output"), resultsDir.resolve("output.csv").toString, Seq("file"))
    if (spec.outputFormats.contains("json"))
      Sinks.writeJsonArray(out.select("file", "output"), resultsDir.resolve("output.json").toString, Seq("file"))
    if (spec.outputFormats.contains("text"))
      Sinks.writePerGroupText(results, resultsDir.toString)
    if (spec.saveConcatResults)
      Sinks.writeConcatenatedResults(results,
        resultsDir.resolve("results_concat.txt").toString)
    if (spec.includeMetadata)
      Sinks.writeCsvSingle(sunk.catalog, resultsDir.resolve("input.csv").toString, Seq("full_path"))

    val cost = sunk.costSummary
    import spark.implicits._
    val meta = Seq((spec.jobId, spec.apiKey, spec.groupBySubfolder)).toDF(
      "job_id", "api_key", "group_by_subfolder")
    Sinks.writeMetaRedacted(meta, resultsDir.resolve("meta.json").toString)

    val zipPath = Paths.get(jobDir, s"results_${spec.jobId}.zip").toString
    ZipUtil.writeDeterministicZip(resultsDir.toString, zipPath)

    JobResult(results, cost, zipPath)
    }
  }

  /** Full lifecycle: register/dedup the source, extract the stored artifact
    * into the job dir, process (the reference's `run_job_pipeline`,
    * app.py:642-656).
    */
  def run(spark: SparkSession, jobDir: String, source: String, storeDir: String,
      registryPath: String, spec: JobSpec, now: String,
      clientFactory: () => Enrich.ModelClient = () => new Enrich.MockModelClient()): (RegistryEntry, JobResult) = {
    val entry = registerInput(spark, source, storeDir, registryPath,
      if (source.toLowerCase.endsWith(".zip")) "uploaded" else "folder", now)
    val inputDir = Paths.get(jobDir, "input").toString
    ZipUtil.extractZip(Paths.get(storeDir, entry.zip_name).toString, inputDir)
    (entry, runJob(spark, jobDir, inputDir, spec, clientFactory))
  }
}
