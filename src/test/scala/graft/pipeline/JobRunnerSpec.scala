package graft.pipeline

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.ZipUtil

/** Golden end-to-end run (SURVEY §5.4): fixture tree → full lifecycle with the
  * deterministic mock client → byte-stable artifacts + dedup keystone.
  */
class JobRunnerSpec extends AnyFunSuite with SparkTestSession {

  private def mkFixtureTree(): String = {
    val dir = Files.createTempDirectory("graft-job-in").toString
    Files.writeString(Paths.get(dir, "a.txt"), "alpha")
    Files.createDirectories(Paths.get(dir, "book1", "nested"))
    Files.writeString(Paths.get(dir, "book1", "page1.txt"), "one")
    Files.writeString(Paths.get(dir, "book1", "nested", "page3.md"), "three")
    Files.writeString(Paths.get(dir, "notes.pdf"), "%PDF")
    dir
  }

  test("full lifecycle: register -> extract -> process -> artifacts") {
    val tree = mkFixtureTree()
    val work = Files.createTempDirectory("graft-work")
    val store = work.resolve("store").toString
    val registry = work.resolve("registry.json").toString
    val jobDir = work.resolve("job1").toString

    val spec = JobRunner.JobSpec(jobId = "job1", saveConcatResults = true,
      apiKey = "sk-or-v1-supersecret99")
    val (entry, result) = JobRunner.run(spark, jobDir, tree, store, registry,
      spec, now = "2026-08-12 00:00:00")

    // registry entry stored, deterministic zip exists
    assert(entry.zip_name.endsWith(".zip") && entry.content_sha256.length == 64)
    assert(Files.exists(Paths.get(store, entry.zip_name)))

    // results relation: one row per group, correct skip semantics
    val byId = result.results.collect()
      .map(r => r.getAs[String]("group_id") -> r.getAs[String]("output")).toMap
    assert(byId.keySet == Set("a.txt", "book1/", "notes.pdf"))
    assert(byId("notes.pdf") == "Unsupported file type")
    assert(byId("book1/").startsWith("[mock:mock-model]"))

    // artifacts: csv with header, json array, per-group text, concat, input
    // catalog, redacted meta, results zip
    val rd = Paths.get(jobDir, "results")
    assert(Files.readAllLines(rd.resolve("output.csv")).get(0) == "file,output")
    assert(Files.readString(rd.resolve("output.json")).startsWith("[\n"))
    assert(Files.exists(rd.resolve("book1_folder_output.txt")))
    assert(Files.exists(rd.resolve("a.txt")))
    assert(Files.exists(rd.resolve("results_concat.txt")))
    val inputCsv = Files.readAllLines(rd.resolve("input.csv"))
    assert(inputCsv.get(0) == "file_name,full_path,file_type,file_size")
    assert(inputCsv.size() == 5) // 4 files
    val meta = Files.readString(rd.resolve("meta.json"))
    assert(!meta.contains("supersecret") && meta.contains("secret99"))
    assert(Files.exists(Paths.get(result.resultsZip)))

    // cost summary: 2 attempted (a.txt, book1/), 0 failed
    val cs = result.costSummary.collect()(0)
    assert(cs.getAs[Long]("api_requests") == 2)
    assert(cs.getAs[Long]("failed_requests") == 0)

    // dedup keystone: re-running with a ZIP of the same tree hits the SAME
    // registry entry, stores nothing new
    val zipOfTree = work.resolve("upload.zip").toString
    ZipUtil.writeDeterministicZip(tree, zipOfTree)
    val (entry2, _) = JobRunner.run(spark, work.resolve("job2").toString,
      zipOfTree, store, registry, spec.copy(jobId = "job2"), now = "2026-08-12 01:00:00")
    assert(entry2.zip_name == entry.zip_name)
    assert(JobRunner.loadRegistry(spark, registry).count() == 1)
  }

  test("results upgrade to a RELIABLE checkpoint when a checkpoint dir is set") {
    // On a real cluster local-checkpoint blocks die with their executor; the
    // runner must promote to a replicated reliable checkpoint whenever the
    // application has configured one (the cluster operator's signal), so an
    // executor loss between materialization and the last sink recovers
    // instead of failing — without re-invoking the billable model client.
    val ckpt = Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val tree = mkFixtureTree()
    val work = Files.createTempDirectory("graft-work-ckpt")
    val (_, result) = JobRunner.run(spark, work.resolve("job1").toString, tree,
      work.resolve("store").toString, work.resolve("registry.json").toString,
      JobRunner.JobSpec(jobId = "job1"), now = "2026-08-12 00:00:00")
    assert(result.results.count() == 3)
    // reliable checkpoint writes rdd-N data under <dir>/<app-uuid>/
    val rddDirs = Files.walk(ckpt).filter(p => p.getFileName.toString.startsWith("rdd-"))
    assert(rddDirs.findFirst().isPresent,
      s"no reliable-checkpoint rdd directory written under $ckpt")
  }

  test("runJob restores the caller's session conf after the pipeline") {
    // The pipeline runs under the engine defaults (AQE skew split, UTC),
    // but a caller who deliberately disabled AQE or set a non-UTC zone must
    // get their session back as configured — an unscoped applyRuntimeDefaults
    // silently flipped it for every subsequent query on the session.
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.session.timeZone")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
      val tree = mkFixtureTree()
      val work = Files.createTempDirectory("graft-work-conf")
      Files.createDirectories(work.resolve("in"))
      val (_, result) = JobRunner.run(spark, work.resolve("job1").toString, tree,
        work.resolve("store").toString, work.resolve("registry.json").toString,
        JobRunner.JobSpec(jobId = "job1"), now = "2026-08-12 00:00:00")
      assert(result.results.count() == 3) // pipeline itself ran fine
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/Chicago")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("F11 storage naming: sanitize, cap, hash suffix, collision bump") {
    val sha = "ab" * 32
    assert(JobRunner.storageZipName("My Upload (v2).zip", sha, Set.empty)
      == s"My_Upload_v2_${sha.take(12)}.zip")
    assert(JobRunner.storageZipName("../..//etc/passwd", sha, Set.empty)
      == s"passwd_${sha.take(12)}.zip")
    val long = "x" * 200
    assert(JobRunner.storageZipName(long, sha, Set.empty).length <= 80 + 13 + 4 + 3)
    val first = JobRunner.storageZipName("a.zip", sha, Set.empty)
    val second = JobRunner.storageZipName("a.zip", sha, Set(first))
    assert(second == s"a_${sha.take(12)}_2.zip")
  }
}
