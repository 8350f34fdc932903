package graft.ops

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** J5/P4/A7 + S6/S7 listing sources. */
class JobStoreSpec extends AnyFunSuite with SparkTestSession {

  test("P4 resolveExistingZip: basename-only, .zip-only, store-confined") {
    val store = Files.createTempDirectory("graft-zips")
    Files.writeString(store.resolve("good.zip"), "z")
    Files.writeString(store.resolve("notzip.txt"), "t")
    assert(JobStore.resolveExistingZip("good.zip", store.toString).isDefined)
    assert(JobStore.resolveExistingZip("../good.zip", store.toString).isDefined) // basename'd
    assert(JobStore.resolveExistingZip("notzip.txt", store.toString).isEmpty)
    assert(JobStore.resolveExistingZip("missing.zip", store.toString).isEmpty)
    assert(JobStore.resolveExistingZip("", store.toString).isEmpty)
  }

  test("J5 resolution chain: relpath > shared name > job-local > legacy") {
    val store = Files.createTempDirectory("graft-zips")
    val jobDir = Files.createTempDirectory("graft-job")
    Files.writeString(store.resolve("shared.zip"), "s")
    Files.writeString(jobDir.resolve("local.zip"), "l")
    Files.writeString(jobDir.resolve("input.zip"), "i")

    // 1. relpath hit wins
    assert(JobStore.resolveJobInputZip(jobDir.toString, Some("x/shared.zip"),
      Some("local.zip"), store.toString).get._1 == "shared.zip")
    // 2. name-in-store
    assert(JobStore.resolveJobInputZip(jobDir.toString, Some("gone.zip"),
      Some("shared.zip"), store.toString).get._1 == "shared.zip")
    // 3. job-local fallback
    assert(JobStore.resolveJobInputZip(jobDir.toString, None,
      Some("local.zip"), store.toString).get._2.endsWith("local.zip"))
    // 4. legacy input.zip
    assert(JobStore.resolveJobInputZip(jobDir.toString, None, None,
      store.toString).get._1 == "input.zip")
    // nothing anywhere
    assert(JobStore.resolveJobInputZip(
      Files.createTempDirectory("empty").toString, None, None, store.toString).isEmpty)
  }

  test("A7 latestResultsZip: lexicographic max of results_*.zip") {
    val jobDir = Files.createTempDirectory("graft-job")
    Files.writeString(jobDir.resolve("results_20260101_000000.zip"), "a")
    Files.writeString(jobDir.resolve("results_20260301_120000.zip"), "b")
    Files.writeString(jobDir.resolve("other.zip"), "c")
    assert(JobStore.latestResultsZip(jobDir.toString).contains("results_20260301_120000.zip"))
    assert(JobStore.latestResultsZip(Files.createTempDirectory("none").toString).isEmpty)
  }

  test("S6/S7 store listings: filters, labels, ordering") {
    val dir = Files.createTempDirectory("graft-list")
    Files.writeString(dir.resolve("a.zip"), "x" * 2048)
    Files.writeString(dir.resolve("b.ZIP"), "y")
    Files.writeString(dir.resolve("c.txt"), "z")
    Files.createDirectories(dir.resolve("folder1"))
    Files.writeString(dir.resolve("folder1").resolve("f.txt"), "f")
    Files.createDirectories(dir.resolve("results")) // hidden by default

    val zips = Ingest.listZips(spark, dir.toString).collect()
    assert(zips.map(_.getAs[String]("name")).toSet == Set("a.zip", "b.ZIP"))
    assert(zips.find(_.getAs[String]("name") == "a.zip").get
      .getAs[String]("size_label") == "2.00 KB")

    val folders = Ingest.listFolders(spark, dir.toString).collect()
    assert(folders.map(_.getAs[String]("name")).toSeq == Seq("folder1"))
    assert(folders(0).getAs[String]("items_label") == "1 item")
  }
}
