package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** A2/A3 hashing, K5 deterministic zip, J1 registry, K1-K4 sinks, O3 archive. */
class StoreSpec extends AnyFunSuite with SparkTestSession {

  private def mkTree(): String = {
    val dir = Files.createTempDirectory("graft-tree").toString
    Files.createDirectories(Paths.get(dir, "sub"))
    Files.writeString(Paths.get(dir, "a.txt"), "alpha")
    Files.writeString(Paths.get(dir, "sub", "b.txt"), "beta")
    dir
  }

  test("A2 keystone: folder hash == hash of its zip (app.py:107-137)") {
    val dir = mkTree()
    val zip = Files.createTempFile("graft", ".zip").toString
    ZipUtil.writeDeterministicZip(dir, zip)
    assert(ZipUtil.contentSha256OfDirectory(dir) == ZipUtil.contentSha256OfZip(zip))
  }

  test("K5 deterministic zip is byte-stable across rebuilds") {
    val dir = mkTree()
    val z1 = Files.createTempFile("graft1", ".zip").toString
    val z2 = Files.createTempFile("graft2", ".zip").toString
    ZipUtil.writeDeterministicZip(dir, z1)
    Thread.sleep(10)
    ZipUtil.writeDeterministicZip(dir, z2)
    assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(z1)), Files.readAllBytes(Paths.get(z2))))
    assert(ZipUtil.fileSha256(z1) == ZipUtil.fileSha256(z2))
  }

  test("S2 extract round-trips content") {
    val dir = mkTree()
    val zip = Files.createTempFile("graft", ".zip").toString
    ZipUtil.writeDeterministicZip(dir, zip)
    val out = Files.createTempDirectory("graft-out").toString
    ZipUtil.extractZip(zip, out)
    assert(Files.readString(Paths.get(out, "sub", "b.txt")) == "beta")
    assert(ZipUtil.contentSha256OfDirectory(out) == ZipUtil.contentSha256OfDirectory(dir))
  }

  test("A2 exact DataFrame formulation == driver-side reference layout") {
    val dir = mkTree()
    import spark.implicits._
    val files = Seq(
      ("a.txt", "alpha".getBytes("UTF-8")),
      ("sub/b.txt", "beta".getBytes("UTF-8"))
    ).toDF("rel_path", "content").withColumn("g", lit(1))
    val got = Hashing.contentSha256Exact(files, Seq(col("g")))
      .collect()(0).getAs[String]("content_sha256")
    assert(got == ZipUtil.contentSha256OfDirectory(dir))
  }

  test("A2 scalable hash: permutation-invariant, content-sensitive") {
    import spark.implicits._
    val base = Seq(("a.txt", "alpha".getBytes("UTF-8")), ("b.txt", "beta".getBytes("UTF-8")))
    def hashOf(rows: Seq[(String, Array[Byte])]) =
      Hashing.contentSha256Scalable(rows.toDF("rel_path", "content").withColumn("g", lit(1)), Seq(col("g")))
        .collect()(0).getAs[String]("content_sha256")
    assert(hashOf(base) == hashOf(base.reverse)) // input order never matters
    assert(hashOf(base) != hashOf(Seq(("a.txt", "ALPHA".getBytes("UTF-8")), base(1))))
    assert(hashOf(base) != hashOf(Seq(("renamed.txt", "alpha".getBytes("UTF-8")), base(1))))
  }

  test("A2 guard: digests of a known tree pinned to constants (NUL-separator integrity)") {
    // Independently derived (python hashlib) from the documented frame layouts.
    // If tooling ever mangles the NUL separators in Hashing.scala or
    // ZipUtil, these constants catch it before every content hash shifts.
    val dir = mkTree()
    assert(ZipUtil.contentSha256OfDirectory(dir) ==
      "92de56d69ce1e2c5d211b3bb3fef0d9aea091a0fb7b45dfcae8ff274144689e2")
    import spark.implicits._
    val files = Seq(
      ("a.txt", "alpha".getBytes("UTF-8")),
      ("sub/b.txt", "beta".getBytes("UTF-8"))
    ).toDF("rel_path", "content").withColumn("g", lit(1))
    val scalable = Hashing.contentSha256Scalable(files, Seq(col("g")))
      .collect()(0).getAs[String]("content_sha256")
    assert(scalable == "ed513b3973f65c4872ba95b709f8eb32a10a3f78b7b722b3b6b70435f3da5d7b")
  }

  test("J1 registry: OR-key match, insert-if-absent idempotence (app.py:191-298)") {
    import spark.implicits._
    val registry = Seq(
      ("r1.zip", "zipA", "contentA", 10L, "2026-01-01 00:00:00", "uploaded"),
      ("r2.zip", "zipB", "contentB", 20L, "2026-01-02 00:00:00", "folder")
    ).toDF("zip_name", "zip_sha256", "content_sha256", "size_bytes", "created_at", "source")
    val candidates = Seq(
      ("c1.zip", "zipA", "contentX", 1L, "2026-02-01 00:00:00", "uploaded"), // matches by zip hash
      ("c2.zip", "zipY", "contentB", 2L, "2026-02-01 00:00:00", "uploaded"), // matches by content hash
      ("c3.zip", "zipZ", "contentZ", 3L, "2026-02-01 00:00:00", "uploaded"), // new
      ("c4.zip", "zipW", "contentZ", 4L, "2026-02-02 00:00:00", "uploaded") // dup of c3 within batch
    ).toDF("zip_name", "zip_sha256", "content_sha256", "size_bytes", "created_at", "source")

    val fresh = Registry.newEntries(candidates, registry).select("zip_name")
      .collect().map(_.getString(0)).toSet
    assert(fresh == Set("c3.zip", "c4.zip"))

    val matches = Registry.findMatches(candidates, registry)
      .select("zip_name", "matched_zip_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(matches("c1.zip") == "r1.zip")
    assert(matches("c2.zip") == "r2.zip")
    assert(matches("c3.zip") == null)

    val once = Registry.register(registry, candidates)
    assert(once.count() == 3) // +1: c3/c4 collapse to first-by-created_at
    val twice = Registry.register(once, candidates)
    assert(twice.count() == 3) // idempotent (app.py:279-281)
  }

  test("K1/K2 single-file CSV and JSON-array sinks") {
    import spark.implicits._
    val df = Seq((2L, "b", "two"), (1L, "a", "one")).toDF("seq", "file", "output")
    val tmp = Files.createTempDirectory("graft-sink")
    val csv = tmp.resolve("output.csv").toString
    Sinks.writeCsvSingle(df, csv, Seq("file"))
    val lines = Files.readAllLines(Paths.get(csv))
    assert(lines.get(0) == "seq,file,output")
    assert(lines.size() == 3 && lines.get(1).startsWith("1,a"))

    val json = tmp.resolve("output.json").toString
    Sinks.writeJsonArray(df.select("file", "output"), json, Seq("file"))
    val body = Files.readString(Paths.get(json))
    assert(body.startsWith("[\n  {") && body.endsWith("}\n]"))
    assert(body.contains(""""file":"a""""))
  }

  test("K3 per-group text naming (worker.py:178-184)") {
    import spark.implicits._
    val res = Seq(
      (1L, "book1/", true, "folder out"),
      (2L, "a.txt", false, "file out"),
      (3L, "b.md", false, "md out")
    ).toDF("seq", "group_id", "is_folder", "output")
    val dir = Files.createTempDirectory("graft-txt").toString
    Sinks.writePerGroupText(res, dir)
    assert(Files.readString(Paths.get(dir, "book1_folder_output.txt")) == "folder out")
    assert(Files.readString(Paths.get(dir, "a.txt")) == "file out")
    assert(Files.readString(Paths.get(dir, "b.txt")) == "md out")
  }

  test("K4 concatenated results renumber by seq (worker.py:220-236)") {
    import spark.implicits._
    val res = Seq(
      (2L, "g2", false, "rec 000000001 end"),
      (1L, "g1", false, "rec 000000001 and 000000001")
    ).toDF("seq", "group_id", "is_folder", "output")
    val out = Sinks.concatenatedResults(res)
    assert(out == "rec 000000001 and 000000001\nrec 000000002 end")
    // streamed sink form writes byte-identical content (bounded driver memory)
    val path = Files.createTempDirectory("graft-concat").resolve("concat.txt").toString
    Sinks.writeConcatenatedResults(res, path)
    assert(Files.readString(Paths.get(path)) == out)
    // and across many partitions (toLocalIterator fetches them in order)
    val wide = res.repartition(8)
    Sinks.writeConcatenatedResults(wide, path)
    assert(Files.readString(Paths.get(path)) == out)
  }

  test("K7 meta redaction: api_key never reaches the sink (app.py:444-452)") {
    import spark.implicits._
    val meta = Seq(("job1", "sk-or-v1-secretsecret123")).toDF("job_id", "api_key")
    val path = Files.createTempDirectory("graft-meta").resolve("meta.json").toString
    Sinks.writeMetaRedacted(meta, path)
    val body = Files.readString(Paths.get(path))
    assert(!body.contains("secretsecret"))
    assert(body.contains(""""api_key_last8":"cret123"""".dropRight(1) + "\"") ||
      body.contains("api_key_last8"))
  }

  test("O3 archive sort: nulls last both directions, elapsed parsed (app.py:1038-1081)") {
    import spark.implicits._
    val jobs = Seq(
      ("j1", "0:10:00"), ("j2", null), ("j3", "1 day, 0:00:01"), ("j4", "0:00:05")
    ).toDF("job_id", "elapsed_time")
    def ranks(desc: Boolean) =
      Archive.sortedArchive(jobs, "elapsed_time", desc)
        .orderBy("rank").collect().map(_.getAs[String]("job_id")).toSeq
    assert(ranks(desc = false) == Seq("j4", "j1", "j3", "j2"))
    assert(ranks(desc = true) == Seq("j3", "j1", "j4", "j2")) // null still last
  }

  test("A8 status derivation precedence") {
    import spark.implicits._
    val df = Seq(
      (true, "ok", true), (false, "error", true), (false, "ok", true), (false, "ok", false)
    ).toDF("running", "input_status", "has_zip")
    val got = df.select(Archive.statusColumn(col("running"), col("input_status"), col("has_zip")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Running", "Failed", "Finished", "Unknown"))
  }
}
