package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Enrich

/** Structured-Streaming ingest reusing the batch operators (SURVEY §7.6). */
class StreamingSpec extends AnyFunSuite with SparkTestSession {

  test("file stream groups+enriches arriving files via foreachBatch") {
    val in = Files.createTempDirectory("graft-stream-in")
    Files.createDirectories(in.resolve("book1"))
    Files.writeString(in.resolve("a.txt"), "alpha")
    Files.writeString(in.resolve("book1").resolve("p1.txt"), "one")
    Files.writeString(in.resolve("book1").resolve("p2.txt"), "two")

    val results = Files.createTempDirectory("graft-stream-out").toString + "/results"
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    val stream = StreamingIngest.fileStream(spark, in.toString, maxFilesPerTrigger = 10)
    val q = StreamingIngest.enrichStream(stream, Enrich.JobConfig(), results, ckpt)
    q.awaitTermination(60000)

    val out = spark.read.parquet(results)
    val byId = out.collect().map(r => r.getAs[String]("group_id") -> r.getAs[String]("output")).toMap
    assert(byId.keySet == Set("a.txt", "book1/"))
    assert(byId("book1/").contains("files=2"))

    // second batch: a new file arrives; checkpoint resumes, only the new file
    // is processed (incremental semantics)
    Files.writeString(in.resolve("b.txt"), "bravo")
    val q2 = StreamingIngest.enrichStream(
      StreamingIngest.fileStream(spark, in.toString), Enrich.JobConfig(), results, ckpt)
    q2.awaitTermination(60000)
    val out2 = spark.read.parquet(results)
    assert(out2.count() == 3)
    assert(out2.filter(col("group_id") === "b.txt").count() == 1)
  }
}
