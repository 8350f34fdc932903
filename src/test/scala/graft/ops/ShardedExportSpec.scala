package graft.ops

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The export sink's determinism contract, verified byte-for-byte: stable
  * salt-keyed assignment, id-ordered shard files, manifest hash-of-hashes
  * matching an independent Scala re-derivation, and re-run idempotence.
  */
class ShardedExportSpec extends AnyFunSuite with SparkTestSession {

  private val nShards = 5
  private val salt = "t1"

  private def corpus = {
    import spark.implicits._
    (0L until 100L).map(i => (i, s"doc $i body " + ("w" * (i % 7).toInt)))
      .toDF("doc_id", "text")
  }

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Independent replica of the sha-bucket assignment. */
  private def expectedShard(id: Long): Long =
    java.lang.Long.parseLong(sha256Hex(id.toString + salt).take(8), 16) % nShards

  private def expectedByShard: Map[Long, Seq[(Long, String)]] =
    (0L until 100L).map(i => (i, s"doc $i body " + ("w" * (i % 7).toInt)))
      .groupBy { case (id, _) => expectedShard(id) }
      .view.mapValues(_.sortBy(_._1).toSeq).toMap

  test("manifest matches an independent hash-of-hashes re-derivation") {
    val m = ShardedExport.manifest(corpus, col("doc_id"), col("text"), nShards, salt)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val exp = expectedByShard
    assert(m.keySet == exp.keySet)
    exp.foreach { case (shard, docsInShard) =>
      val (nDocs, totalChars, sha) = m(shard)
      assert(nDocs == docsInShard.size)
      assert(totalChars == docsInShard.map(_._2.length.toLong).sum)
      assert(sha == sha256Hex(docsInShard.map(d => sha256Hex(d._2)).mkString))
    }
  }

  test("assignment is stable under repartitioning") {
    val before = corpus
      .select(col("doc_id"), ShardedExport.shardOf(col("doc_id"), nShards, salt).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = corpus.repartition(7)
      .select(col("doc_id"), ShardedExport.shardOf(col("doc_id"), nShards, salt).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == after)
    assert(before.values.forall(s => s >= 0 && s < nShards))
  }

  test("writeShardedText: ordered files, every doc exactly once, idempotent bytes") {
    val dir = Files.createTempDirectory("graft-shard-test").toString
    ShardedExport.writeShardedText(corpus, col("doc_id"), col("text"), dir, nShards, salt)
    val exp = expectedByShard

    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard_")).toSeq
    assert(files.size == exp.size)
    val contents = files.map { p =>
      p.getFileName.toString -> Files.readString(p)
    }.toMap
    exp.foreach { case (shard, docsInShard) =>
      val name = f"shard_$shard%05d.txt"
      assert(contents(name) == docsInShard.map(_._2).mkString("\n"))
    }
    // every doc lands in exactly one file
    val allLines = contents.values.flatMap(_.split("\n", -1)).toSeq
    assert(allLines.size == 100 && allLines.distinct.size == 100)

    // re-run over the same corpus produces byte-identical files
    ShardedExport.writeShardedText(corpus, col("doc_id"), col("text"), dir, nShards, salt)
    contents.foreach { case (name, body) =>
      assert(Files.readString(Paths.get(dir, name)) == body)
    }
  }

  test("re-export removes stale shard files from a previous run") {
    val dir = Files.createTempDirectory("graft-shard-stale").toString
    ShardedExport.writeShardedText(corpus, col("doc_id"), col("text"), dir, nShards, salt)
    val before = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("shard_")).toSet
    assert(before.size == nShards)
    // re-export into the SAME dir with one shard: old shard_00001..4 must go
    val m = ShardedExport.writeShardedText(corpus, col("doc_id"), col("text"), dir, 1, salt)
      .collect()
    val after = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("shard_")).toSet
    assert(after == Set("shard_00000.txt"))
    assert(m.length == 1 && m.head.getLong(1) == 100L)
  }

  test("null text: writer and manifest agree (both treat it as empty string)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-shard-null").toString
    val withNull = Seq((1L, "alpha"), (2L, null: String), (3L, "gamma"))
      .toDF("doc_id", "text")
    val m = ShardedExport.writeShardedText(withNull, col("doc_id"), col("text"),
      dir, 1, salt).collect()
    assert(m.length == 1)
    // manifest counts the null row (as "")...
    assert(m.head.getLong(1) == 3L)
    assert(m.head.getLong(2) == "alpha".length + "gamma".length)
    // ...and the file contains it as an empty line, in id order
    val body = Files.readString(Paths.get(dir, "shard_00000.txt"))
    val expectedLines = Seq((1L, "alpha"), (2L, ""), (3L, "gamma"))
      .sortBy { case (id, _) => (expectedShardK(id, 1), id) }.map(_._2)
    assert(body == expectedLines.mkString("\n"))
    // and the hash-of-hashes covers the "" doc, in id order
    val expSha = sha256Hex(
      Seq((1L, "alpha"), (2L, ""), (3L, "gamma")).sortBy(_._1)
        .map(d => sha256Hex(d._2)).mkString)
    assert(m.head.getString(3) == expSha)
  }

  test("manifest describes the bytes actually written even for nondeterministic input") {
    val dir = Files.createTempDirectory("graft-shard-nondet").toString
    // rand()-derived text: every re-evaluation of the frame produces different
    // rows, so this only passes if writer and manifest share ONE materialization
    val nondet = corpus.withColumn("text",
      concat(col("text"), lit(" r="), rand().cast("string")))
    val m = ShardedExport.writeShardedText(nondet, col("doc_id"), col("text"),
        dir, nShards, salt)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val byShard = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard_"))
      .map { p =>
        val shard = p.getFileName.toString.stripPrefix("shard_").stripSuffix(".txt").toLong
        shard -> Files.readString(p)
      }.toMap
    assert(byShard.keySet == m.keySet)
    byShard.foreach { case (shard, body) =>
      val fromFile = sha256Hex(body.split("\n", -1).map(sha256Hex).mkString)
      assert(m(shard) == fromFile, s"manifest diverges from file bytes for shard $shard")
    }
  }

  /** shardOf replica with explicit shard count (for the 1-shard tests). */
  private def expectedShardK(id: Long, k: Int): Long =
    java.lang.Long.parseLong(sha256Hex(id.toString + salt).take(8), 16) % k
}
