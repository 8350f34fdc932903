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
}
