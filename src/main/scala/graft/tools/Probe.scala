package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extensions.Dedup

/** Dev probe for per-stage timings of the LSH dedup path (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    time("shingles count") {
      docs.select(explode(Dedup.shingles(col("text"))).as("s")).count()
    }
    val sig = docs.select(col("doc_id").as("id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"))).as("sig"))
    time("signatures") { sig.count() }
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * 4 + lit(1), lit(4))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded") { banded.count() }
    val counts = banded.groupBy("band", "bucket").count()
    time("bucket histogram") {
      counts.select(sum(col("count") * col("count")).as("sum_sq"), max("count"), count(lit(1))).show()
    }
    time("full minhashPairs") {
      println("pairs=" + Dedup.minhashPairs(docs, col("doc_id"), col("text")).count())
    }
    spark.stop()
  }
}
