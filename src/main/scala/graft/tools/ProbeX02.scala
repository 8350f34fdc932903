package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.extensions.Dedup

/** Dev probe for per-stage timings of the n-gram-Jaccard path (not part of the API). */
object ProbeX02 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val block = concat(col("lang"), lit("|"), (col("n_chars") / 25).cast("long"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    time("warmup") { spark.range(100000).selectExpr("sum(id)").count() }

    val sh = docs.select(col("doc_id").as("id"), block.as("block"),
      Dedup.shingles(col("text"), 1).as("sh")).persist(StorageLevel.MEMORY_AND_DISK)
    time("shingle table materialize") { sh.count() }

    val l = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    time("pair join (no intersect)") {
      println("pairs=" + l.join(r, Seq("block")).filter(col("id_a") < col("id_b")).count())
    }
    time("pair join + intersect") {
      println("kept=" + l.join(r, Seq("block")).filter(col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .filter(col("inter") >= 0).count())
    }
    sh.unpersist()
    time("full x02 (library path)") {
      println("rows=" + Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        block, n = 1, threshold = 0.7).count())
    }
    time("full x02 again (warm)") {
      println("rows=" + Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        block, n = 1, threshold = 0.7).count())
    }
    spark.stop()
  }
}
