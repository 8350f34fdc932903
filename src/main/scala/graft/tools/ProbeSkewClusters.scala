package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extensions.Dedup

/** Dev probe (not part of the API): times resolveClusters' two shapes — the
  * window pass vs the map-side-combining groupBy + join-back — under
  * mega-cluster skew: one component holding 50% of all rows, the duplicate-
  * storm profile a 100 TB dedup actually meets. Drives the default of
  * `maxWindowedClusterSize`.
  */
object ProbeSkewClusters {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8L * 1000 * 1000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus with a payload column so shuffled bytes are realistic-ish
    val rows = spark.range(n).select(col("id").as("doc_id"),
      (col("id") % 97).as("quality"),
      sha2(col("id").cast("string"), 256).as("payload"))
    val mega = spark.range(1, n / 2).select(lit(0L).as("id_a"), col("id").as("id_b"))
    val small = spark.range(n / 2 + 1, n - 1, 4)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val pairs = mega.union(small)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round (n=$n, mega component = ${n / 2} members) ---")
      time("window shape (forced)") {
        Dedup.resolveClusters(rows, col("doc_id"), -col("quality"), pairs,
          maxWindowedClusterSize = Long.MaxValue)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      time("groupBy+join-back shape (forced)") {
        Dedup.resolveClusters(rows, col("doc_id"), -col("quality"), pairs,
          maxWindowedClusterSize = 1000)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
