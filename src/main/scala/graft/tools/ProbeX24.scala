package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extensions.{Dedup, TextAnalysis}
/** Dev probe: x24 stage costs at sf0.1 — measured 82k candidate pairs over
  * 3.7k docs (dense near-dup cliques); CC converges in ~2 rounds and local
  * wall time is dominated by per-stage fixed costs that amortize on a real
  * cluster. Not part of the engine. */
object ProbeX24 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val pairs = Dedup.ngramJaccardPairs(
      d.filter(size(TextAnalysis.tokens(col("text"))) > 0),
      col("doc_id"), col("text"),
      concat(col("lang"), lit("|"), (col("n_chars") / 25).cast("long")),
      n = 1, threshold = 0.7)
    time("pairs count") { println("[probe] n_pairs=" + pairs.count()) }
    val comps = time("cc") { val c = Dedup.connectedComponents(pairs); println("[probe] n_comp_rows=" + c.count()); c }
    time("resolve+noop") {
      Dedup.resolveClusters(d, col("doc_id"), -col("n_chars"), pairs)
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
