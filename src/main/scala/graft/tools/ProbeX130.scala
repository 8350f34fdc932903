package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.extensions.TextAnalysis

/** Dev probe: stage-wise cost of the x130 Jaro–Winkler pair query on a
  * given sf dir — separates scan+title, block-join pair volume, and the
  * scorer itself, to localize a scale regression.
  */
object ProbeX130 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val spark = Sessions.localBuilder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val titled = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 4)).as("title"))
    time("docs")(titled.count())
    time("distinct sources")(titled.select("source").distinct().count())
    val keyed = titled.select(col("doc_id").as("id"),
        col("source").as("blk"), col("title").as("nm"))
      .filter(col("blk").isNotNull && col("nm").isNotNull &&
        length(col("nm")).between(1, 256))
    val pairs = keyed.as("l").join(keyed.as("r").hint("shuffle_hash"),
      col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
    time("pair volume (no scorer)")(pairs.count())
    val scored = pairs.select(
      round(graft.functions.JaroWinklerSimilarity
        .jaroWinkler(col("l.nm"), col("r.nm")), 6).as("s"))
    time("scored pairs (count)")(scored.count())
    time("scored >= 0.8")(scored.filter(col("s") >= 0.8).count())
    time("avg title len")(titled.select(avg(length(col("title")))).collect()(0))
    spark.stop()
  }
}
