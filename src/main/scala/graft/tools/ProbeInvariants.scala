package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extensions.{Dedup, Similarity, TextAnalysis}
import graft.queries.ParityQueries

/** Dev probe: measures the empirical margins behind the x25/x26/x27 invariant
  * oracles (exact-Jaccard floor of LSH candidates, global brute-force rank of
  * ANN hits, HLL vocabulary error) so the pinned thresholds carry ≥2× slack
  * at both oracle (sf0.01) and bench (sf0.1) scales. Not part of the engine.
  */
object ProbeInvariants {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"=== $dir ===")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val embeds = spark.read.parquet(s"$dir/embeddings.parquet")

      // exact n-gram jaccard for a given pair table, independent HOF formulation
      def exactJaccard(pairs: DataFrame, n: Int): DataFrame = {
        val toks = array_remove(split(lower(col("text")), "\\s+"), "")
        val cnt = greatest(size(toks) - (n - 1), lit(1))
        val sh = array_distinct(transform(sequence(lit(1), cnt),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        val t = docs.select(col("doc_id"), sh.as("sh"))
        pairs.join(t.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(t.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("exact_j", col("inter").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      }

      val mh = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
        k = 32, bands = 8, threshold = 0.5).select("id_a", "id_b")
      val mhStats = exactJaccard(mh, 3).agg(count(lit(1)), min("exact_j")).head()
      println(s"x03 minhash candidates: n=${mhStats.get(0)} minExactJ3=${mhStats.get(1)}")

      val sh = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxDist = 26)
        .select("id_a", "id_b")
      val shStats = exactJaccard(sh, 2).agg(count(lit(1)), min("exact_j")).head()
      println(s"x04 simhash candidates: n=${shStats.get(0)} minExactJ2=${shStats.get(1)}")

      // ANN hits vs global brute-force rank (queries = vec_id % 50 == 0)
      val queries = embeds.filter(col("vec_id") % 50 === 0)
      val brute = Similarity.bruteForceTopK(queries, embeds, k = 200)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("global_rank"))
      val lshHits = Similarity.annTopK(embeds, k = 5, nBits = 8)
        .filter(col("query_id") % 50 === 0).select("query_id", "neighbor_id")
      val lshRank = lshHits.join(brute, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)), max("global_rank"),
          sum(when(col("global_rank").isNull, 1).otherwise(0))).head()
      println(s"x06 lsh hits: n=${lshRank.get(0)} maxGlobalRank=${lshRank.get(1)} beyond200=${lshRank.get(2)}")

      val ivfHits = Similarity.ivfTopK(queries, embeds, k = 5, nCentroids = 16, nProbe = 4)
        .select("query_id", "neighbor_id")
      val ivfRank = ivfHits.join(brute, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)), max("global_rank"),
          sum(when(col("global_rank").isNull, 1).otherwise(0))).head()
      println(s"x13 ivf hits: n=${ivfRank.get(0)} maxGlobalRank=${ivfRank.get(1)} beyond200=${ivfRank.get(2)}")

      // HLL vocab error per lang
      val exact = docs.select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy("lang").agg(countDistinct("t").as("exact_vocab"))
      val prof = TextAnalysis.corpusProfile(docs, col("lang"), col("text"))
        .select(col("group").as("lang"), col("approx_vocab"))
      val err = prof.join(exact, Seq("lang"))
        .select(col("lang"), (abs(col("approx_vocab") - col("exact_vocab")) /
          col("exact_vocab")).as("rel_err"))
        .agg(max("rel_err")).head()
      println(s"x22 max HLL vocab rel_err=${err.get(0)}")
    }
    spark.stop()
  }
}
