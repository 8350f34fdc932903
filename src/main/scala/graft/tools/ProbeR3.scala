package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe for round-3 operators: (1) float->string->decimal cast parity
  * inputs for the prototype-centroid oracle, (2) count_min_sketch builtin
  * availability + driver-side estimate path, (3) prototype-similarity
  * distribution to pick a boundary-safe is_typical threshold. */
object ProbeR3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    // (1) float -> string repr, for DuckDB comparison (dump a few)
    e.selectExpr("vec_id", "cast(embedding[0] as string) s0",
        "cast(cast(embedding[0] as string) as decimal(20,10)) d0")
      .orderBy("vec_id").limit(5).collect()
      .foreach(r => println(s"[probe] vec=${r.get(0)} s0=${r.get(1)} d0=${r.get(2)}"))

    // (2) count_min_sketch
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val toks = d.select(explode(graft.extensions.TextAnalysis.tokens(col("text"))).as("tok"))
    val skBytes = toks.selectExpr("count_min_sketch(tok, cast(0.0001 as double), cast(0.99 as double), 42) sk")
      .head().getAs[Array[Byte]]("sk")
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = toks.groupBy("tok").count().orderBy(desc("count"), asc("tok")).limit(5).collect()
    exact.foreach { r =>
      val t = r.getString(0); val c = r.getLong(1)
      println(s"[probe] tok=$t exact=$c cms=${sk.estimateCount(t)} total=${sk.totalCount}")
    }

    // (3) prototype similarity distribution per label (sum-vector prototype)
    val ex = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("vd", col("v").cast("string").cast("decimal(20,10)"))
    val cent = ex.groupBy("label", "dim").agg(sum("vd").as("s"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("dim"), col("s")))).as("a"))
      .select(col("label"), transform(col("a"), x => x("s").cast("double")).as("cvec"))
    val sims = e.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        graft.extensions.Similarity.cosine(
          transform(col("embedding"), _.cast("double")), col("cvec")).as("sim"))
    sims.select(min("sim"), expr("percentile(sim, array(0.01,0.05,0.1,0.5))"), max("sim"))
      .collect().foreach(r => println(s"[probe] sim dist: $r"))
    spark.stop()
  }
}
