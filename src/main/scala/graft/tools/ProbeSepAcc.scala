package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.extensions.LinearClassifier

/** Dev probe (round-16): x161's `separable_concept_learned` check reads
  * FALSE at sf1 (oracle mismatch found by running the x161 oracle at sf1 —
  * the driver only gates at sf0.01, so this never surfaced). The check
  * trains on the text-determined label contains("join") and asserts
  * accuracy ≥ 0.90; this probe measures the actual accuracy and label
  * balance across scales to locate the failure mode (label skew? bucket
  * collisions? iteration budget at 50k docs?).
  *
  * Usage: sbt -batch "runMain graft.tools.ProbeSepAcc <dir> [<dir> ...]"
  */
object ProbeSepAcc {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/tmp/sfgen/sf1")
    val spark = Sessions.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val buckets = sys.env.get("SEP_BUCKETS").flatMap(_.toIntOption)
      .getOrElse(8192)
    val agg = sys.env.getOrElse("SEP_GRADAGG", "pinned")
    dirs.foreach { dir =>
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val lab = d.withColumn("__sep",
        when(col("text").contains("join"), "has").otherwise("none"))
      val counts = lab.groupBy("__sep").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nFeat = graft.extensions.LinearClassifier.hashedNgramFeatures(
        lab.select(col("doc_id").as("id"), col("text").as("__t")),
        col("id"), col("__t"), 1 << 21)
        .select("bucket").distinct().count()
      val m = LinearClassifier.linearTrain(lab, col("doc_id"), col("__sep"),
        col("text"), nBuckets = buckets, iters = 40, lr = 0.125,
        gradAgg = agg)
      val pred = LinearClassifier.linearClassify(lab, col("doc_id"),
        col("text"), m)
      val acc = lab.select(col("doc_id").as("id"), col("__sep"))
        .join(pred.select("id", "pred_label"), Seq("id"))
        .agg(avg(when(col("__sep") === col("pred_label"), 1.0)
          .otherwise(0.0)))
        .first().getDouble(0)
      println(s"SEPACC dir=$dir counts=$counts buckets=$buckets agg=$agg " +
        s"nFeat=$nFeat acc=$acc " +
        s"lossFirst=${m.lossesMicro.head} lossLast=${m.lossesMicro.last}")
    }
    spark.stop()
  }
}
