package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.extensions.{Dedup, TextAnalysis}

/** Dev probe (not part of the engine surface): per-stage row volumes of the
  * prefix-filtered Jaccard join on a given sf dir — pinpoints which stage
  * produced the sf10 spill blow-up observed in round 11.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProbePrefixVolumes [n] [tPct]"
  */
object ProbePrefixVolumes {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2
    val t = if (args.length > 1) args(1).toLong else 70L
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    // NOTE: driver heap must come from the JVM launch (SBT_OPTS=-Xmx12g or
    // a forked run's javaOptions) — setting spark.driver.memory via the
    // builder has NO effect in an already-launched local JVM (sbt runMain),
    // and a probe silently running on the default heap would skew the very
    // spill measurements it exists to collect.
    val spark = Sessions.localBuilder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet")

    // re-derive the operator's internal stages (mirrors Dedup.prefixJaccardPairs)
    val toks = d
      .filter(size(TextAnalysis.tokens(col("text"))) >= n)
      .select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"), n)).as("tok"))
    val nToks = toks.count()
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("__df"))
    val nVocab = dfreq.count()
    val topDf = dfreq.orderBy(desc("__df")).limit(5).collect()
      .map(r => r.getLong(1)).mkString(",")
    val sorted = toks.join(dfreq.hint("shuffle_hash"), Seq("tok"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__df"), col("tok")))).as("__st"))
      .select(col("id"),
        transform(col("__st"), s => s.getField("tok")).as("toks"),
        size(col("__st")).cast("long").as("sz"))
    val prefLen =
      col("sz") - floor((lit(t) * col("sz") + 99L) / 100L).cast("long") + 1L
    val pre = sorted.select(col("id"), col("sz"),
      explode(slice(col("toks"), lit(1), prefLen.cast("int"))).as("tok"))
    val nPre = pre.count()
    // prefix-token DF (how common are the tokens that survive into prefixes)
    val preDf = pre.groupBy("tok").agg(count(lit(1)).as("pdf"))
    val topPreDf = preDf.orderBy(desc("pdf")).limit(5).collect()
      .map(r => r.getLong(1)).mkString(",")
    // raw candidate volume = what feeds .distinct() — the suspected blow-up
    val rawCand = pre.as("l").join(pre.as("r").hint("shuffle_hash"), Seq("tok"))
      .filter(col("l.id") < col("r.id") &&
        col("l.sz") * t <= col("r.sz") * 100L &&
        col("r.sz") * t <= col("l.sz") * 100L)
    val nRaw = rawCand.count()
    val nDistinct = rawCand.select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct().count()
    val nPairs = Dedup.prefixJaccardPairs(d, col("doc_id"), col("text"),
      thresholdPct = t.toInt, n = n).count()

    println(s"""{"dir":"$dir","n":$n,"tPct":$t,"shingleRows":$nToks,""" +
      s""""vocab":$nVocab,"topDf":[$topDf],"prefixRows":$nPre,""" +
      s""""topPrefixDf":[$topPreDf],"rawCandidates":$nRaw,""" +
      s""""distinctCandidates":$nDistinct,"pairs":$nPairs}""")
    spark.stop()
  }
}
