package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.extensions.{Dedup, TextAnalysis}
import graft.functions.PushdownFence

/** Dev tool (r17 VERDICT #9): the committed x02/x56 plan dumps truncate at
  * checkpoint/`ExistingRDD` boundaries, so the r17 fan-out/fence changes were
  * not in-plan auditable from `plans/`. This dumps the INNER fragments —
  * rebuilt with the exact same public operator calls the queries use — so the
  * exchange placement (fence above the round-robin fan-out, scan below) and
  * the candidate-join shape are visible in a committed plan file.
  *
  * Usage: runMain graft.tools.PlanDumpInner <sfDir> <tag> <suffix>
  */
object PlanDumpInner {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDumpInner <sfDir> <tag> <suffix>")
    val Array(dir, tag, suffix) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val p = outDir.resolve(s"${name}_$suffix.txt")
      Files.write(p, plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump-inner] wrote $p (${plan.length} chars)")
    }

    val docs = graft.ops.Fanout.forCpu(
      spark.read.parquet(s"$dir/documents.parquet"))

    // x02's sketch-cache INPUT fragment: the fenced tokenizing filter must
    // sit ABOVE the fan-out exchange, the scan below it.
    dump("x02_sketch_input", docs
      .filter(PushdownFence.fence(size(TextAnalysis.tokens(col("text"))) > 0))
      .select(col("doc_id"),
        concat(col("lang"), lit("|"), (col("n_chars") / 25).cast("long"))
          .as("block"),
        Dedup.shingles(col("text"), 1).as("sh")))

    // x56's shared funnel PREFIX (hidden behind the exactSurv checkpoint):
    // scan → fenced quality gate → exact-dedup survivor election.
    val quality = docs.filter(PushdownFence.fence(
      TextAnalysis.meanWordLen(col("text")).between(3.0, 10.0) &&
        TextAnalysis.alphaRatio(col("text")) >= 0.6 &&
        TextAnalysis.dupLineFrac(col("text")) <= 0.3))
    dump("x56_funnel_prefix", Dedup.exact(quality, col("text"), col("doc_id")))

    // x56's pair stage on the (un-checkpointed) survivor relation: the
    // candidate self-join condition (hashed prefix-token key, length bounds,
    // positional filter) and the verify join are visible here.
    dump("x56_pair_stage", Dedup.prefixJaccardPairs(
      Dedup.exact(quality, col("text"), col("doc_id")),
      col("doc_id"), col("text"), thresholdPct = 70, n = 3))

    spark.stop()
  }
}
