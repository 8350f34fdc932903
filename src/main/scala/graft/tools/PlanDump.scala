package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: write the `.explain("formatted")` output of named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence an
  * optimization round commits alongside the code. Mirrors the engine session
  * defaults (graft.Sessions) so the dumped plan is the one Bench actually
  * executes, not a differently-configured variant.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <tag> <suffix> <query> [query...]
  * e.g.   runMain graft.tools.PlanDump /root/testdata/sf0.1 r17 before x24_dedup_clusters
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <tag> <suffix> <query> [query...]")
    val Array(dir, tag, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    names.foreach { name =>
      val q = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val plan = q(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val p = outDir.resolve(s"${name}_$suffix.txt")
      Files.write(p, plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $p (${plan.length} chars)")
    }
    spark.stop()
  }
}
