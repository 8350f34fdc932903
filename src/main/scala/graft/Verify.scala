package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // engine defaults (Sessions): UTC, nanos-as-long (events.parquet carries
    // TIMESTAMP(NANOS), converted in ParityQueries.events), AQE skew split —
    // the oracle gate runs the same configuration users get
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietPinnedWarnings()   // r18: bounded-window warning class, spec-pinned
    new java.io.File(outDir).mkdirs()
    // dev knob (same semantics as Bench): SPARK_GRAFT_ONLY=x103,x116 dumps
    // just the named queries AND their oracle rows, for a targeted local
    // oracle_check without the full 147-query sweep.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      // drop any previous run's output FIRST: if this query now fails, a
      // stale parquet dir must not let the oracle gate pass on old results
      val target = Paths.get(outDir, name)
      if (Files.exists(target)) graft.ops.ZipUtil.deleteRecursively(target)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(target.toString)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
