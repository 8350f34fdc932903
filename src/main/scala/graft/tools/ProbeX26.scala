package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev probe: attribute the round-12 x26-family local-median drift (x26
  * 3.68 s → 13.82 s with unchanged query code) by running the family under
  * the two candidate explanations as CONTROLLED variables:
  *
  *   - `spark.sql.adaptive.coalescePartitions.initialPartitionNum` ∈
  *     {default (unset), 1024} — the round-11 engine default that landed
  *     between the two measurements; the hypothesis is that 1024-way
  *     pre-coalesce task overhead taxes x26's five serialized audit
  *     branches.
  *   - boot-to-boot variance — each probe invocation is a fresh forked JVM;
  *     run the tool N times (the BENCH_x28 multi-boot pattern) and compare
  *     across boots.
  *
  * Config order INTERLEAVES per rep (default,1024,default,1024,…) so a VM
  * load swell hits both arms equally instead of biasing whichever ran
  * second. Queries run through the exact Bench harness shape: noop sink,
  * blocking unpersist + clearCache between reps, warm session.
  *
  * Output: one bare JSON line per invocation —
  * `{"boot":…,"sf":…,"arms":{"default":{q:[t,…]},"p1024":{…}}}`.
  * Aggregate boots into BENCH_x26_probe_r13.json by hand (dev artifact).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3
  *        sbt -batch "runMain graft.tools.ProbeX26 <bootLabel>"
  */
object ProbeX26 {

  private val Family =
    Seq("x24_dedup_clusters", "x26_ann_invariants", "x56_funnel_neardup",
      "x57_cluster_split")

  private val ConfKey =
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  def main(args: Array[String]): Unit = {
    val boot = args.headOption.getOrElse("b0")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3)
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench-identical warm-up: session/codegen/scan init off the clock
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

    // arm = (label, initialPartitionNum, parallelismFirst): the fix
    // candidates — drop the 1024 default, keep it but let AQE coalesce
    // below local parallelism (parallelismFirst=false), or halve it twice
    val PfKey = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    val arms: Seq[(String, Option[String], Option[String])] = Seq(
      ("default", None, None),
      ("p1024", Some("1024"), None),
      ("p1024_nopf", Some("1024"), Some("false")),
      ("p256", Some("256"), None))
    // results(arm)(query) = list of rep times
    val results = arms.map { case (label, _, _) =>
      label -> Family.map(q => q -> scala.collection.mutable.ListBuffer[Double]()).toMap
    }.toMap

    (1 to reps).foreach { _ =>
      arms.foreach { case (label, conf, pf) =>
        conf match {
          case Some(v) => spark.conf.set(ConfKey, v)
          case None    => spark.conf.unset(ConfKey)
        }
        pf match {
          case Some(v) => spark.conf.set(PfKey, v)
          case None    => spark.conf.unset(PfKey)
        }
        Family.foreach { q =>
          // fresh fixture dir per (arm, rep): x26 must pay its brute-force
          // ground truth every time here — the regression being attributed
          // was measured pre-cache, so the probe measures the same thing
          sys.props("graft.fixture.dir") =
            s"/tmp/probe_x26_fixtures/$boot-$label-${System.nanoTime()}"
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache()
          results(label)(q) += dt
        }
      }
    }
    spark.stop()
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val armsJson = arms.map { case (label, _, _) =>
      val qs = Family.map { q =>
        s"\"$q\":[" + results(label)(q).map(fmt).mkString(",") + "]"
      }.mkString(",")
      s"\"$label\":{$qs}"
    }.mkString(",")
    println(s"""{"boot":"$boot","sf":"$sfDir","reps":$reps,"arms":{$armsJson}}""")
  }
}
