package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{Sessions, SparkEntry}

/** Dev probe (round-16 verdict ask #2): attribute the x56/x57 sf1-only
  * elevation STRUCTURALLY. Four boots across two sessions read the pair
  * 1.4–1.9× its r14 sf1 values while the SAME binary+data read in-band at
  * sf3 and sf0.1 — uniform VM load cannot explain a single-scale effect,
  * so the hypothesis space is AQE partition decisions whose shape differs
  * at sf1's shuffle sizes (bytes-based coalescing serializing a CPU-heavy,
  * byte-light stage) vs sf3's.
  *
  * Design ([[ProbeX26]]'s interleaved-arm stance, plus telemetry): per rep
  * the probe runs each (query × scale × arm) cell — arms are AQE
  * partition-decision variants — interleaved so VM swell hits all cells
  * equally, and a stage listener records per-stage task count, executor
  * run/CPU time, shuffle read/write bytes and spill. If the default arm's
  * heavy stages at sf1 run on few tasks (bytes-coalesced below the 32-core
  * parallelism) while sf3's run wide, the elevation is attributed and the
  * fix is a partition-size advisory, not a re-band.
  *
  * Output: one JSON line per invocation with per-run wall seconds and the
  * top stages by executor run time. Aggregate into
  * `BENCH_x56_probe_r16.json` (dev artifact).
  *
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=2 \
  *        sbt -batch "runMain graft.tools.ProbeX56Sf1 <bootLabel>"
  */
object ProbeX56Sf1 {

  private case class StageRow(id: Int, tasks: Int, runMs: Long, cpuMs: Long,
      shReadMb: Double, shWriteMb: Double, spillMb: Double, name: String)

  def main(args: Array[String]): Unit = {
    val boot = args.headOption.getOrElse("b0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption)
      .getOrElse(2)
    val scales = Seq(
      "sf1" -> sys.env.getOrElse("SPARK_GRAFT_SF1", "/tmp/sfgen/sf1"),
      "sf3" -> sys.env.getOrElse("SPARK_GRAFT_SF3", "/tmp/sfgen/sf3"))
    val queries = Seq("x56_funnel_neardup", "x57_cluster_split")
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ListBuffer[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo; val tm = si.taskMetrics
        stages.synchronized {
          stages += StageRow(si.stageId, si.numTasks, tm.executorRunTime,
            tm.executorCpuTime / 1000000L,
            tm.shuffleReadMetrics.totalBytesRead / 1e6,
            tm.shuffleWriteMetrics.bytesWritten / 1e6,
            (tm.memoryBytesSpilled + tm.diskBytesSpilled) / 1e6,
            si.name.replaceAll("[\"\\\\]", "").take(60))
        }
      }
    })

    // Bench-identical warm-up: session/codegen/scan init off the clock
    spark.range(1000000).selectExpr("sum(id)").collect()
    scales.foreach { case (_, dir) =>
      spark.read.parquet(s"$dir/documents.parquet").count() }

    // arm = AQE partition-decision variant: shipped default; a finer
    // coalesce advisory (8 MB — more post-shuffle tasks for byte-light
    // CPU-heavy stages); coalescing disabled outright (stages keep the
    // full initialPartitionNum width)
    val arms: Seq[(String, Map[String, String])] = Seq(
      ("default", Map.empty),
      ("adv8m",
        Map("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")),
      ("nocoal",
        Map("spark.sql.adaptive.coalescePartitions.enabled" -> "false")))

    val runs = scala.collection.mutable.ListBuffer[String]()
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    (1 to reps).foreach { rep =>
      arms.foreach { case (label, conf) =>
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        scales.foreach { case (sfLabel, dir) =>
          queries.foreach { q =>
            stages.synchronized(stages.clear())
            val t0 = System.nanoTime()
            SparkEntry.queries(q)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            spark.catalog.clearCache()
            val top = stages.synchronized(
              stages.sortBy(-_.runMs).take(8).toList)
            val sj = top.map(s =>
              s"""{"tasks":${s.tasks},"runMs":${s.runMs},""" +
              s""""cpuMs":${s.cpuMs},"shReadMb":${fmt(s.shReadMb)},""" +
              s""""shWriteMb":${fmt(s.shWriteMb)},""" +
              s""""spillMb":${fmt(s.spillMb)},"name":"${s.name}"}""")
              .mkString(",")
            val nStages = stages.synchronized(stages.size)
            val nTasks = stages.synchronized(stages.map(_.tasks).sum)
            runs += s"""{"rep":$rep,"arm":"$label","sf":"$sfLabel",""" +
              s""""q":"$q","sec":${fmt(sec)},"n_stages":$nStages,""" +
              s""""n_tasks":$nTasks,"top_stages":[$sj]}"""
          }
        }
        conf.keys.foreach(spark.conf.unset)
      }
    }
    spark.stop()
    // single line: the probe contract is one JSON line on stdout
    println(s"""{"boot":"$boot","reps":$reps,""" +
      s""""runs":[${runs.mkString(",")}]}""")
  }
}
