package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

import graft.SparkEntry

/** Dev profiler: run named queries (noop sink, engine session defaults) with a
  * listener that aggregates per-run job/stage counts, summed task time and the
  * slowest stages — separates "compute-bound" (task time ≈ wall × cores) from
  * "overhead-bound" (many tiny jobs/stages, wall dominated by planning,
  * codegen and scheduling) so optimization effort lands on the right layer.
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <reps> <query> [query...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProfileQuery <sfDir> <reps> <query>...")
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long)]() // id,name,runMs,nTasks,wallMs
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime
        val wall = (for { a <- si.submissionTime; b <- si.completionTime } yield b - a).getOrElse(0L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), run, si.numTasks, wall))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // global warm-up mirrors Bench
    spark.range(1000000).selectExpr("sum(id)").collect()

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      (1 to reps).foreach { rep =>
        listener.synchronized { jobs = 0; stages.clear() }
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        Thread.sleep(200) // let stage-completed events drain
        val (nStages, taskMs, stageWallMs) = listener.synchronized {
          (stages.size, stages.map(_._3).sum, stages.map(_._5).sum)
        }
        println(f"== $name rep$rep wall=$wall%7.2fs jobs=$jobs stages=$nStages " +
          f"taskTime=${taskMs / 1e3}%7.2fs stageWall=${stageWallMs / 1e3}%7.2fs")
        if (rep == reps) {
          val top = listener.synchronized {
            stages.sortBy(-_._5).take(12).toVector }
          top.foreach { case (id, nm, run, nt, wl) =>
            println(f"   stage$id%-5d wall=${wl / 1e3}%6.2fs task=${run / 1e3}%7.2fs n=$nt%-4d $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
