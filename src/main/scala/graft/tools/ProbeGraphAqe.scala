package graft.tools

import graft.SparkEntry

/** Dev probe (VERDICT r17 #5): measure the graph fixpoint trio with AQE on
  * vs off — the judge asked whether per-iteration AQE stage materialization
  * dominates the trio's job count. Reports wall + job count per rep per arm.
  *
  * Usage: runMain graft.tools.ProbeGraphAqe <sfDir> <reps> <query> [query...]
  */
object ProbeGraphAqe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeGraphAqe <sfDir> <reps> <query>...")
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          synchronized { jobs += 1 }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (aqe <- Seq("true", "false"); name <- names) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        jobs = 0
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        println(f"== $name aqe=$aqe rep$rep wall=$wall%6.2fs jobs=$jobs")
      }
    }
    spark.stop()
  }
}
