package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (session startup dominates test time). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // built through the engine's defaults object so every suite exercises
    // the configuration users get (AQE skew split, UTC, nanos-as-long)
    val s = Sessions.localBuilder("4")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.spark
}
