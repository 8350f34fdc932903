package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O3/A7/A8/F7 — the jobs-archive query (/root/reference/app.py:950-1089): the
  * reference's closest thing to a real relational query (scan → derive → sort).
  */
object Archive {

  /** A8 — 3-way status derivation (app.py:990-1001): running flag beats meta
    * status beats artifact existence.
    */
  def statusColumn(isRunning: Column, inputStatus: Column, hasResultsZip: Column): Column =
    when(isRunning, "Running")
      .when(inputStatus === "error", "Failed")
      .when(hasResultsZip, "Finished")
      .otherwise("Unknown")

  /** O3 — user-keyed archive sort with the reference's null semantics
    * (app.py:1038-1081): missing string keys sort last in both directions
    * (the reference pads with a "~~~~" sentinel asc / -inf desc); elapsed is
    * parsed to seconds (F7) with malformed → last. Emits a dense `rank` so the
    * order survives order-insensitive comparison.
    */
  def sortedArchive(jobs: DataFrame, sortKey: String, descending: Boolean): DataFrame = {
    val key: Column = sortKey match {
      case "elapsed_time" => Scalars.parseElapsedSeconds(col("elapsed_time"))
      case "submitted_at" => Scalars.parseTs(col("submitted_at"))
      case other => col(other)
    }
    SeqNumber.withGlobalSeq(
      jobs.withColumn("__sort_key", key), "rank",
      if (descending) col("__sort_key").desc_nulls_last else col("__sort_key").asc_nulls_last,
      col("job_id"))
      .drop("__sort_key")
      .withColumn("rank", col("rank").cast("int"))
  }
}
