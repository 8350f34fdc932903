package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Enrich, Grouping, Ingest}

/** Structured-Streaming ingest (SURVEY §7.6, optional extension).
  *
  * The reference is micro-incremental batch (SURVEY §2.9): groups processed
  * sequentially with per-group progress writes — no event time, no watermarks.
  * The streaming flavor therefore reuses the BATCH operators verbatim inside
  * `foreachBatch`: each micro-batch of newly-arrived files is grouped,
  * enriched, and appended, and progress falls out of the StreamingQuery
  * listener — the Spark-native replacement for the reference's
  * write-meta-after-every-group loop (/root/reference/worker.py:352-353).
  */
object StreamingIngest {

  /** File-source stream of the engine's file relation. `maxFilesPerTrigger`
    * is the reference's throttling knob re-expressed (its 0.2 s sleep,
    * worker.py:355, becomes a declarative rate limit).
    */
  def fileStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame = {
    val raw = spark.readStream
      .format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))))
      .load(dir)
    Ingest.withPayload(Ingest.fromBinaryRelation(raw, dir))
  }

  /** Runs the batch pipeline per micro-batch and appends results to
    * `resultsDir` as parquet. Returns the running query; callers stop it or
    * await termination.
    */
  def enrichStream(files: DataFrame, cfg: Enrich.JobConfig, resultsDir: String,
      checkpointDir: String,
      clientFactory: () => Enrich.ModelClient = () => new Enrich.MockModelClient(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val groups = Grouping.buildGroups(batch, groupBySubfolder = true)
          val results = Enrich.enrich(groups, clientFactory, cfg)
            .withColumn("batch_id", lit(batchId))
          results.write.mode("append").parquet(resultsDir)
        }
        ()
      }
      .start()
}
