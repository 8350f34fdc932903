package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** A4 — the 19-field cost-summary rollup (/root/reference/worker.py:110-176).
  *
  * One global hash aggregation over the enriched results table (map-side partials
  * make this a single narrow shuffle at any scale). Counters are derived from the
  * data — `successful_requests` = rows with usage, `failed_requests` = rows with
  * an error — rather than executor-side mutation, so Spark task retries can never
  * inflate them (SURVEY §7.4.5). Missing/non-numeric usage fields count as 0,
  * mirroring the reference's silent skip (worker.py:153-159,167-172).
  *
  * Precision: the reference re-rounds the float accumulator to 12 dp after every
  * step (worker.py:171); a parallel engine has no step order, so the engine sums
  * then rounds once to 12 dp — documented deviation, same 12-dp observable.
  */
object CostAgg {

  def summarize(results: DataFrame, costUnit: String = "USD"): DataFrame = {
    val u = from_json(col("usage_json"), Schemas.usage)
    def tok(path: Column) = sum(coalesce(path, lit(0L)))
    def money(path: Column) = round(sum(coalesce(path, lit(0.0))), 12)

    results
      .withColumn("u", u)
      .agg(
        count(when(col("usage_json").isNotNull || col("error").isNotNull, 1)).as("api_requests"),
        count(col("usage_json")).as("successful_requests"),
        count(col("error")).as("failed_requests"),
        count(when(col("u.is_byok") === true, 1)).as("byok_requests"),
        tok(col("u.prompt_tokens")).as("prompt_tokens"),
        tok(col("u.completion_tokens")).as("completion_tokens"),
        tok(col("u.total_tokens")).as("total_tokens"),
        tok(col("u.completion_tokens_details.reasoning_tokens")).as("reasoning_tokens"),
        tok(col("u.prompt_tokens_details.cached_tokens")).as("cached_tokens"),
        tok(col("u.prompt_tokens_details.cache_write_tokens")).as("cache_write_tokens"),
        tok(col("u.prompt_tokens_details.audio_tokens")).as("input_audio_tokens"),
        tok(col("u.prompt_tokens_details.video_tokens")).as("input_video_tokens"),
        tok(col("u.completion_tokens_details.audio_tokens")).as("output_audio_tokens"),
        tok(col("u.completion_tokens_details.image_tokens")).as("output_image_tokens"),
        money(col("u.cost")).as("total_cost"),
        money(col("u.cost_details.upstream_inference_cost")).as("upstream_inference_cost"),
        money(col("u.cost_details.upstream_inference_prompt_cost")).as("upstream_inference_prompt_cost"),
        money(col("u.cost_details.upstream_inference_completions_cost")).as("upstream_inference_completions_cost"))
      .withColumn("cost_unit", lit(costUnit))
  }

  /** A5 — progress counters `{processed, total}` (/root/reference/worker.py:352-353,
    * app.py:938-948). Batch flavor: observe() metrics on the results stream keep
    * this allocation-free; this helper is the final snapshot.
    */
  def progress(results: DataFrame, totalGroups: Long): DataFrame = {
    val spark = results.sparkSession
    import spark.implicits._
    Seq((results.count(), totalGroups)).toDF("processed", "total")
  }

  /** A5, zero-extra-pass flavor: attach an `Observation` to the results plan.
    * The counters ride along with whatever action consumes the results (no
    * second scan — the Spark-native replacement for the reference's
    * write-meta-after-every-group loop); read them with `observation.get`
    * after the action completes.
    */
  def observedProgress(results: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = results.observe(obs,
      count(lit(1)).as("processed"),
      count(col("usage_json")).as("successful"),
      count(col("error")).as("failed"))
    (observed, obs)
  }
}
