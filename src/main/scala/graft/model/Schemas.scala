package graft.model

import org.apache.spark.sql.types._

/** Core relation shapes of the engine (SURVEY.md §1).
  *
  * The reference (ValRCS/openrouter_batch_processor) is row-oriented Python with
  * inferred schemas; here every relation has an explicit StructType / case class so
  * Catalyst can prune and push down. Evidence lines cite the reference read-only
  * checkout at /root/reference.
  */
object Schemas {

  /** One ingested file (reference: `_collect_input_rows`, worker.py:52-67 plus the
    * raw bytes read at worker.py:77-94). `seq` is our explicit order column — Spark
    * has no implicit row order, the reference leans on sorted-relpath list order
    * (worker.py:20,25,66).
    */
  val fileRow: StructType = StructType(Seq(
    StructField("rel_path", StringType, nullable = false),
    StructField("file_name", StringType, nullable = false),
    StructField("file_type", StringType, nullable = false), // ".txt" | ".md" | ... | "unknown"
    StructField("file_size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("modified_ts", TimestampType, nullable = true)
  ))

  /** One prompt group (reference: `_build_groups`, worker.py:23-50). */
  val groupRow: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("group_id", StringType, nullable = false),
    StructField("is_folder", BooleanType, nullable = false),
    StructField("files", ArrayType(fileRow, containsNull = false), nullable = false)
  ))

  /** One result row (reference: rows.append({"file": ..., "output": ...}),
    * worker.py:300,310,349) + enrichment telemetry used by the cost rollup.
    */
  val resultRow: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("group_id", StringType, nullable = false),
    StructField("is_folder", BooleanType, nullable = false),
    StructField("output", StringType, nullable = false),
    StructField("error", StringType, nullable = true),
    StructField("usage_json", StringType, nullable = true)
  ))

  /** The `usage` struct of one model response (reference consumes these fields at
    * worker.py:133-176; shape documented in FIXTURES.md §1.4).
    */
  val usage: StructType = StructType(Seq(
    StructField("prompt_tokens", LongType),
    StructField("completion_tokens", LongType),
    StructField("total_tokens", LongType),
    StructField("cost", DoubleType),
    StructField("is_byok", BooleanType),
    StructField("prompt_tokens_details", StructType(Seq(
      StructField("cached_tokens", LongType),
      StructField("cache_write_tokens", LongType),
      StructField("audio_tokens", LongType),
      StructField("video_tokens", LongType)
    ))),
    StructField("completion_tokens_details", StructType(Seq(
      StructField("reasoning_tokens", LongType),
      StructField("audio_tokens", LongType),
      StructField("image_tokens", LongType)
    ))),
    StructField("cost_details", StructType(Seq(
      StructField("upstream_inference_cost", DoubleType),
      StructField("upstream_inference_prompt_cost", DoubleType),
      StructField("upstream_inference_completions_cost", DoubleType)
    )))
  ))
}

/** Content-addressed store index entry (reference: app.py:227-238). */
case class RegistryEntry(
    zip_name: String,
    zip_sha256: String,
    content_sha256: String,
    size_bytes: Long,
    created_at: String, // "yyyy-MM-dd HH:mm:ss" — the reference stores formatted strings
    source: String // existing | uploaded | folder
)

/** Job configuration + status document (reference: meta dict, app.py:768-795). */
case class JobMeta(
    job_id: String,
    system_prompt: String,
    username: String,
    custom_footer: String,
    model: String,
    reasoning_mode: String, // off | true | false
    submitted_at: String,
    group_by_subfolder: Boolean,
    separate_outputs: Boolean,
    output_formats: Seq[String], // ⊆ {text, csv, json}
    include_metadata: Boolean,
    save_concat_results: Boolean,
    input_source: String, // folder | existing | uploaded
    source_route: String // index | marc
)

/** The 19-field cost rollup (reference: `_new_cost_summary`, worker.py:110-131). */
case class CostSummary(
    cost_unit: String,
    api_requests: Long,
    successful_requests: Long,
    failed_requests: Long,
    byok_requests: Long,
    prompt_tokens: Long,
    completion_tokens: Long,
    total_tokens: Long,
    reasoning_tokens: Long,
    cached_tokens: Long,
    cache_write_tokens: Long,
    input_audio_tokens: Long,
    input_video_tokens: Long,
    output_audio_tokens: Long,
    output_image_tokens: Long,
    total_cost: Double,
    upstream_inference_cost: Double,
    upstream_inference_prompt_cost: Double,
    upstream_inference_completions_cost: Double
)
