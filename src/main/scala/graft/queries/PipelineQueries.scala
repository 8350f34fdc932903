package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.{CostAgg, Enrich}
import graft.pipeline.BatchJob

/** End-to-end pipeline queries: the full flagship DAG (ingest → group → mock
  * enrich → cost rollup) run against the synthetic `documents` table, with the
  * DuckDB oracle reconstructing the deterministic MockModelClient algebra
  * (sha256 + length arithmetic — see Enrich.MockModelClient's scaladoc) from
  * first principles. These verify the REAL operators (Grouping.buildGroups,
  * Enrich.enrich via mapPartitions, CostAgg.summarize), not query-shaped
  * re-implementations.
  */
object PipelineQueries {

  /** Mock-reply construction shared by both pipeline oracles. */
  private val mockCte =
    """WITH parts AS (
         SELECT source || '/' AS group_id,
                'File: ' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' || chr(10) || text AS body,
                source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS rel_path
         FROM documents
       ), grouped AS (
         SELECT group_id,
                string_agg(body, chr(10) || '---' || chr(10) ORDER BY rel_path) AS joined,
                count(*) AS n,
                sum(length(body)) AS prompt_chars
         FROM parts GROUP BY group_id
       ), replied AS (
         SELECT CAST(row_number() OVER (ORDER BY group_id) AS BIGINT) AS seq, group_id,
                '[mock:mock-model] group=' || group_id || ' files=' || CAST(n AS VARCHAR)
                  || ' sha256=' || sha256(joined) AS output,
                CAST((prompt_chars + 3) // 4 AS BIGINT) AS prompt_tokens
         FROM grouped
       ), usage AS (
         SELECT seq, group_id, output, prompt_tokens,
                CAST((length(output) + 3) // 4 AS BIGINT) AS completion_tokens,
                CAST(prompt_tokens + (length(output) + 3) // 4 AS BIGINT) AS total_tokens
         FROM replied
       )"""

  private def q21Enrich(s: SparkSession, dir: String): DataFrame = {
    val res = BatchJob.flagship(s, dir)
    val u = from_json(col("usage_json"), Schemas.usage)
    res.select(col("seq"), col("group_id"), col("output"),
      u.getField("prompt_tokens").as("prompt_tokens"),
      u.getField("completion_tokens").as("completion_tokens"),
      u.getField("total_tokens").as("total_tokens"),
      u.getField("cost").as("cost"))
  }

  private val q21Sql = mockCte +
    """SELECT seq, group_id, output, prompt_tokens, completion_tokens, total_tokens,
              total_tokens * 1e-6 AS cost
       FROM usage"""

  private def q22CostSummary(s: SparkSession, dir: String): DataFrame =
    CostAgg.summarize(BatchJob.flagship(s, dir))

  private val q22Sql = mockCte +
    """SELECT count(*) AS api_requests,
              count(*) AS successful_requests,
              CAST(0 AS BIGINT) AS failed_requests,
              count(CASE WHEN seq % 7 = 0 THEN 1 END) AS byok_requests,
              CAST(sum(prompt_tokens) AS BIGINT) AS prompt_tokens,
              CAST(sum(completion_tokens) AS BIGINT) AS completion_tokens,
              CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
              CAST(0 AS BIGINT) AS reasoning_tokens,
              CAST(0 AS BIGINT) AS cached_tokens,
              CAST(0 AS BIGINT) AS cache_write_tokens,
              CAST(0 AS BIGINT) AS input_audio_tokens,
              CAST(0 AS BIGINT) AS input_video_tokens,
              CAST(0 AS BIGINT) AS output_audio_tokens,
              CAST(0 AS BIGINT) AS output_image_tokens,
              round(sum(total_tokens * 1e-6), 12) AS total_cost,
              CAST(0.0 AS DOUBLE) AS upstream_inference_cost,
              CAST(0.0 AS DOUBLE) AS upstream_inference_prompt_cost,
              CAST(0.0 AS DOUBLE) AS upstream_inference_completions_cost,
              'USD' AS cost_unit
       FROM usage"""

  /** Q27 — the END-TO-END artifact chain (ingest → group → enrich → footer →
    * renumber → concat), hashed: one row holding the sha256 + byte length of
    * the exact bytes `Sinks.writeConcatenatedResults` (K4) streams to disk,
    * built relationally (renumber per line, seq-ordered join with "\n") so the
    * driver's DuckDB oracle can pin the whole sink path — not just its unit
    * pieces (q13 renumber, q17 footer) — byte for byte. The final assembly is
    * a single-row aggregate over GROUP-scale rows (one line per group), which
    * is exactly the sink's own cardinality; the corpus-scale work stays in
    * the distributed pipeline underneath.
    */
  private def q27Artifact(s: SparkSession, dir: String): DataFrame = {
    val res = BatchJob.flagship(s, dir,
      Enrich.JobConfig(customFooter = "-- processed by graft"))
    val lines = res.select(col("seq"),
      graft.ops.Scalars.renumberToken(col("output"), col("seq")).as("line"))
    lines
      .agg(count(lit(1)).as("n_lines"),
        array_join(
          transform(array_sort(collect_list(struct(col("seq"), col("line")))),
            x => x.getField("line")), "\n").as("__artifact"))
      .select(col("n_lines"),
        length(encode(col("__artifact"), "UTF-8")).as("artifact_bytes"),
        sha2(encode(col("__artifact"), "UTF-8"), 256).as("artifact_sha256"))
  }

  private val q27Sql = mockCte +
    """, lines AS (
         SELECT seq,
                replace(output || chr(10) || '-- processed by graft',
                        '000000001',
                        lpad(CAST(seq AS VARCHAR), 9, '0')) AS line
         FROM usage)
       SELECT CAST(count(*) AS BIGINT) AS n_lines,
              CAST(strlen(string_agg(line, chr(10) ORDER BY seq)) AS INTEGER) AS artifact_bytes,
              sha256(string_agg(line, chr(10) ORDER BY seq)) AS artifact_sha256
       FROM lines"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_pipeline_enrich" -> q21Enrich _,
    "q22_pipeline_cost_summary" -> q22CostSummary _,
    "q27_pipeline_artifact" -> q27Artifact _
  )

  val oracleSql: Map[String, String] = Map(
    "q21_pipeline_enrich" -> q21Sql,
    "q22_pipeline_cost_summary" -> q22Sql,
    "q27_pipeline_artifact" -> q27Sql
  )
}
