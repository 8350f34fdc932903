package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S9 — the external enrichment operator (the LLM call of the reference,
  * /root/reference/worker.py:295-349), the engine's only side-effecting op.
  *
  * Design (SURVEY §2.10): a pluggable [[ModelClient]] applied via
  * `mapPartitions` — never a SQL-registered UDF (side effects, latency,
  * non-determinism) — so one client/connection is built per partition and the
  * group's whole file list is local to one executor (the grouping shuffle
  * already co-located it). Failures become data rows ("ERROR: …"), never task
  * failures (/root/reference/worker.py:342-344), which also keeps Spark task
  * retries from double-counting: counters are derived from the result table,
  * not executor-side mutation (SURVEY §7.4.5).
  */
object Enrich {

  /** One prompt part: `{type:"text", text}` or `{type:"image_url", url}`
    * (/root/reference/worker.py:69-98).
    */
  case class ContentPart(partType: String, body: String)

  case class ModelRequest(
      seq: Long,
      groupId: String,
      model: String,
      systemPrompt: String,
      reasoningMode: String, // off | true | false (app.py:693-695)
      parts: Seq[ContentPart])

  /** `usageJson` carries the provider's usage struct (graft.model.Schemas.usage). */
  case class ModelResponse(content: String, usageJson: String)

  /** The pluggable boundary. Implementations may throw — the operator converts
    * any throw into an ERROR data row.
    */
  trait ModelClient extends Serializable {
    def complete(req: ModelRequest): ModelResponse
  }

  /** Deterministic offline client used by tests, bench, and the oracle queries.
    *
    * Reply and usage are pure functions of the request, and deliberately
    * SQL-expressible (sha256 + length arithmetic) so the DuckDB oracle can
    * verify the FULL pipeline end-to-end:
    *   reply  = "[mock:<model>] group=<id> files=<n> sha256=<hex>"
    *   hex    = sha256(parts joined with "\n---\n", UTF-8)
    *   prompt_tokens     = ceil((len(system) + Σ len(part)) / 4)
    *   completion_tokens = ceil(len(reply) / 4)
    *   cost              = total_tokens * 1e-6
    *   is_byok           = seq % 7 == 0
    */
  final class MockModelClient(failEvery: Long = 0L) extends ModelClient {
    override def complete(req: ModelRequest): ModelResponse = {
      if (failEvery > 0 && req.seq % failEvery == 0)
        throw new RuntimeException(s"mock failure for seq=${req.seq}")
      val joined = req.parts.map(_.body).mkString("\n---\n")
      val digest = MessageDigest.getInstance("SHA-256")
        .digest(joined.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val reply = s"[mock:${req.model}] group=${req.groupId} files=${req.parts.size} sha256=$digest"
      val promptChars = req.systemPrompt.length.toLong + req.parts.map(_.body.length.toLong).sum
      val promptTokens = (promptChars + 3) / 4
      val completionTokens = (reply.length.toLong + 3) / 4
      val totalTokens = promptTokens + completionTokens
      val cost = totalTokens * 1e-6
      val isByok = req.seq % 7 == 0
      val usage =
        s"""{"prompt_tokens":$promptTokens,"completion_tokens":$completionTokens,""" +
          s""""total_tokens":$totalTokens,"cost":$cost,"is_byok":$isByok,""" +
          """"prompt_tokens_details":{"cached_tokens":0,"cache_write_tokens":0,"audio_tokens":0,"video_tokens":0},""" +
          """"completion_tokens_details":{"reasoning_tokens":0,"audio_tokens":0,"image_tokens":0},""" +
          """"cost_details":{"upstream_inference_cost":0.0,"upstream_inference_prompt_cost":0.0,"upstream_inference_completions_cost":0.0}}"""
      ModelResponse(reply, usage)
    }
  }

  /** Row shapes for the typed mapPartitions hop (public: Spark's generated
    * encoder projections cannot access private classes).
    */
  case class GFile(rel_path: String, file_name: String, file_type: String,
      file_size: Long, kind: Option[String], payload: Option[String])
  case class GroupIn(seq: Long, group_id: String, is_folder: Boolean,
      n_files: Long, files: Option[Seq[GFile]])
  case class ResultOut(seq: Long, group_id: String, is_folder: Boolean,
      output: String, error: Option[String], usage_json: Option[String])

  case class JobConfig(
      model: String = "mock-model",
      systemPrompt: String = "",
      customFooter: String = "",
      reasoningMode: String = "off")

  /** Builds the reference's user-content parts for one group
    * (/root/reference/worker.py:69-98): text files become one labeled text part;
    * images become a "Please analyze image: …" text part plus an image_url part.
    */
  private def buildParts(g: GroupIn): Seq[ContentPart] = {
    val labelFiles = g.is_folder || g.n_files > 1
    g.files.getOrElse(Nil).flatMap { f =>
      f.kind match {
        case Some("text") =>
          val text = f.payload.getOrElse("")
          val body = if (labelFiles) s"File: ${f.rel_path}\n$text" else text
          Seq(ContentPart("text", body))
        case Some("image") =>
          val label = if (labelFiles) f.rel_path else f.file_name
          Seq(
            ContentPart("text", s"Please analyze image: $label"),
            ContentPart("image_url", f.payload.getOrElse("")))
        case _ => Nil // unsupported extension: skipped (worker.py:74-96)
      }
    }
  }

  /** groups: output of [[Grouping.buildGroups]] (with payloads,
    * [[Ingest.withPayload]] applied before grouping). Returns the results
    * relation `(seq, group_id, is_folder, output, error, usage_json)`.
    *
    * `clientFactory` is invoked once per partition (connection reuse without
    * sharing a client across executors).
    */
  def enrich(groups: DataFrame, clientFactory: () => ModelClient, cfg: JobConfig): DataFrame = {
    val spark = groups.sparkSession
    import spark.implicits._
    val in: Dataset[GroupIn] = groups
      .select(col("seq"), col("group_id"), col("is_folder"), col("n_files"), col("files"))
      .as[GroupIn]

    val out = in.mapPartitions { it =>
      lazy val client = clientFactory()
      it.map { g =>
        if (g.files.isEmpty || g.files.exists(_.isEmpty))
          ResultOut(g.seq, g.group_id, g.is_folder, "Empty folder", None, None)
        else {
          val parts = buildParts(g)
          if (parts.isEmpty)
            ResultOut(g.seq, g.group_id, g.is_folder, "Unsupported file type", None, None)
          else {
            val req = ModelRequest(g.seq, g.group_id, cfg.model, cfg.systemPrompt,
              cfg.reasoningMode, parts)
            try {
              val resp = client.complete(req)
              ResultOut(g.seq, g.group_id, g.is_folder, resp.content, None, Some(resp.usageJson))
            } catch {
              case e: Exception =>
                // getMessage can be null (bare NPE): a Some(null) error column
                // serializes as NULL and escapes the failed_requests counter
                val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
                ResultOut(g.seq, g.group_id, g.is_folder, s"ERROR: $msg",
                  Some(msg), None)
            }
          }
        }
      }
    }
    // Footer is appended only to successful replies (worker.py:341,346-347).
    out.toDF()
      .withColumn("output",
        when(col("usage_json").isNotNull,
          Scalars.appendFooter(col("output"), lit(cfg.customFooter)))
          .otherwise(col("output")))
  }
}
