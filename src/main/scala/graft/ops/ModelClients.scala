package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import graft.ops.Enrich.{ContentPart, ModelClient, ModelRequest, ModelResponse}

/** Production [[Enrich.ModelClient]] implementations. The operator stays the
  * same `mapPartitions` hop regardless of client — tests/bench/oracle use the
  * deterministic mock, deployments plug one of these in.
  */
object ModelClients {

  /** Token-bucket rate limiter wrapping any client (SURVEY §2.9: the
    * reference's fixed 0.2 s sleep between groups, worker.py:355, re-expressed
    * as a declarative rate). The bucket is LOCAL to this client instance, and
    * the enrich operator builds one client per partition — so the cluster-wide
    * rate is `permitsPerSecond × concurrent tasks`; size it as
    * `globalBudget / expected parallelism`.
    *
    * `burst` permits accumulate while idle, so short gaps don't waste quota.
    */
  final class RateLimitedClient(inner: ModelClient, permitsPerSecond: Double,
      burst: Double = 1.0) extends ModelClient {
    require(permitsPerSecond > 0)
    private var allowance = math.max(burst, 1.0)
    private var lastNanos = System.nanoTime()

    override def complete(req: ModelRequest): ModelResponse = {
      this.synchronized {
        val now = System.nanoTime()
        allowance = math.min(math.max(burst, 1.0),
          allowance + (now - lastNanos) / 1e9 * permitsPerSecond)
        lastNanos = now
        if (allowance < 1.0) {
          val waitMs = ((1.0 - allowance) / permitsPerSecond * 1000).toLong + 1
          Thread.sleep(waitMs)
          val after = System.nanoTime()
          allowance = math.min(math.max(burst, 1.0),
            allowance + (after - lastNanos) / 1e9 * permitsPerSecond)
          lastNanos = after
        }
        allowance -= 1.0
      }
      inner.complete(req)
    }
  }

  /** Chat-completions HTTP client (the reference's call,
    * /root/reference/worker.py:313-344): POST `{model, messages:[system,user],
    * reasoning?}` with bearer auth and a 120 s timeout; extracts
    * `choices[0].message.content` + `usage`. Exceptions propagate — the
    * enrich operator converts them to ERROR data rows, mirroring the
    * reference's error-as-data semantics.
    *
    * The payload/extract logic is exposed for tests; no network happens until
    * `complete` runs.
    */
  final class HttpModelClient(endpoint: String, apiKey: String,
      timeoutSeconds: Long = 120L) extends ModelClient {

    @transient private lazy val http = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSeconds)).build()

    override def complete(req: ModelRequest): ModelResponse = {
      val body = HttpModelClient.buildPayload(req)
      val httpReq = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(Duration.ofSeconds(timeoutSeconds))
        .header("Authorization", s"Bearer $apiKey")
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
        .build()
      val resp = http.send(httpReq, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      HttpModelClient.extractResponse(resp.body())
    }
  }

  object HttpModelClient {

    private def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    private def partJson(p: ContentPart): String = p.partType match {
      case "image_url" =>
        s"""{"type":"image_url","image_url":{"url":${jstr(p.body)}}}"""
      case _ =>
        s"""{"type":"text","text":${jstr(p.body)}}"""
    }

    /** The reference's request shape (worker.py:313-321): system message, user
      * content parts, optional `reasoning`. The reference normalizes the mode
      * via strip().lower() and whitelists only {"true","false"}
      * (worker.py:321-322) — anything else (including "off", "on", "True ")
      * omits the key entirely, so a stray value can never corrupt the JSON.
      */
    def buildPayload(req: ModelRequest): String = {
      val parts = req.parts.map(partJson).mkString("[", ",", "]")
      val reasoning = Option(req.reasoningMode).map(_.trim.toLowerCase) match {
        case Some(m @ ("true" | "false")) => s""","reasoning":{"enabled":$m}"""
        case _ => ""
      }
      s"""{"model":${jstr(req.model)},"messages":[""" +
        s"""{"role":"system","content":${jstr(req.systemPrompt)}},""" +
        s"""{"role":"user","content":$parts}]$reasoning}"""
    }

    /** `choices[0].message.content` + the raw `usage` object
      * (worker.py:332-340); missing content → error row upstream.
      */
    def extractResponse(body: String): ModelResponse = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val parsed = JsonMethods.parse(body)
      val content = parsed \ "choices" match {
        case JArray(first :: _) => first \ "message" \ "content" match {
          case JString(s) => s
          case _ => throw new RuntimeException("no message content in response")
        }
        case _ => throw new RuntimeException("no choices in response")
      }
      val usage = parsed \ "usage" match {
        case JNothing => "{}"
        case u => JsonMethods.compact(JsonMethods.render(u))
      }
      ModelResponse(content, usage)
    }
  }
}
