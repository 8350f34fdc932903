package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Enrich.{ContentPart, ModelRequest}
import graft.ops.ModelClients.{HttpModelClient, RateLimitedClient}

class ModelClientsSpec extends AnyFunSuite {

  private def req(parts: ContentPart*) = ModelRequest(1L, "g/", "m-1",
    "sys \"prompt\"\nline2", "off", parts)

  test("rate limiter enforces a lower bound on elapsed time") {
    val mock = new Enrich.MockModelClient()
    val limited = new RateLimitedClient(mock, permitsPerSecond = 100.0)
    val t0 = System.nanoTime()
    (1 to 10).foreach(_ => limited.complete(req(ContentPart("text", "x"))))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 10 requests at 100/s with burst 1 → at least ~90ms of pacing
    assert(elapsedMs >= 80, s"elapsed ${elapsedMs}ms")
    // and it delegates faithfully
    assert(limited.complete(req(ContentPart("text", "x"))).content ==
      mock.complete(req(ContentPart("text", "x"))).content)
  }

  test("payload matches the reference request shape (worker.py:313-321)") {
    val p = HttpModelClient.buildPayload(req(
      ContentPart("text", "File: a.txt\nhello"),
      ContentPart("image_url", "data:image/png;base64,AAAA")))
    assert(p.startsWith("""{"model":"m-1","messages":[{"role":"system","content":"sys \"prompt\"\nline2"},"""))
    assert(p.contains("""{"type":"text","text":"File: a.txt\nhello"}"""))
    assert(p.contains("""{"type":"image_url","image_url":{"url":"data:image/png;base64,AAAA"}}"""))
    assert(!p.contains("reasoning")) // mode "off" omits the key (app.py:693-695)
    val withReasoning = HttpModelClient.buildPayload(
      ModelRequest(1L, "g", "m", "s", "true", Seq(ContentPart("text", "x"))))
    assert(withReasoning.contains(""""reasoning":{"enabled":true}"""))
    // valid JSON end to end
    org.json4s.jackson.JsonMethods.parse(p)
  }

  test("reasoning mode is normalized and whitelisted (worker.py:321-322)") {
    def payload(mode: String) = HttpModelClient.buildPayload(
      ModelRequest(1L, "g", "m", "s", mode, Seq(ContentPart("text", "x"))))
    // strip().lower() normalization, {true,false} whitelist
    assert(payload(" True ").contains(""""reasoning":{"enabled":true}"""))
    assert(payload("FALSE").contains(""""reasoning":{"enabled":false}"""))
    // anything else omits the key instead of emitting invalid JSON
    for (m <- Seq("off", "on", "1", "enabled", "", null))
      assert(!payload(m).contains("reasoning"), s"mode=$m")
    // every variant stays parseable
    for (m <- Seq(" True ", "FALSE", "on", "", null))
      org.json4s.jackson.JsonMethods.parse(payload(m))
  }

  test("HTTP round-trip against an in-process stub: auth, extract, non-2xx, timeout") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastAuth: String = null
    @volatile var lastContentType: String = null
    @volatile var lastBody: String = null
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/ok", (ex: HttpExchange) => {
      lastAuth = ex.getRequestHeaders.getFirst("Authorization")
      lastContentType = ex.getRequestHeaders.getFirst("Content-Type")
      lastBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      respond(ex, 200,
        """{"choices":[{"message":{"content":"live reply"}}],"usage":{"prompt_tokens":11}}""")
    })
    server.createContext("/flaky", (ex: HttpExchange) =>
      respond(ex, 429, """{"error":{"message":"rate limited"}}"""))
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(5000)
      respond(ex, 200, "{}")
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      // 2xx: payload arrives as sent, bearer auth set, content extracted
      val client = new HttpModelClient(s"$base/ok", apiKey = "sk-test-123")
      val r = client.complete(req(ContentPart("text", "ping")))
      assert(r.content == "live reply")
      assert(r.usageJson.contains("\"prompt_tokens\":11"))
      assert(lastAuth == "Bearer sk-test-123")
      assert(lastContentType == "application/json")
      assert(lastBody == HttpModelClient.buildPayload(req(ContentPart("text", "ping"))))

      // non-2xx propagates as an exception carrying status + body (the enrich
      // operator converts it to an ERROR data row, worker.py error-as-data)
      val limited = new HttpModelClient(s"$base/flaky", apiKey = "k")
      val e = intercept[RuntimeException] { limited.complete(req(ContentPart("text", "x"))) }
      assert(e.getMessage.contains("429") && e.getMessage.contains("rate limited"))

      // timeout fires instead of hanging
      val slow = new HttpModelClient(s"$base/slow", apiKey = "k", timeoutSeconds = 1L)
      intercept[Exception] { slow.complete(req(ContentPart("text", "x"))) }
    } finally server.stop(0)
  }

  test("response extraction: content + usage, error shapes throw") {
    val good = """{"choices":[{"message":{"content":"the reply"}}],
      "usage":{"prompt_tokens":7,"completion_tokens":3}}"""
    val r = HttpModelClient.extractResponse(good)
    assert(r.content == "the reply")
    assert(r.usageJson.contains("\"prompt_tokens\":7"))
    intercept[RuntimeException] { HttpModelClient.extractResponse("""{"choices":[]}""") }
    intercept[RuntimeException] {
      HttpModelClient.extractResponse("""{"choices":[{"message":{}}]}""")
    }
    // missing usage → empty object, not a failure (worker.py tolerates it)
    val noUsage = HttpModelClient.extractResponse(
      """{"choices":[{"message":{"content":"ok"}}]}""")
    assert(noUsage.usageJson == "{}")
  }
}
