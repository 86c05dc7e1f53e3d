package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Drives the OpenAI-compatible completions client against a loopback
  * HTTP server: request shape (model/prompt/stop/auth), response text
  * extraction, and the fail-loud contract on HTTP and shape errors.
  */
class OpenAiLlmSpec extends AnyFunSuite {

  private final case class Received(body: String, auth: String)

  private def withServer(status: Int, body: String)(
      f: (String, ConcurrentLinkedQueue[Received]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[Received]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        received.add(Received(
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8),
          Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")))
        val out = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", received)
    finally server.stop(0)
  }

  private val okBody =
    """{"id":"cmpl-1","choices":[{"text":"Paris is the capital.","index":0}],"usage":{}}"""

  test("posts model/prompt/stop with bearer auth and returns choices[0].text") {
    withServer(200, okBody) { (endpoint, received) =>
      val llm = new OpenAiLlmClient(endpoint,
        model = "granite-8b-code-instruct-128k", apiKey = Some("sk-test"))
      val out = llm.complete("Query: capital of France?\n\nContext:\nTitle: x")
      assert(out == "Paris is the capital.")
      val Seq(req) = received.toArray(Array.empty[Received]).toSeq
      assert(req.auth == "Bearer sk-test")
      assert(req.body.contains(""""model":"granite-8b-code-instruct-128k""""))
      assert(req.body.contains(""""stop":["."]"""))
      // newline in the prompt must be JSON-escaped, not raw
      assert(req.body.contains("""Query: capital of France?\n\nContext"""))
    }
  }

  test("optional kwargs serialize only when set; no key → no auth header") {
    withServer(200, okBody) { (endpoint, received) =>
      val llm = new OpenAiLlmClient(endpoint, model = "m", stop = Nil,
        temperature = Some(0.2), maxTokens = Some(64))
      llm.complete("p")
      val Seq(req) = received.toArray(Array.empty[Received]).toSeq
      assert(req.auth == "")
      assert(!req.body.contains("\"stop\""))
      assert(req.body.contains(""""temperature":0.2"""))
      assert(req.body.contains(""""max_tokens":64"""))
    }
  }

  test("non-2xx fails loud") {
    withServer(500, "boom") { (endpoint, _) =>
      val llm = new OpenAiLlmClient(endpoint, model = "m")
      val e = intercept[java.io.IOException](llm.complete("p"))
      assert(e.getMessage.contains("HTTP 500"))
    }
  }

  test("2xx with empty choices fails loud (no silent empty answer)") {
    withServer(200, """{"choices":[]}""") { (endpoint, _) =>
      val llm = new OpenAiLlmClient(endpoint, model = "m")
      intercept[java.io.IOException](llm.complete("p"))
    }
    withServer(200, """not json""") { (endpoint, _) =>
      val llm = new OpenAiLlmClient(endpoint, model = "m")
      intercept[java.io.IOException](llm.complete("p"))
    }
  }

  test("ragQuery end-to-end through the protocol client (loopback vLLM)") {
    withServer(200, okBody) { (endpoint, received) =>
      import graft.TestSession.spark
      val store = new graft.store.ParquetVectorStore(spark,
        java.nio.file.Files.createTempDirectory("graft-llm").toString)
      val emb = graft.embed.HashingEmbedder(16)
      import spark.implicits._
      store.append("idx", Seq(
        ("France's capital is Paris.", Map("title" -> "fr"), Map.empty[String, String]))
        .toDF("page_content", "metadata", "headers")
        .withColumn("embedding", emb.embedCol(org.apache.spark.sql.functions.col("page_content"))))
      val ans = RagQuery.ragQuery(store, "idx", "capital of France?", emb,
        new OpenAiLlmClient(endpoint, model = "m"), k = 1)
      assert(ans == "Paris is the capital.")
      val Seq(req) = received.toArray(Array.empty[Received]).toSeq
      assert(req.body.contains("""Title: fr\nContent: France's capital is Paris."""))
    }
  }
}
