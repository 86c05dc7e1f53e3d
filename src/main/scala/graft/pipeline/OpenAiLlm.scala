package graft.pipeline

import org.json4s.{JArray, JObject, JString}
import org.json4s.jackson.JsonMethods

import graft.store.JsonRender

/** Concrete [[LlmClient]] speaking the OpenAI-compatible completions
  * protocol — the box the reference fills with LangChain's `VLLMOpenAI`
  * (`kfp/website-ingestor/ingestion-pipeline-website-local.py:183-188`:
  * `openai_api_base=API_URL+"/v1"`,
  * `model_name="granite-8b-code-instruct-128k"`,
  * `model_kwargs={"stop": ["."]}`). On the wire that is one
  * `POST <endpoint>/v1/completions` per call with
  * `{"model":…,"prompt":…,"stop":[…]}` and an
  * `Authorization: Bearer <key>` header; the completion is
  * `choices[0].text`.
  *
  * [[StubLlm]] stays the test default — model inference remains outside
  * the engine's correctness surface; this client exists so a deployment
  * can point [[RagQuery.ragQuery]] at a live vLLM endpoint without
  * writing protocol code. Fail-loud: non-2xx or a body without a
  * `choices[0].text` string throws (a RAG answer silently replaced by an
  * error page is never acceptable).
  */
final class OpenAiLlmClient(
    endpoint: String,
    model: String,
    apiKey: Option[String] = None,
    stop: Seq[String] = Seq("."),
    temperature: Option[Double] = None,
    maxTokens: Option[Int] = None,
    timeoutMs: Int = 60000) extends LlmClient {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  // The JDK client is not serializable and must not cross task
  // boundaries; RagQuery.ragQuery calls complete() on the driver with an
  // already-folded prompt, so one lazy client per JVM is the lifecycle.
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  override def complete(prompt: String): String = {
    val fields = Seq(
      s""""model":${JsonRender.quote(model)}""",
      s""""prompt":${JsonRender.quote(prompt)}""") ++
      (if (stop.nonEmpty)
        Seq(s""""stop":${stop.map(JsonRender.quote).mkString("[", ",", "]")}""")
      else Nil) ++
      temperature.map(t => s""""temperature":$t""") ++
      maxTokens.map(m => s""""max_tokens":$m""")
    val body = fields.mkString("{", ",", "}")
    val builder = HttpRequest.newBuilder(
        java.net.URI.create(s"$endpoint/v1/completions"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    val res = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"completion at $endpoint failed: HTTP ${res.statusCode()}: " +
          res.body().take(200))
    JsonMethods.parseOpt(res.body())
      .collect { case o: JObject => o \ "choices" }
      .collect { case JArray(first :: _) => first \ "text" }
      .collect { case JString(text) => text }
      .getOrElse(throw new java.io.IOException(
        s"completion at $endpoint returned no choices[0].text: " +
          res.body().take(200)))
  }
}
