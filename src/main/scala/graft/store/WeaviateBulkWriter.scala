package graft.store

import org.apache.spark.sql.Row

/** Concrete [[BulkWriter]] speaking the Weaviate batch wire protocol —
  * the box the reference's PRIMARY sink fills with the `weaviate` client
  * library (`kfp/redhat-product-documentation-ingestor/ingestion-pipeline.py:331-353`
  * builds `weaviate.Client(url=host+":"+port, auth_client_secret=
  * AuthApiKey(...))` and LangChain `Weaviate.add_documents` drives its
  * batch API; `kfp/website-ingestor/ingestion-pipeline-website-local.py:357-378`
  * is the same shape). On the wire that is one
  * `POST <endpoint>/v1/batch/objects` per batch with body
  * `{"objects":[{"class":…,"properties":{…},"vector":[…]},…]}` and an
  * `Authorization: Bearer <key>` header.
  *
  * Row mapping mirrors the reference's document layout: the `embedding`
  * column (when present) becomes the object's top-level `vector`; every
  * other column — `page_content` (the reference's `text_key`),
  * `metadata`, `headers` — lands in `properties`.
  *
  * Semantics shared with [[HttpBulkWriter]]:
  *   - constructed ON THE EXECUTOR via [[BulkSink.write]] — one client
  *     per partition, never serialized;
  *   - non-2xx THROWS, and so does a 2xx body carrying per-object
  *     `"errors"` results (Weaviate reports item failures inside a 200
  *     response array): silently losing ingested rows is never
  *     acceptable, so the task fails and Spark retries it.
  */
final class WeaviateBulkWriter(endpoint: String, className: String,
    apiKey: Option[String] = None, timeoutMs: Int = 30000) extends BulkWriter {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  private def renderObject(r: Row): String = {
    val fields = r.schema.fieldNames.iterator.zip(r.toSeq.iterator).toSeq
    val (vec, props) = fields.partition(_._1 == "embedding")
    val propsJson = props.iterator
      .map { case (n, v) => JsonRender.quote(n) + ":" + JsonRender.render(v) }
      .mkString("{", ",", "}")
    val vectorJson = vec.headOption.collect {
      case (_, v) if v != null => s""","vector":${JsonRender.render(v)}"""
    }.getOrElse("")
    s"""{"class":${JsonRender.quote(className)},"properties":$propsJson$vectorJson}"""
  }

  override def writeBatch(rows: Seq[Row]): Unit = {
    val body = rows.iterator.map(renderObject)
      .mkString("""{"objects":[""", ",", "]}")
    val builder = HttpRequest.newBuilder(
        java.net.URI.create(s"$endpoint/v1/batch/objects"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    val res = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"weaviate batch write to $endpoint failed: HTTP ${res.statusCode()}: " +
          res.body().take(200))
    // A successful per-object result is `"result":{}` or
    // `{"status":"SUCCESS"}`; failures carry `"errors":{…}` inside the
    // 200 response array — whitespace-tolerant flag match, as the
    // response never echoes object properties.
    if (WeaviateBulkWriter.ErrorsKey.pattern.matcher(res.body()).find())
      throw new java.io.IOException(
        s"weaviate batch write to $endpoint reported item errors: " +
          res.body().take(200))
  }

  override def close(): Unit = () // java.net.http clients hold no open resources pre-JDK21
}

object WeaviateBulkWriter {
  private val ErrorsKey = """"errors"\s*:""".r
}
