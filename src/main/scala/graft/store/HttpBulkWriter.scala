package graft.store

import org.apache.spark.sql.Row

/** Concrete [[BulkWriter]] speaking the Elasticsearch-style `_bulk`
  * NDJSON wire protocol over HTTP — the box the reference's ES sink
  * fills with a client library (RHPD-ES
  * ingestion-pipeline-elastic.py:330–359, `request_timeout=30` bulk
  * batching). Each row becomes an action line
  * `{"index":{"_index":"<index>"}}` plus a JSON source line rendered
  * from the row's schema; one batch is one POST to `<endpoint>/_bulk`.
  *
  * Semantics:
  *   - constructed ON THE EXECUTOR via the [[BulkSink.write]] factory —
  *     one client per partition, never serialized;
  *   - non-2xx, or a 2xx body reporting `"errors":true`, THROWS: unlike
  *     page fetching (error→empty), losing ingested rows silently is
  *     never acceptable, so the task fails and Spark retries it;
  *   - the JSON renderer covers the store's chunk schema (strings, maps,
  *     numeric arrays, numerics, booleans, nested rows) with full
  *     control-character escaping.
  */
final class HttpBulkWriter(endpoint: String, index: String,
    timeoutMs: Int = 30000) extends BulkWriter {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  private val action = s"""{"index":{"_index":${JsonRender.quote(index)}}}"""

  override def writeBatch(rows: Seq[Row]): Unit = {
    val body = rows.iterator
      .map(r => action + "\n" + JsonRender.render(r))
      .mkString("", "\n", "\n")
    val req = HttpRequest.newBuilder(java.net.URI.create(s"$endpoint/_bulk"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/x-ndjson")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"bulk write to $endpoint failed: HTTP ${res.statusCode()}: " +
          res.body().take(200))
    // Whitespace-tolerant match on the top-level errors flag (a
    // pretty-printing proxy emits `"errors": true`); the _bulk response
    // never echoes document sources, so a flag match in the body is the
    // item-failure signal.
    if (HttpBulkWriter.ErrorsTrue.pattern.matcher(res.body()).find())
      throw new java.io.IOException(
        s"bulk write to $endpoint reported item errors: ${res.body().take(200)}")
  }

  override def close(): Unit = () // java.net.http clients hold no open resources pre-JDK21
}

object HttpBulkWriter {
  private val ErrorsTrue = """"errors"\s*:\s*true""".r
}

/** Dependency-free JSON rendering for Spark [[Row]]s — enough for the
  * chunk schema and any schema built from strings, maps, arrays,
  * numerics and structs. NaN/Infinity render as null (JSON has no
  * representation for them).
  */
private[graft] object JsonRender {

  def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  def render(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case r: Row =>
      r.schema.fieldNames.iterator.zip(r.toSeq.iterator)
        .map { case (n, x) => quote(n) + ":" + render(x) }
        .mkString("{", ",", "}")
    case m: scala.collection.Map[_, _] =>
      m.iterator.map { case (k, x) => quote(String.valueOf(k)) + ":" + render(x) }
        .mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.iterator.map(render).mkString("[", ",", "]")
    case f: java.lang.Float if f.isNaN || f.isInfinite => "null"
    case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
    case x => String.valueOf(x) // numerics, booleans
  }
}
