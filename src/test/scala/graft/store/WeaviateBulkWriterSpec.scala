package graft.store

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Drives the concrete Weaviate batch writer against a loopback HTTP
  * server: the executor-partition → `/v1/batch/objects` JSON POST
  * lifecycle, the bearer-auth header, the embedding→vector mapping, and
  * the fail-loud per-object error contract.
  */
class WeaviateBulkWriterSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private final case class Received(body: String, auth: String)

  private def withServer(status: Int, body: String)(
      f: (String, ConcurrentLinkedQueue[Received]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[Received]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/batch/objects", new HttpHandler {
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
    """[{"class":"C","result":{}},{"class":"C","result":{"status":"SUCCESS"}}]"""

  private def chunkDf = Seq(
    ("alpha \"quoted\" text", Map("source" -> "u1"), Seq(0.5f, -1.0f)),
    ("beta\nmultiline", Map("source" -> "u2"), Seq(1.0f, 0.0f)),
    ("gamma", Map("source" -> "u3", "title" -> "t"), Seq(0.0f, 0.25f)),
    ("delta", Map.empty[String, String], Seq(2.0f, 3.0f)),
    ("epsilon", Map("k" -> "v"), Seq(1.5f, -0.5f)))
    .toDF("page_content", "metadata", "embedding")
    .repartition(2)

  test("rows arrive as batch objects: class, properties, top-level vector, auth") {
    withServer(200, okBody) { (endpoint, received) =>
      BulkSink.write(chunkDf, batchSize = 2)(
        () => new WeaviateBulkWriter(endpoint, "ChunksIdx", Some("sekret")))

      val posts = received.toArray(Array.empty[Received]).toSeq
      assert(posts.nonEmpty)
      posts.foreach(p => assert(p.auth == "Bearer sekret"))
      val bodies = posts.map(_.body)
      bodies.foreach { b =>
        assert(b.startsWith("""{"objects":["""))
        assert(b.count(_ == '{') >= 2) // at least one object
        assert(b.split("\"class\":\"ChunksIdx\"", -1).length - 1 <= 2,
          s"batch > batchSize: $b")
      }
      val all = bodies.mkString
      // 5 rows total, each tagged with the collection class.
      assert(all.split("\"class\":\"ChunksIdx\"", -1).length - 1 == 5)
      // embedding surfaces as the object's top-level vector, NOT a property
      assert(all.contains(""""vector":[0.5,-1.0]"""))
      assert(!all.contains(""""embedding""""))
      // text_key + metadata live under properties, escaping intact
      assert(all.contains(""""properties":{"page_content":"alpha \"quoted\" text""""))
      assert(all.contains("""beta\nmultiline"""))
      assert(all.contains(""""metadata":{}"""))
    }
  }

  test("no API key sends no Authorization header") {
    withServer(200, okBody) { (endpoint, received) =>
      BulkSink.write(chunkDf.limit(1), batchSize = 10)(
        () => new WeaviateBulkWriter(endpoint, "ChunksIdx"))
      val posts = received.toArray(Array.empty[Received]).toSeq
      assert(posts.nonEmpty)
      posts.foreach(p => assert(p.auth == ""))
    }
  }

  test("non-2xx batch response fails the job (no silent row loss)") {
    withServer(503, "unavailable") { (endpoint, _) =>
      val e = intercept[Exception] {
        BulkSink.write(chunkDf, batchSize = 10)(
          () => new WeaviateBulkWriter(endpoint, "ChunksIdx"))
      }
      assert(e.getMessage != null)
    }
  }

  test("2xx response with per-object errors also fails") {
    withServer(200,
      """[{"class":"C","result":{"errors":{"error":[{"message":"invalid date"}]}}}]""") {
      (endpoint, _) =>
        intercept[Exception] {
          BulkSink.write(chunkDf, batchSize = 10)(
            () => new WeaviateBulkWriter(endpoint, "ChunksIdx"))
        }
    }
  }

  test("pretty-printed errors key is still detected") {
    withServer(200, "[\n {\"result\": {\n  \"errors\" : {\"error\": []}\n }}\n]") {
      (endpoint, _) =>
        intercept[Exception] {
          BulkSink.write(chunkDf, batchSize = 10)(
            () => new WeaviateBulkWriter(endpoint, "ChunksIdx"))
        }
    }
  }
}
