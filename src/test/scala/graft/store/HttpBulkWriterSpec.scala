package graft.store

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Drives the concrete ES-style bulk writer against a loopback HTTP
  * server (JDK built-in — no egress needed): the full
  * executor-partition → NDJSON `_bulk` POST lifecycle, plus the
  * fail-loud error contract.
  */
class HttpBulkWriterSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def withServer(status: Int, body: String)(
      f: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        received.add(new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8))
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

  private def chunkDf = Seq(
    ("alpha \"quoted\" text", Map("source" -> "u1"), Seq(0.5f, -1.0f)),
    ("beta\nmultiline", Map("source" -> "u2"), Seq(1.0f, 0.0f)),
    ("gamma", Map("source" -> "u3", "title" -> "t"), Seq(0.0f, 0.25f)),
    ("delta", Map.empty[String, String], Seq(2.0f, 3.0f)),
    ("epsilon", Map("k" -> "v"), Seq(1.5f, -0.5f)))
    .toDF("page_content", "metadata", "embedding")
    .repartition(2)

  test("every row arrives as an NDJSON action+source pair, batches bounded") {
    withServer(200, """{"errors":false}""") { (endpoint, received) =>
      BulkSink.write(chunkDf, batchSize = 2)(
        () => new HttpBulkWriter(endpoint, "chunks_idx"))

      val bodies = received.toArray(Array.empty[String]).toSeq
      // 5 rows in batches of <= 2 across 2 partitions: at least 3 POSTs,
      // each with line pairs (action, source) and a trailing newline.
      assert(bodies.nonEmpty)
      val lines = bodies.flatMap(_.split("\n").toSeq)
      val actions = lines.filter(_.contains("\"_index\":\"chunks_idx\""))
      val sources = lines.filterNot(_.contains("\"_index\""))
      assert(actions.length == 5)
      assert(sources.length == 5)
      bodies.foreach { b =>
        assert(b.endsWith("\n"))
        assert(b.split("\n").length % 2 == 0, s"unpaired lines in: $b")
        assert(b.split("\n").count(_.contains("\"_index\"")) <= 2, "batch > batchSize")
      }
      // Source lines are real JSON with escaping intact.
      assert(sources.exists(_.contains(""""page_content":"alpha \"quoted\" text"""")))
      assert(sources.exists(_.contains("""beta\nmultiline""")))
      assert(sources.exists(_.contains(""""metadata":{}""")))
      assert(sources.exists(_.contains(""""embedding":[0.5,-1.0]""")))
    }
  }

  test("non-2xx bulk response fails the job (no silent row loss)") {
    withServer(503, "unavailable") { (endpoint, _) =>
      val e = intercept[Exception] {
        BulkSink.write(chunkDf, batchSize = 10)(
          () => new HttpBulkWriter(endpoint, "chunks_idx"))
      }
      assert(e.getMessage != null)
    }
  }

  test("2xx body with item errors also fails") {
    withServer(200, """{"took":3,"errors":true,"items":[]}""") { (endpoint, _) =>
      intercept[Exception] {
        BulkSink.write(chunkDf, batchSize = 10)(
          () => new HttpBulkWriter(endpoint, "chunks_idx"))
      }
    }
  }

  test("pretty-printed errors flag is still detected") {
    withServer(200, "{\n  \"took\": 5,\n  \"errors\" : true,\n  \"items\": []\n}") {
      (endpoint, _) =>
        intercept[Exception] {
          BulkSink.write(chunkDf, batchSize = 10)(
            () => new HttpBulkWriter(endpoint, "chunks_idx"))
        }
    }
  }

  test("JsonRender escapes control characters and handles non-finite floats") {
    assert(JsonRender.quote("a" + 1.toChar + "b") == "\"a\\u0001b\"")
    assert(JsonRender.render(Float.NaN.asInstanceOf[java.lang.Float]) == "null")
    assert(JsonRender.render(Seq(1L, 2L)) == "[1,2]")
    assert(JsonRender.render(Map("k" -> null)) == """{"k":null}""")
  }
}
