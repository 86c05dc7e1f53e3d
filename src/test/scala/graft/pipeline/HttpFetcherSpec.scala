package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** HttpFetcher contract against a loopback JDK HttpServer (no egress
  * required): 2xx body decode with header charset, redirect following,
  * non-2xx → None, connection failure → None.
  */
class HttpFetcherSpec extends AnyFunSuite {

  private def handler(status: Int, body: Array[Byte],
      headers: Map[String, String] = Map.empty): HttpHandler =
    (ex: HttpExchange) => {
      headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }

  private def withServer(routes: (String, HttpHandler)*)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, h) }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("2xx: body decoded with the Content-Type charset") {
    val latin = "café naïve".getBytes(StandardCharsets.ISO_8859_1)
    withServer(
      "/page" -> handler(200, latin,
        Map("Content-Type" -> "text/html; charset=ISO-8859-1"))) { base =>
      assert(HttpFetcher().fetch(s"$base/page").contains("café naïve"))
    }
  }

  test("missing charset defaults to UTF-8") {
    val utf8 = "über plain".getBytes(StandardCharsets.UTF_8)
    withServer("/p" -> handler(200, utf8, Map("Content-Type" -> "text/html"))) {
      base => assert(HttpFetcher().fetch(s"$base/p").contains("über plain"))
    }
  }

  test("redirects are followed") {
    withServer(
      "/new" -> handler(200, "landed".getBytes(StandardCharsets.UTF_8)),
      "/old" -> ((ex: HttpExchange) => {
        ex.getResponseHeaders.set("Location",
          s"http://127.0.0.1:${ex.getLocalAddress.getPort}/new")
        ex.sendResponseHeaders(302, -1)
        ex.close()
      })) { base =>
      assert(HttpFetcher().fetch(s"$base/old").contains("landed"))
    }
  }

  test("non-2xx yields None (S4 error→empty semantics)") {
    withServer("/gone" -> handler(404, "not here".getBytes)) { base =>
      assert(HttpFetcher().fetch(s"$base/gone").isEmpty)
    }
  }

  test("unreachable host / bad url yield None, never a throw") {
    assert(HttpFetcher(timeoutMs = 500)
      .fetch("http://127.0.0.1:1/nothing-listens-here").isEmpty)
    assert(HttpFetcher().fetch("not a url").isEmpty)
  }

  test("an unknown charset name falls back to UTF-8 instead of throwing") {
    withServer("/x" -> handler(200, "ok".getBytes(StandardCharsets.UTF_8),
      Map("Content-Type" -> "text/html; charset=no-such-charset"))) { base =>
      assert(HttpFetcher().fetch(s"$base/x").contains("ok"))
    }
  }
}
