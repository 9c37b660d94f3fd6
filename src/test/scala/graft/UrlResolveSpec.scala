package graft

import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sniffer

/** resolveUrl must enforce its size cap WHILE streaming: a chunked
  * response (no Content-Length) used to fail open and download an
  * unbounded body to driver temp disk. */
class UrlResolveSpec extends AnyFunSuite {

  private def withServer(body: Array[Byte], chunked: Boolean)(
      f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/d.csv", exchange => {
      // length 0 → chunked transfer (no Content-Length header)
      exchange.sendResponseHeaders(200, if (chunked) 0 else body.length.toLong)
      exchange.getResponseBody.write(body)
      exchange.getResponseBody.close()
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}/d.csv")
    finally server.stop(0)
  }

  test("small download succeeds and lands in a temp file") {
    val body = "a,b\n1,2\n".getBytes
    withServer(body, chunked = false) { url =>
      val path = Sniffer.resolveUrl(url, maxBytes = 1024)
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)).sameElements(body))
    }
  }

  test("chunked response without Content-Length cannot exceed the cap") {
    val body = Array.fill[Byte](200 * 1024)('x')
    withServer(body, chunked = true) { url =>
      val e = intercept[IllegalArgumentException] {
        Sniffer.resolveUrl(url, maxBytes = 64 * 1024)
      }
      assert(e.getMessage.contains("exceeded"))
    }
  }

  test("declared Content-Length over the cap is rejected before download") {
    val body = Array.fill[Byte](100 * 1024)('y')
    withServer(body, chunked = false) { url =>
      intercept[IllegalArgumentException] {
        Sniffer.resolveUrl(url, maxBytes = 10 * 1024)
      }
    }
  }
}
