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

  test("object-store schemes dispatch to Hadoop FS, never the driver") {
    // s3:// and the legacy s3n:// rewrite to the maintained s3a
    // connector; bucket/key/query are preserved verbatim
    assert(Sniffer.resolveUrl("s3://bucket/path/part.parquet") ==
      "s3a://bucket/path/part.parquet")
    assert(Sniffer.resolveUrl("s3n://b/k.csv") == "s3a://b/k.csv")
    // already-Hadoop-visible schemes pass through untouched
    for (u <- Seq("s3a://b/k.csv", "hdfs://nn:8020/d/f.parquet",
        "gs://b/k.json", "abfs://c@acct.dfs.core.windows.net/p"))
      assert(Sniffer.resolveUrl(u) == u)
    // and a local relative path is untouched too
    assert(Sniffer.resolveUrl("target/tmp/x.csv") == "target/tmp/x.csv")
  }

  test("s3a paths reach the Hadoop FileSystem resolver (scheme wired)") {
    // no network here: asserting the DISPATCH — Path.getFileSystem on the
    // rewritten URL must look up the s3a scheme (absent impl throws the
    // canonical UnsupportedFileSystemException/ClassNotFound, proving the
    // path was routed to Hadoop FS rather than treated as local)
    val p = new org.apache.hadoop.fs.Path(Sniffer.resolveUrl("s3://b/k"))
    assert(p.toUri.getScheme == "s3a")
    val conf = new org.apache.hadoop.conf.Configuration(false)
    val e = intercept[Exception] { p.getFileSystem(conf) }
    val msg = e.toString
    assert(msg.contains("s3a") || msg.contains("No FileSystem"),
      s"unexpected resolver failure: $msg")
  }
}
