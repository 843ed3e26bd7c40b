package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** E1-E4 against a local mock of the reference's embedding endpoint:
  * happy path, retry-with-backoff on transient 500s, and all three E3
  * validation failure modes (empty, non-finite, dimension drift). */
class HttpEmbedderSpec extends AnyFunSuite {

  /** Serve `responses` in sequence (last one repeats); returns host and
    * the served-request counter. */
  private def withServerCount(responses: Seq[(Int, String)])
                             (f: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val n = new AtomicInteger(0)
    server.createContext("/api/embeddings", (x: HttpExchange) => {
      val i = math.min(n.getAndIncrement(), responses.length - 1)
      val (code, body) = responses(i)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(code, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", n)
    finally server.stop(0)
  }

  private def withServer(responses: Seq[(Int, String)])(f: String => Unit): Unit =
    withServerCount(responses)((host, _) => f(host))

  private def emb(host: String) =
    new HttpEmbedder(host, "test-model", maxRetries = 2, baseBackoffMs = 1L)

  test("happy path: parses the embedding array; dim pins from first result") {
    withServer(Seq((200, """{"embedding":[0.25,-0.5,1.0]}"""))) { host =>
      val e = emb(host)
      assert(e.embed("hello").toSeq === Seq(0.25f, -0.5f, 1.0f))
      assert(e.dim === 3)
    }
  }

  test("transient 500s are retried with backoff until success") {
    withServer(Seq(
      (500, "busy"), (500, "busy"),
      (200, """{"embedding":[1.0,2.0]}"""))) { host =>
      assert(emb(host).embed("x").toSeq === Seq(1.0f, 2.0f))
    }
  }

  test("E3: empty embedding rejected") {
    withServer(Seq((200, """{"embedding":[]}"""))) { host =>
      val ex = intercept[EmbedderException](emb(host).embed("x"))
      assert(ex.getMessage.contains("dimension 0"))
    }
  }

  test("E3: non-finite values rejected") {
    withServer(Seq((200, """{"embedding":[1.0,NaN,2.0]}"""))) { host =>
      val ex = intercept[EmbedderException](emb(host).embed("x"))
      assert(ex.getMessage.contains("non-finite"))
    }
  }

  test("E3: dimension drift across calls rejected; pinnedDim pre-pins") {
    withServer(Seq(
      (200, """{"embedding":[1.0,2.0,3.0]}"""),
      (200, """{"embedding":[1.0,2.0]}"""))) { host =>
      val e = emb(host)
      assert(e.embed("a").length === 3) // pins 3
      val ex = intercept[EmbedderException](e.embed("b"))
      assert(ex.getMessage.contains("expected 3"))
    }
    // constructor pin rejects the FIRST response on mismatch
    withServer(Seq((200, """{"embedding":[1.0,2.0]}"""))) { host =>
      val e = new HttpEmbedder(host, "m", pinnedDim = Some(4),
        maxRetries = 0, baseBackoffMs = 1L)
      val ex = intercept[EmbedderException](e.embed("a"))
      assert(ex.getMessage.contains("expected 4"))
    }
  }

  test("E4: probeDimension detects and pins") {
    withServer(Seq((200, """{"embedding":[0.1,0.2,0.3,0.4]}"""))) { host =>
      val e = emb(host)
      assert(e.probeDimension() === 4)
      assert(e.dim === 4)
    }
  }

  test("malformed responses fail loudly, not as zero vectors") {
    withServer(Seq((200, """{"error":"model not found"}"""))) { host =>
      val ex = intercept[EmbedderException](emb(host).embed("x"))
      assert(ex.getMessage.contains("no embedding field"))
    }
  }

  test("permanent failures are NOT retried: 4xx throws on the first attempt") {
    // a 200 follows the 404 — a retrying client would succeed and mask
    // the bug; the fixed client must throw after exactly one request
    withServerCount(Seq((404, "no such model"),
      (200, """{"embedding":[1.0]}"""))) { (host, n) =>
      val ex = intercept[EmbedderException](emb(host).embed("x"))
      assert(ex.getMessage.contains("HTTP 404"))
      assert(n.get() === 1)
    }
  }

  test("permanent failures are NOT retried: E3 validation throws immediately") {
    withServerCount(Seq((200, """{"embedding":[1.0,NaN]}"""),
      (200, """{"embedding":[1.0,2.0]}"""))) { (host, n) =>
      intercept[EmbedderException](emb(host).embed("x"))
      assert(n.get() === 1)
    }
  }

  test("429 is transient: retried until success") {
    withServerCount(Seq((429, "rate limited"),
      (200, """{"embedding":[3.0,4.0]}"""))) { (host, n) =>
      assert(emb(host).embed("x").toSeq === Seq(3.0f, 4.0f))
      assert(n.get() === 2)
    }
  }

  test("request JSON escapes newlines, quotes and control chars") {
    assert(HttpEmbedder.jsonString("a\"b\\c\nd\u0001") ===
      "\"a\\\"b\\\\c\\nd\\u0001\"")
  }
}
