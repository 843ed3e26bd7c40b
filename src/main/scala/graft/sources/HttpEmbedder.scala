package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Embedding-service failure (E1-E4 error channel). `transientFailure`
  * marks errors worth retrying (HTTP 5xx/429); validation and client
  * errors (empty/NaN/dimension-drift, 4xx, malformed responses) are
  * permanent and must surface immediately — backoff cannot fix them. */
final case class EmbedderException(reason: String, cause: Throwable = null,
                                   transientFailure: Boolean = false)
  extends RuntimeException(reason, cause)

/** HTTP embedding client with the reference's production semantics
  * (/root/reference/src/services/Ollama.ts:70-249):
  *
  *   - POST {"model","prompt"} to `host/api/embeddings`, parse the
  *     `embedding` float array (E1).
  *   - Retry transient failures with exponential backoff, `maxRetries`
  *     attempts after the first (Ollama.ts:245-249).
  *   - E3 validation before anything reaches a table: reject empty
  *     vectors, reject non-finite values (NaN/Infinity), and pin the
  *     dimension — the first successful embedding (or the `pinnedDim`
  *     constructor arg) fixes it, any later mismatch throws
  *     (Ollama.ts:70-105). A drifting embedding service corrupts every
  *     downstream cosine; failing loudly here is the contract.
  *   - E4 dimension probe: `probeDimension()` embeds a fixed prompt and
  *     returns (and pins) the detected dimension (Ollama.ts:160-198).
  *
  * Spark-side use: pass to [[graft.Library]]; `embed` runs inside
  * `mapPartitions`, so partition count is the concurrency knob and the
  * HTTP client below is per-JVM (`@transient lazy`), not serialized.
  */
class HttpEmbedder(val host: String, val model: String,
                   pinnedDim: Option[Int] = None,
                   maxRetries: Int = 3,
                   baseBackoffMs: Long = 100L,
                   timeoutMs: Long = 30000L) extends Embedder {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .build()

  /** The dimension pin must survive closure serialization: Spark
    * deserializes a fresh HttpEmbedder copy per task, so an instance
    * field would give every task its own "first embedding pins" state
    * and a mid-job model swap could mix dimensions without an error.
    * The pin therefore lives in a JVM-global registry keyed by
    * (host, model) — every task in an executor JVM shares it. (Pin
    * `pinnedDim` explicitly in production to also close the
    * cross-executor window.) */
  private def pinKey = s"$host|$model"
  pinnedDim.foreach(d => HttpEmbedder.pins.putIfAbsent(pinKey, d))

  override def dim: Int = {
    val d = HttpEmbedder.pins.getOrDefault(pinKey, 0)
    if (d > 0) d else probeDimension()
  }

  /** E4: probe (and pin) the service's embedding dimension. */
  def probeDimension(): Int = embed("dimension probe").length

  /** Retry policy: ONLY transient failures — connection-level
    * IOExceptions and HTTP 5xx/429 — back off and retry. Permanent
    * failures (E3 validation, 4xx, malformed responses) and fatal
    * Errors (OOM) rethrow immediately: the 'fail loudly' contract
    * must not hide behind seconds of pointless backoff. */
  override def embed(text: String): Array[Float] = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0)
        Thread.sleep(baseBackoffMs * (1L << (attempt - 1))) // 100, 200, 400...
      try {
        return validate(requestOnce(text))
      } catch {
        case e: InterruptedException => throw e
        case e: EmbedderException if e.transientFailure => lastErr = e
        case e: java.io.IOException => lastErr = e // connect/read failures
        case e: Throwable => throw e // permanent or fatal: no retry
      }
      attempt += 1
    }
    throw new EmbedderException(
      s"embedding failed after ${maxRetries + 1} attempts: ${lastErr.getMessage}",
      lastErr)
  }

  private def requestOnce(text: String): Array[Float] = {
    val body = s"""{"model":${HttpEmbedder.jsonString(model)},"prompt":${HttpEmbedder.jsonString(text)}}"""
    val req = HttpRequest.newBuilder(URI.create(s"$host/api/embeddings"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val status = resp.statusCode()
    if (status / 100 != 2)
      throw new EmbedderException(s"HTTP $status: ${resp.body().take(200)}",
        transientFailure = status >= 500 || status == 429)
    HttpEmbedder.parseEmbedding(resp.body())
  }

  /** E3: empty / non-finite / dimension-drift rejection. */
  private def validate(v: Array[Float]): Array[Float] = {
    if (v.isEmpty)
      throw new EmbedderException("invalid embedding: dimension 0 (empty vector)")
    if (v.exists(f => f.isNaN || f.isInfinite))
      throw new EmbedderException(
        "invalid embedding: contains non-finite values (NaN or Infinity)")
    val expect = Option(HttpEmbedder.pins.putIfAbsent(pinKey, v.length))
      .map(_.intValue).getOrElse(v.length)
    if (v.length != expect)
      throw new EmbedderException(
        s"invalid embedding: dimension ${v.length} (expected $expect)")
    v
  }
}

object HttpEmbedder {

  /** JVM-global (host, model) -> pinned dimension; see the instance
    * docstring for why this cannot be per-instance state. */
  private[sources] val pins =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Minimal JSON string escape (the request side needs nothing more). */
  private[sources] def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Extract the `embedding` number array from the response JSON. A full
    * JSON parser is deliberately out of scope (zero-dependency build) —
    * the response shape is flat and fixed. */
  private[sources] def parseEmbedding(json: String): Array[Float] = {
    val k = json.indexOf("\"embedding\"")
    if (k < 0) throw new EmbedderException("response has no embedding field")
    val s = json.indexOf('[', k)
    val e = if (s < 0) -1 else json.indexOf(']', s)
    if (s < 0 || e < 0) throw new EmbedderException("malformed embedding array")
    val body = json.substring(s + 1, e).trim
    if (body.isEmpty) Array.empty[Float]
    else try body.split(",").map(_.trim.toFloat)
    catch {
      case ex: NumberFormatException =>
        throw new EmbedderException(s"non-numeric embedding value: ${ex.getMessage}")
    }
  }
}
