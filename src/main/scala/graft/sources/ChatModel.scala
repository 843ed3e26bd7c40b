package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** External LLM completion boundary (E6/E8) — the trait behind which the
  * reference's enrichment and duplicate-judge calls live
  * (/root/reference/src/services/AutoTagger.ts:597-670,808-970). The
  * orchestration layers own all fallback semantics: enrichment falls
  * back to heuristics on ANY failure, the judge treats a failure as
  * "not a duplicate" — so implementations just throw.
  *
  * Serializable so a model handle can ride into `mapPartitions` for
  * distributed batch enrichment; implementations must keep network
  * clients `@transient lazy`. */
trait ChatModel extends Serializable {
  /** One completion for one prompt. Throws on any failure. */
  def complete(prompt: String): String

  /** Liveness probe (reference isOllamaAvailable): used to decide
    * heuristics-only mode up front instead of failing per document. */
  def available: Boolean = true
}

/** HTTP chat client for an Ollama-style `/api/generate` endpoint
  * (reference AutoTagger.ts:646-664). Single attempt, no retry — the
  * reference never retries generate calls; the caller's fallback IS the
  * error policy. */
class HttpChatModel(val host: String, val model: String,
                    timeoutMs: Long = 60000L) extends ChatModel {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .build()

  override def complete(prompt: String): String = {
    val body =
      s"""{"model":${HttpEmbedder.jsonString(model)},"prompt":${HttpEmbedder.jsonString(prompt)},"stream":false}"""
    val req = HttpRequest.newBuilder(URI.create(s"$host/api/generate"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"chat HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(resp.body())
    val r = node.get("response")
    if (r == null || !r.isTextual)
      throw new RuntimeException("chat response has no 'response' field")
    r.asText()
  }

  /** GET /api/tags — the reference's liveness check. */
  override def available: Boolean =
    try {
      val req = HttpRequest.newBuilder(URI.create(s"$host/api/tags"))
        .timeout(Duration.ofMillis(timeoutMs)).GET().build()
      client.send(req, HttpResponse.BodyHandlers.discarding())
        .statusCode() / 100 == 2
    } catch { case _: Exception => false }
}
