package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Embedding provider abstraction.
  *
  * The reference calls an Ollama HTTP endpoint with retry/backoff and
  * dimension pinning (/root/reference/src/services/Ollama.ts:70-259).
  * Engine semantics only require *a* deterministic text -> Array[Float]
  * function behind a trait: production wires an HTTP client (executed in
  * `mapPartitions`, partition count = concurrency knob); tests and this
  * offline build use the hashing embedder below, which is deterministic,
  * cheap, and gives similar texts similar vectors (bag-of-words feature
  * hashing), so ranking behavior is meaningful.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Feature-hashing embedder: each token hashes (md5) to a coordinate and
  * a sign; the vector is the L2-normalized token-count projection. */
class HashingEmbedder(val dim: Int = 64) extends Embedder {
  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val tokens = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    for (t <- tokens) {
      val h = MessageDigest.getInstance("MD5")
        .digest(t.getBytes(StandardCharsets.UTF_8))
      val idx = ((h(0) & 0xff) << 8 | (h(1) & 0xff)) % dim
      val sign = if ((h(2) & 1) == 0) 1f else -1f
      v(idx) += sign
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}
