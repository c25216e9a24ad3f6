package graft.core

/** Batch text-embedding boundary.
  *
  * The reference embeds chunk batches with a sentence-transformer
  * (`/root/reference/streamlit_app.py:89-94`, model all-MiniLM-L6-v2,
  * dim 384). This environment is zero-egress, so model fidelity is out
  * of scope (SURVEY.md §7): the trait is the plug point for a real ONNX
  * runner; the default is a deterministic seeded hashing embedder that
  * preserves every *pipeline* property the engine relies on — fixed
  * dimension, float32 values, batch API, determinism, and the cosine
  * geometry (similar token multisets => similar vectors).
  *
  * The seam itself is PROVEN, not just declared: EmbedderSpec's
  * `LinearBlobEmbedder` is an ONNX-runner-shaped double (opaque
  * serialized weights blob, `@transient lazy` session rebuilt per
  * executor — the non-serializable-OrtSession pattern — dense mat-vec
  * inference) run end-to-end through ingest -> index -> query. A real
  * runner drops in by replacing its decode/infer with ONNX Runtime
  * calls; every transport/batching/dim-check contract is already
  * exercised.
  */
trait Embedder extends Serializable {
  def dimension: Int
  /** Embed a batch; must return one vector per input, each of length
    * `dimension`. Mirrors `model.encode(batch)`'s batched contract. */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Term-hashing + seeded signed random projection, L2-normalized.
  *
  * Each lowercase `[a-z0-9]+` token hashes (splitmix64) to a seeded
  * pseudo-random +-1 pattern over `dimension` lanes; token patterns are
  * summed and the result L2-normalized. Deterministic for a fixed
  * (dimension, seed); pure JVM; O(tokens * dim / 64) per text.
  */
final class HashingEmbedder(
    override val dimension: Int = 384,
    seed: Long = 42L,
    normalize: Boolean = true) extends Embedder {

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedOne)

  def embedOne(text: String): Array[Float] = {
    val acc = new Array[Double](dimension)
    if (text != null) {
      var i = 0
      val n = text.length
      while (i < n) {
        // scan one [a-z0-9]+ token (ASCII lowercase fold)
        var h = 0L
        var len = 0
        while (i < n && isTokenChar(text.charAt(i))) {
          h = h * 31 + toLower(text.charAt(i))
          len += 1
          i += 1
        }
        if (len > 0) addToken(acc, h)
        i += 1
      }
    }
    val out = new Array[Float](dimension)
    var norm = 0.0
    var j = 0
    while (j < dimension) { norm += acc(j) * acc(j); j += 1 }
    val inv = if (normalize && norm > 0) 1.0 / math.sqrt(norm) else 1.0
    j = 0
    while (j < dimension) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    out
  }

  private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def toLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Add the token's +-1 lane pattern: 64 sign bits per splitmix64 step. */
  private def addToken(acc: Array[Double], tokenHash: Long): Unit = {
    var state = tokenHash ^ seed
    var j = 0
    while (j < dimension) {
      state = splitmix64(state)
      var bits = state
      var k = 0
      while (k < 64 && j < dimension) {
        acc(j) += (if ((bits & 1L) == 1L) 1.0 else -1.0)
        bits >>>= 1
        k += 1
        j += 1
      }
    }
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
