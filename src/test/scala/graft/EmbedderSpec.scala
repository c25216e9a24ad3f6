package graft

import graft.core.{Embedder, HashingEmbedder}
import org.scalatest.funsuite.AnyFunSuite

/** ONNX-runner-SHAPED test double for the [[Embedder]] plug point
  * (SURVEY §8d: model fidelity is env-blocked, the seam is not). It
  * mirrors every operational property a real ONNX sentence-encoder
  * wrapper would have, so passing it end-to-end proves the seam:
  * the "model" arrives as an opaque serialized BLOB (as a .onnx file's
  * bytes would), the "session" is `@transient lazy` — rebuilt from the
  * blob on first use inside each executor, never Java-serialized with
  * the closure (a real OrtSession is not serializable) — and inference
  * is a dense feature x weight mat-vec, nothing hash-based. Dropping
  * in a real runner = replacing `decode`/`infer` with ONNX Runtime
  * calls; every pipeline contract (batching, dim checks, closure
  * transport, per-partition init) is already exercised here. */
final class LinearBlobEmbedder(modelBlob: Array[Byte],
    override val dimension: Int) extends Embedder {
  import LinearBlobEmbedder._
  // the non-serializable-session pattern: transient + lazy
  @transient private lazy val session: Array[Array[Float]] = {
    val bb = java.nio.ByteBuffer.wrap(modelBlob)
    Array.fill(Feats)(Array.fill(dimension)(bb.getFloat))
  }
  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val f = new Array[Float](Feats) // letter-frequency features
    if (t != null) t.toLowerCase.foreach { c =>
      if (c >= 'a' && c <= 'z') f(c - 'a') += 1f
    }
    val out = new Array[Float](dimension)
    var i = 0
    while (i < Feats) {
      if (f(i) != 0f) {
        val w = session(i)
        var j = 0
        while (j < dimension) { out(j) += f(i) * w(j); j += 1 }
      }
      i += 1
    }
    val norm = math.sqrt(out.map(x => x.toDouble * x).sum)
    if (norm > 0) (0 until dimension).foreach(j => out(j) = (out(j) / norm).toFloat)
    out
  }
}
object LinearBlobEmbedder {
  val Feats = 26
  /** A deterministic tiny "model file": Feats x dim float32 weights. */
  def blob(dim: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val bb = java.nio.ByteBuffer.allocate(Feats * dim * 4)
    (0 until Feats * dim).foreach(_ => bb.putFloat(rnd.nextFloat() * 2f - 1f))
    bb.array()
  }
}

class EmbedderSpec extends AnyFunSuite {

  private val e = new HashingEmbedder(dimension = 64, seed = 42L)

  test("deterministic under fixed seed") {
    val a = e.embedOne("the quick brown fox")
    val b = e.embedOne("the quick brown fox")
    assert(a.toSeq == b.toSeq)
    val e2 = new HashingEmbedder(dimension = 64, seed = 42L)
    assert(e2.embedOne("the quick brown fox").toSeq == a.toSeq)
  }

  test("different seeds give different vectors") {
    val other = new HashingEmbedder(dimension = 64, seed = 7L)
    assert(other.embedOne("hello world").toSeq != e.embedOne("hello world").toSeq)
  }

  test("fixed dimension and finite values") {
    val v = e.embedOne("some text with 123 numbers and CAPS")
    assert(v.length == 64)
    assert(v.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("default dimension is 384 (reference streamlit_app.py:49)") {
    assert(new HashingEmbedder().dimension == 384)
    assert(new HashingEmbedder().embedOne("x").length == 384)
  }

  test("L2-normalized output") {
    val v = e.embedOne("normalize me please")
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty / null / tokenless text embeds to the zero vector") {
    assert(e.embedOne("").forall(_ == 0f))
    assert(e.embedOne(null).forall(_ == 0f))
    assert(e.embedOne("!!! ???").forall(_ == 0f))
  }

  test("case-insensitive tokenization") {
    assert(e.embedOne("Hello World").toSeq == e.embedOne("hello world").toSeq)
  }

  test("similar token multisets are more similar than disjoint ones") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot // vectors are L2-normalized
    }
    val base = e.embedOne("spark catalyst query engine optimizer")
    val near = e.embedOne("spark catalyst query engine planner")
    val far = e.embedOne("banana apricot melon grape kiwi")
    assert(cos(base, near) > cos(base, far))
  }

  test("batch embed matches per-item embed") {
    val texts = Seq("one", "two", "three")
    assert(e.embed(texts).map(_.toSeq) == texts.map(t => e.embedOne(t).toSeq))
  }

  test("ONNX seam: a non-hashing blob-loaded embedder runs ingest + index + query end-to-end") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.{Ingest, VectorIndex}
    val dim = 32
    val model = LinearBlobEmbedder.blob(dim, seed = 9L)
    val emb = new LinearBlobEmbedder(model, dim)
    // distinctive letter distributions so nearest-neighbor is unambiguous
    val docs = Seq(
      (1L, "aaaa aaaa aaaa bb"),
      (2L, "zzzz zzzz zzzz yy"),
      (3L, "mmmm nnnn mmmm nn"),
      (4L, "qqqq rrrr qqqq rr")).toDF("doc_id", "text").repartition(4)
    // the embedder instance crosses the closure boundary; its session
    // must rebuild from the blob per executor (transient lazy), and the
    // E2 dim check must see the REAL output width
    val recs = Ingest.pipeline(docs, emb,
      Ingest.Config(expectedDim = Some(dim)))
    assert(recs.select("values").as[Seq[Float]].collect()
      .forall(v => v.length == dim))
    val root = java.nio.file.Files.createTempDirectory("graft_onnxseam").toString
    val idx = VectorIndex.ensure(spark, s"$root/i", dim)
    idx.upsert(recs)
    // querying with the embedder's own vector for doc 3's text must
    // return doc 3's chunk first, at cosine ~1
    val q = emb.embed(Seq("mmmm nnnn mmmm nn")).head
    val top = idx.query(q, 1).collect().head
    assert(top.getString(0) == "doc-3-0", top.toString)
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-5)
    // and a mismatched declared dim fails fast through the same seam
    intercept[org.apache.spark.SparkException] {
      Ingest.pipeline(docs, emb,
        Ingest.Config(expectedDim = Some(dim + 1))).collect()
    }
  }
}
