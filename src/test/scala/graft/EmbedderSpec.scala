package graft

import graft.core.HashingEmbedder
import org.scalatest.funsuite.AnyFunSuite

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
}
