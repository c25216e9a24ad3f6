package graft

import graft.core.Chunker
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Encodes SURVEY.md §2.B splitter semantics (reference call site
  * /root/reference/streamlit_app.py:34-35). */
class ChunkerSpec extends AnyFunSuite {

  /** Deterministic property loop (scalatestplus not on the classpath). */
  private def forAll[T](gen: Gen[T], n: Int = 200)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  test("no separator at all yields exactly one chunk, even oversize") {
    val text = "x" * 5000 // > chunk_size, no "\n\n"
    assert(Chunker.split(text) == Seq(text))
  }

  test("empty and null text yield no chunks") {
    assert(Chunker.split("") == Seq.empty)
    assert(Chunker.split(null) == Seq.empty)
  }

  test("whitespace-only text yields no chunks (chunks are stripped)") {
    assert(Chunker.split("  \n\n   \n\n ") == Seq.empty)
  }

  test("short text is returned as a single stripped chunk") {
    assert(Chunker.split("  hello world  ") == Seq("hello world"))
  }

  test("fragments merge greedily up to chunk_size including separators") {
    // two 40-char fragments + separator(2) = 82 <= 100 -> one chunk
    val a = "a" * 40
    val b = "b" * 40
    assert(Chunker.split(s"$a\n\n$b", chunkSize = 100, chunkOverlap = 10) ==
      Seq(s"$a\n\n$b"))
    // three 40-char fragments: 40+2+40=82 fits, +2+40=124 > 100 -> split,
    // overlap budget 10 < 40 so no fragment carries over
    val c = "c" * 40
    assert(Chunker.split(s"$a\n\n$b\n\n$c", chunkSize = 100, chunkOverlap = 10) ==
      Seq(s"$a\n\n$b", c))
  }

  test("overlap retains whole trailing fragments within the overlap budget") {
    val a = "a" * 40
    val b = "b" * 8 // 8 <= overlap 10 -> carried into next chunk
    val c = "c" * 80
    assert(Chunker.split(s"$a\n\n$b\n\n$c", chunkSize = 100, chunkOverlap = 10) ==
      Seq(s"$a\n\n$b", s"$b\n\n$c"))
  }

  test("oversize separator-free fragment is emitted as its own oversize chunk") {
    val a = "a" * 10
    val big = "x" * 300
    val b = "b" * 10
    assert(Chunker.split(s"$a\n\n$big\n\n$b", chunkSize = 100, chunkOverlap = 10) ==
      Seq(a, big, b))
  }

  test("empty fragments (consecutive separators) are dropped") {
    assert(Chunker.split("a\n\n\n\nb", chunkSize = 100, chunkOverlap = 10) ==
      Seq("a\n\nb"))
  }

  test("chunks are whitespace-stripped at the boundaries") {
    val got = Chunker.split("  lead\n\ntrail  ", chunkSize = 100, chunkOverlap = 0)
    assert(got == Seq("lead\n\ntrail"))
  }

  test("reference defaults: 2000/100") {
    val frags = (0 until 10).map(i => s"$i" * 500) // 500 chars each
    val text = frags.mkString("\n\n")
    val chunks = Chunker.split(text)
    assert(chunks.nonEmpty)
    // every chunk that contains a separator stays within 2000 chars
    assert(chunks.filter(_.contains("\n\n")).forall(_.length <= 2000))
  }

  private val fragGen = Gen.chooseNum(1, 120).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaNumChar))
  private val textGen = Gen.chooseNum(0, 30)
    .flatMap(k => Gen.listOfN(k, fragGen)).map(_.mkString("\n\n"))

  test("property: all content is preserved — every chunk is a substring of the text") {
    forAll(textGen) { text =>
      Chunker.split(text, chunkSize = 200, chunkOverlap = 30).foreach { c =>
        assert(text.contains(c), s"chunk not found in source: $c")
      }
    }
  }

  test("property: chunks appear in source order and non-empty text chunks") {
    forAll(textGen) { text =>
      val chunks = Chunker.split(text, chunkSize = 200, chunkOverlap = 30)
      if (text.trim.nonEmpty) assert(chunks.nonEmpty)
      // chunk start offsets are non-decreasing in the source text
      val offsets = chunks.scanLeft(0) { (from, c) =>
        val at = text.indexOf(c, math.max(0, from - 35)) // overlap can step back
        assert(at >= 0, s"chunk not found in order: $c")
        at
      }.tail
      assert(offsets == offsets.sorted)
    }
  }

  test("property: chunk boundaries respect size unless a single fragment is oversize") {
    forAll(textGen) { text =>
      val size = 150
      Chunker.split(text, chunkSize = size, chunkOverlap = 20).foreach { c =>
        assert(c.length <= size || !c.contains("\n\n"))
      }
    }
  }
}
