package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("training learns the classic merges greedily and deterministically") {
    // "aaabdaaabac": the most frequent pair is (a,a) x4; after merging,
    // (aa,b) x2 wins the second round — the textbook BPE walkthrough
    val m1 = Bpe.train(Seq("aaabdaaabac"), vocabSize = 256 + 3)
    assert(m1.merges.head._1 == (('a'.toInt, 'a'.toInt)))
    // round 2: (aa,a-tail...) recount is [aa,a,b,d,aa,a,b,a,c] — (aa,a)
    // and (a,b) tie at 2; the smaller packed key (a,b) wins the
    // deterministic tie-break
    assert(m1.merges(1)._1 == (('a'.toInt, 'b'.toInt)))
    // deterministic: same input, same merges
    val m2 = Bpe.train(Seq("aaabdaaabac"), vocabSize = 256 + 3)
    assert(m1.merges.toSeq == m2.merges.toSeq)
    // encode applies merges in training order; the result decodes back
    val toks = m1.encode("aaabdaaabac")
    assert(toks.length < "aaabdaaabac".length)
    assert(m1.decode(toks) == "aaabdaaabac")
    // training stops early when no pair repeats (no padding merges)
    val tiny = Bpe.train(Seq("ab"), vocabSize = 512)
    assert(tiny.merges.isEmpty)
  }

  test("byte-level roundtrip is lossless for multi-byte UTF-8 and edge inputs") {
    val corpus = Seq("the quick brown fox", "pack my box with five dozen jugs",
      "sphinx of black quartz judge my vow")
    val model = Bpe.train(corpus, vocabSize = 300)
    for (t <- Seq("", "a", "héllo wörld", "中文分词测试", "mixed 中文 and ascii",
        "emoji 😀 tail", corpus.mkString(" "))) {
      assert(model.decode(model.encode(t)) == t, s"roundtrip failed for: $t")
    }
    // merges never split a UTF-8 code point across decode (byte-level
    // vocab concatenation preserves the exact byte stream)
    val tokens = model.encode("héllo")
    assert(tokens.sum >= 0 && model.decode(tokens) == "héllo")
  }

  test("encodeCol/tokenCountCol run distributed and compress real text") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val model = Bpe.trainOnSample(docs, "text", vocabSize = 512, sampleDocs = 64)
    assert(model.vocabSize > 256, "sample must yield merges")
    val stats = docs.select(
        Bpe.tokenCountCol($"text", model).as("ntok"),
        octet_length($"text").as("nbytes"))
      .agg(sum($"ntok").as("t"), sum($"nbytes").as("b"))
      .as[(Long, Long)].head()
    assert(stats._1 < stats._2, s"BPE must compress: ${stats._1} tokens vs ${stats._2} bytes")
    // encodeCol emits the ids tokenCountCol counts
    val row = docs.limit(1).select($"text",
      Bpe.encodeCol($"text", model).as("ids"),
      Bpe.tokenCountCol($"text", model).as("n")).head()
    val ids = row.getAs[scala.collection.Seq[Int]]("ids")
    assert(ids.length == row.getAs[Int]("n"))
    assert(model.decode(ids.toArray) == row.getString(0))
  }
}
