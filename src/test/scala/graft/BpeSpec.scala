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

  test("heap encode matches the textbook rescan loop and handles a 1 MB document fast") {
    val corpus = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow")
    val model = Bpe.train(corpus, vocabSize = 600)
    // reference implementation: the O(n · merges) full-rescan loop the
    // heap encode replaced — results must be identical token-for-token
    def rescanEncode(text: String): Array[Int] = {
      val bytes = text.getBytes("UTF-8")
      if (bytes.isEmpty) return Array.empty
      val rank = model.merges.map { case (p, id) => p -> id }.toMap
      var seq = bytes.map(_ & 0xFF)
      var done = false
      while (!done && seq.length > 1) {
        val best = seq.indices.dropRight(1)
          .map(j => rank.getOrElse((seq(j), seq(j + 1)), Int.MaxValue)).min
        if (best == Int.MaxValue) done = true
        else {
          val (pa, pb) = model.merges(best - 256)._1
          val out = scala.collection.mutable.ArrayBuffer.empty[Int]
          var rd = 0
          while (rd < seq.length) {
            if (rd < seq.length - 1 && seq(rd) == pa && seq(rd + 1) == pb) {
              out += best; rd += 2
            } else { out += seq(rd); rd += 1 }
          }
          seq = out.toArray
        }
      }
      seq
    }
    for (t <- Seq("", "a", "aa", "the quick brown fox", "zzzz unseen zzzz",
        corpus.mkString(" "), "héllo wörld 中文", "aaaaaaaaaaaaaaaa")) {
      assert(model.encode(t).toSeq == rescanEncode(t).toSeq, s"diverged on: $t")
      assert(model.decode(model.encode(t)) == t)
    }
    // the whole point of the heap: a document-sized input encodes in
    // O(n log n), not O(n · merges) — 1 MB well under a second
    val big = new StringBuilder
    while (big.length < (1 << 20)) big ++= corpus(big.length % 3) += ' '
    val doc = big.toString
    val t0 = System.nanoTime()
    val toks = model.encode(doc)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(model.decode(toks) == doc)
    assert(elapsedMs < 1000.0, s"1 MB encode took ${elapsedMs}ms")
  }

  test("trainOnSample is stable under duplicated texts and repartitioning") {
    // duplicate texts share an xxhash64; the value tie-break keeps the
    // sample (and thus the learned merges) independent of partitioning
    val texts = (0 until 40).flatMap(i => Seq.fill(5)(s"duplicated document number $i"))
    val df1 = texts.toDF("text")
    val df2 = texts.reverse.toDF("text").repartition(7)
    val m1 = Bpe.trainOnSample(df1, "text", vocabSize = 300, sampleDocs = 100)
    val m2 = Bpe.trainOnSample(df2, "text", vocabSize = 300, sampleDocs = 100)
    assert(m1.merges.toSeq == m2.merges.toSeq)
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
