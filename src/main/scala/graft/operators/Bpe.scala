package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL byte-level BPE (byte-pair encoding) — vocabulary building and
  * tokenization, the op a training-data pipeline runs to size corpora
  * in tokens rather than characters (the reference chunks by
  * characters, streamlit_app.py:34-35; production data work counts
  * model tokens).
  *
  * Byte-level means LOSSLESS by construction: base tokens are the 256
  * byte values, merges concatenate byte sequences, so
  * decode(encode(text)) == text for every input, no unknown tokens —
  * the contract the gate query asserts corpus-wide.
  *
  * Scale shape mirrors PQ/SQ training ([[Ann.trainPq]]): merges are
  * learned ONCE on a bounded, hash-ordered driver sample (vocab
  * learning is a tiny-fraction-of-corpus estimation problem), then the
  * broadcast model encodes the full corpus embarrassingly parallel,
  * one row at a time.
  */
object Bpe {

  /** Learned merge table: (left, right) token ids -> merged id, in
    * learning order (merge PRIORITY = id order: lower merged id =
    * earlier merge = applied first at encode time). */
  final case class Model(merges: Array[((Int, Int), Int)]) extends Serializable {
    // boxed types on purpose: with scala primitives, an absent key's
    // null would silently unbox to rank 0 — the highest priority
    @transient private lazy val rank: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
      val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](merges.length * 2)
      merges.foreach { case ((a, b), id) =>
        m.put(java.lang.Long.valueOf(a.toLong << 32 | b.toLong), Integer.valueOf(id))
      }
      m
    }
    private def rankOf(a: Int, b: Int): Int = {
      val r = rank.get(java.lang.Long.valueOf(a.toLong << 32 | b.toLong))
      if (r == null) Int.MaxValue else r.intValue()
    }

    /** Token byte sequences, id -> bytes (base 256 + one per merge). */
    @transient lazy val vocabBytes: Array[Array[Byte]] = {
      val v = new Array[Array[Byte]](256 + merges.length)
      var i = 0
      while (i < 256) { v(i) = Array(i.toByte); i += 1 }
      merges.foreach { case ((a, b), id) => v(id) = v(a) ++ v(b) }
      v
    }

    def vocabSize: Int = 256 + merges.length

    /** Encode UTF-8 bytes: repeatedly merge the present pair with the
      * LOWEST merge id (training order) until none applies — the
      * standard BPE encode, byte-exact with how the merges were
      * learned. */
    def encode(text: String): Array[Int] = {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bytes.isEmpty) return Array.empty
      var seq = new Array[Int](bytes.length)
      var i = 0
      while (i < bytes.length) { seq(i) = bytes(i) & 0xFF; i += 1 }
      var n = seq.length
      var done = false
      while (!done && n > 1) {
        // find the lowest-rank adjacent pair
        var best = Int.MaxValue
        var j = 0
        while (j < n - 1) {
          val r = rankOf(seq(j), seq(j + 1))
          if (r < best) best = r
          j += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          // merge ALL occurrences of that pair left-to-right
          val (pa, pb) = merges(best - 256)._1
          var w = 0
          var rd = 0
          while (rd < n) {
            if (rd < n - 1 && seq(rd) == pa && seq(rd + 1) == pb) {
              seq(w) = best; rd += 2
            } else { seq(w) = seq(rd); rd += 1 }
            w += 1
          }
          n = w
        }
      }
      java.util.Arrays.copyOf(seq, n)
    }

    /** Lossless inverse: concatenate token byte sequences. */
    def decode(tokens: Array[Int]): String = {
      val out = new java.io.ByteArrayOutputStream()
      tokens.foreach(t => out.write(vocabBytes(t)))
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Learn `vocabSize - 256` merges greedily from the given texts:
    * each round counts adjacent token pairs across the sample and
    * merges the most frequent (ties break on the smaller pair for
    * determinism); stops early when no pair repeats. */
  def train(texts: Seq[String], vocabSize: Int): Model = {
    require(vocabSize > 256, s"vocabSize $vocabSize must exceed the 256 byte base")
    var seqs: Array[Array[Int]] = texts.map { t =>
      t.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(_ & 0xFF)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[((Int, Int), Int)]
    var next = 256
    var exhausted = false
    while (next < vocabSize && !exhausted) {
      val counts = new java.util.HashMap[Long, Long]()
      seqs.foreach { s =>
        var i = 0
        while (i < s.length - 1) {
          val k = s(i).toLong << 32 | s(i + 1)
          counts.merge(k, 1L, _ + _)
          i += 1
        }
      }
      var bestKey = -1L
      var bestCount = 1L // require count >= 2
      counts.forEach { (k, c) =>
        if (c > bestCount || (c == bestCount && bestKey >= 0 && k < bestKey))
          { bestKey = k; bestCount = c }
      }
      if (bestKey < 0) exhausted = true
      else {
        val pa = (bestKey >>> 32).toInt
        val pb = (bestKey & 0xFFFFFFFFL).toInt
        merges += (((pa, pb), next))
        seqs = seqs.map { s =>
          if (s.length < 2) s
          else {
            val out = new Array[Int](s.length)
            var w = 0
            var rd = 0
            while (rd < s.length) {
              if (rd < s.length - 1 && s(rd) == pa && s(rd + 1) == pb) {
                out(w) = next; rd += 2
              } else { out(w) = s(rd); rd += 1 }
              w += 1
            }
            java.util.Arrays.copyOf(out, w)
          }
        }
        next += 1
      }
    }
    Model(merges.toArray)
  }

  /** Train on a bounded, hash-ordered sample of `textCol` (driver-side,
    * like PQ codebook fitting — vocab learning needs a sample, not the
    * corpus; `sampleDocs` caps driver memory). */
  def trainOnSample(df: DataFrame, textCol: String, vocabSize: Int,
      sampleDocs: Int = 256): Model = {
    val sample = df.select(col(textCol).cast("string"))
      .orderBy(xxhash64(col(textCol)))
      .limit(sampleDocs)
      .collect().map(_.getString(0))
    train(sample.toSeq, vocabSize)
  }

  /** Token ids column (broadcast model, embarrassingly parallel). */
  def encodeCol(text: Column, model: Model): Column = {
    val f = udf { (t: String) => if (t == null) null else model.encode(t) }
    f(text)
  }

  /** Token count column — the unit sequence packing should budget by. */
  def tokenCountCol(text: Column, model: Model): Column = {
    val f = udf { (t: String) => if (t == null) 0 else model.encode(t).length }
    f(text)
  }
}
