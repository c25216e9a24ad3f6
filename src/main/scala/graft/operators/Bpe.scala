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
      * learned.
      *
      * O(n log n) in the input length: a doubly-linked list over the
      * token sequence plus a lazy-deletion min-heap of candidate pairs
      * keyed (rank, position) — equal ranks merge left-to-right, the
      * same order as a full left-to-right sweep, so results are
      * identical to the textbook rescan loop while a multi-MB document
      * no longer costs O(n · merges). Stale heap entries (a side
      * already consumed, or the pair changed under it) are detected on
      * pop: the stored rank uniquely identifies the pair it was pushed
      * for, so `rankOf(current pair) == stored rank` is an exact
      * liveness check. */
    def encode(text: String): Array[Int] = {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bytes.isEmpty) return Array.empty
      val n0 = bytes.length
      val ids = new Array[Int](n0)
      val nxt = new Array[Int](n0)
      var i = 0
      while (i < n0) { ids(i) = bytes(i) & 0xFF; nxt(i) = i + 1; i += 1 }
      nxt(n0 - 1) = -1
      val prv = new Array[Int](n0)
      i = 0
      while (i < n0) { prv(i) = i - 1; i += 1 }
      // min-heap of (rank << 32 | pos) — rank and pos are both
      // non-negative ints, so the packed long orders by rank, then pos
      var heap = new Array[Long](math.max(16, n0))
      var heapN = 0
      def push(v: Long): Unit = {
        if (heapN == heap.length) heap = java.util.Arrays.copyOf(heap, heap.length * 2)
        var c = heapN; heap(c) = v; heapN += 1
        while (c > 0 && heap((c - 1) >> 1) > heap(c)) {
          val p = (c - 1) >> 1
          val t = heap(p); heap(p) = heap(c); heap(c) = t
          c = p
        }
      }
      def pop(): Long = {
        val top = heap(0)
        heapN -= 1
        heap(0) = heap(heapN)
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1
          val r = l + 1
          var m = c
          if (l < heapN && heap(l) < heap(m)) m = l
          if (r < heapN && heap(r) < heap(m)) m = r
          if (m == c) done = true
          else { val t = heap(m); heap(m) = heap(c); heap(c) = t; c = m }
        }
        top
      }
      def offer(pos: Int): Unit = {
        val q = nxt(pos)
        if (q >= 0) {
          val r = rankOf(ids(pos), ids(q))
          if (r != Int.MaxValue) push(r.toLong << 32 | pos)
        }
      }
      i = 0
      while (i < n0 - 1) { offer(i); i += 1 }
      var count = n0
      while (heapN > 0) {
        val top = pop()
        val rank = (top >>> 32).toInt
        val p = (top & 0xFFFFFFFFL).toInt
        val q = if (ids(p) >= 0) nxt(p) else -1
        // exact staleness check: the pair this entry was pushed for
        // still sits at p iff its rank (unique per pair) still matches
        if (q >= 0 && ids(q) >= 0 && rankOf(ids(p), ids(q)) == rank) {
          ids(p) = rank // merged id == rank by construction
          ids(q) = -1 // consumed
          nxt(p) = nxt(q)
          if (nxt(q) >= 0) prv(nxt(q)) = p
          count -= 1
          if (prv(p) >= 0) offer(prv(p))
          offer(p)
        }
      }
      val out = new Array[Int](count)
      var w = 0
      var at = 0 // node 0 is never a merge's right side, so it survives
      while (at >= 0) { out(w) = ids(at); w += 1; at = nxt(at) }
      out
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
    * corpus; `sampleDocs` caps driver memory). The value column joins
    * the orderBy as a tie-break (same discipline as [[Ann.trainPq]]):
    * duplicate texts — common in a dedup-bench corpus — share a hash,
    * and without the tie-break sample membership at the limit boundary
    * would depend on partitioning. */
  def trainOnSample(df: DataFrame, textCol: String, vocabSize: Int,
      sampleDocs: Int = 256): Model = {
    val sample = df.select(col(textCol).cast("string").as("_t"))
      .orderBy(xxhash64(col("_t")), col("_t"))
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
