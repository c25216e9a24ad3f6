package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perplexity-style quality scoring with a byte-trigram language model
  * — the CCNet-shaped signal: documents that look like the corpus's
  * language score low bits-per-byte, boilerplate/garbled/shuffled text
  * scores high, and the score is a filter/bucketing column for
  * training-data curation. (Production CCNet uses a KenLM 5-gram over
  * wordpieces; this is the honest dep-free analogue with the same
  * pipeline shape.)
  *
  * Scale shape: training is the wordcount pattern — per-doc packed
  * trigram keys, map-side partial aggregation, top-K trigrams via
  * TakeOrderedAndProject (bounded driver/broadcast size) plus an EXACT
  * 16-bit context-count table (<= 65536 rows). Scoring is a broadcast-
  * model per-row column, embarrassingly parallel.
  */
object NgramLm {

  /** counts: packed (ctx16 << 8 | byte) -> trigram count (top-K only);
    * ctxCounts: dense 65536-entry EXACT context totals. Smoothing is
    * add-alpha over the 256-byte alphabet. */
  final case class Model(
      counts: java.util.HashMap[Integer, java.lang.Long],
      ctxCounts: Array[Long],
      alpha: Double) extends Serializable {

    /** Mean bits per byte under the trigram model (lower = more like
      * the training corpus). Texts shorter than 3 bytes score the
      * uniform-model 8.0. */
    def bitsPerByte(text: String): Double = {
      val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.length < 3) return 8.0
      var bits = 0.0
      var i = 2
      while (i < b.length) {
        val ctx = ((b(i - 2) & 0xFF) << 8) | (b(i - 1) & 0xFF)
        val key = (ctx << 8) | (b(i) & 0xFF)
        val c = counts.get(Integer.valueOf(key))
        val num = (if (c == null) 0L else c.longValue()).toDouble + alpha
        val den = ctxCounts(ctx).toDouble + alpha * 256.0
        bits -= math.log(num / den) / math.log(2.0)
        i += 1
      }
      bits / (b.length - 2)
    }
  }

  private def keysUdf = udf { (t: String) =>
    if (t == null) Array.empty[Int]
    else {
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (b.length < 3) Array.empty[Int]
      else Array.tabulate(b.length - 2) { i =>
        (((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)) << 8 | (b(i + 2) & 0xFF)
      }
    }
  }

  /** Train on `textCol`: distributed trigram counting (map-side
    * partial agg), top-K trigrams kept (TakeOrderedAndProject — the
    * broadcast-size knob), EXACT dense context table.
    *
    * ONE corpus scan: the exploded trigrams are grouped once and the
    * grouped counts pinned (<= 2^24 rows regardless of corpus size);
    * both the top-K pass and the context table (re-aggregating
    * `k >>> 8` over the grouped counts — exact, since ctx count =
    * sum of its trigram counts) read that materialized result instead
    * of re-exploding the corpus. */
  def train(df: DataFrame, textCol: String, topK: Int = 200000,
      alpha: Double = 0.5): Model = {
    val grouped = df.select(explode(keysUdf(col(textCol))).as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val top = grouped
      .orderBy(desc("c"), asc("k")) // deterministic under count ties
      .limit(topK)
      .collect()
    val counts = new java.util.HashMap[Integer, java.lang.Long](top.length * 2)
    top.foreach(r => counts.put(Integer.valueOf(r.getInt(0)),
      java.lang.Long.valueOf(r.getLong(1))))
    val ctx = grouped
      .groupBy(shiftrightunsigned(col("k"), 8).cast("int").as("ctx"))
      .agg(sum(col("c")).as("c"))
      .collect() // exact, <= 65536 rows
    val ctxCounts = new Array[Long](65536)
    ctx.foreach(r => ctxCounts(r.getInt(0)) = r.getLong(1))
    Model(counts, ctxCounts, alpha)
  }

  /** Bits-per-byte column under a broadcast model. */
  def bitsPerByteCol(text: Column, model: Model): Column = {
    val f = udf { (t: String) => if (t == null) 8.0 else model.bitsPerByte(t) }
    f(text)
  }
}
