package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata (BASELINE north star). The zero-egress container ships no
  * codecs, so the decode step is a pluggable trait with a deterministic
  * stub — the Spark-side contract is the real deliverable: binary
  * columns flow through a BATCHED `mapPartitions` (the JVM analogue of
  * `mapInPandas`' Arrow-batch shape: decoder init once per partition,
  * rows processed in bounded batches, output schema typed), and the
  * result is an ordinary column, so partitioning/pushdown/codegen
  * around it are untouched.
  */
object Multimodal {

  /** Typed decode result (what a real image decoder would yield). */
  final case class MediaMeta(format: String, nBytes: Long, width: Int, height: Int)

  /** Decoder boundary: one instance per partition, batch-at-a-time —
    * a real impl would hold codec state / model handles. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[Array[Byte]]): Seq[MediaMeta]
  }

  /** Deterministic stand-in for the absent codecs: "dimensions" derived
    * from byte length. STUB — swap for a PDFBox/javax.imageio/ffmpeg
    * decoder where available; everything around it stays identical. */
  final class StubDecoder extends MediaDecoder {
    override def decodeBatch(batch: Seq[Array[Byte]]): Seq[MediaMeta] =
      batch.map { b =>
        val n = if (b == null) 0L else b.length.toLong
        MediaMeta("stub", n, (320 + n % 320).toInt, (240 + n % 240).toInt)
      }
  }

  private val metaType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Deterministic stub feature extractor: fold the bytes into `dim`
    * seeded accumulators (stands in for a CNN/audio embedder — swap the
    * fold for a real model forward pass; the column contract, width and
    * batching stay identical). */
  def features(bin: org.apache.spark.sql.Column, dim: Int = 64, seed: Long = 42L)
      : org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      val acc = new Array[Float](dim)
      if (b != null) {
        var i = 0
        while (i < b.length) {
          val h = Dedup.splitmix64(seed ^ (i.toLong << 8) ^ (b(i) & 0xFFL))
          acc(i % dim) += (h >>> 40).toFloat / (1 << 24).toFloat - 0.5f
          i += 1
        }
      }
      acc
    }
    f(bin)
  }

  /** Frame sampling stub: treat the blob as an opaque "video" and emit
    * `n` equally-spaced byte-range "frames" (frame i = bytes
    * [i*len/n, (i+1)*len/n)). A real sampler decodes keyframes; the
    * explode shape (one row per (row, frame_index, frame)) and the
    * downstream schema are what the engine contract fixes. */
  def sampleFrames(bin: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) Array.empty[Array[Byte]]
      else Array.tabulate(n) { i =>
        java.util.Arrays.copyOfRange(b, i * b.length / n, (i + 1) * b.length / n)
      }
    }
    f(bin)
  }

  /** Append a `media_meta` struct decoded from `binCol`. Batched
    * mapPartitions: decoder constructed once per partition, inputs
    * grouped into `batchSize` chunks (bounded memory; amortized codec
    * calls), original columns passed through untouched. */
  def withMeta(
      df: DataFrame,
      binCol: String,
      decoder: MediaDecoder = new StubDecoder,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media_meta", metaType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val metas = decoder.decodeBatch(batch.map(r =>
          if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)))
        batch.lazyZip(metas).map { (r, m) =>
          Row.fromSeq(r.toSeq :+ Row(m.format, m.nBytes, m.width, m.height))
        }
      }
    }(enc)
  }
}
