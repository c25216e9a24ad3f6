package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata (BASELINE north star). Binary columns flow through a
  * BATCHED `mapPartitions` (the JVM analogue of `mapInPandas`' Arrow-
  * batch shape: decoder init once per partition, rows processed in
  * bounded batches, output schema typed), and the result is an ordinary
  * column, so partitioning/pushdown/codegen around it are untouched.
  *
  * Codec reality in this zero-egress container: **image decode is REAL**
  * (the JDK ships `javax.imageio` — PNG/JPEG/BMP/GIF/WBMP, headless-
  * safe, see [[ImageIoDecoder]]/[[withImageStats]]), **WAV/PCM audio
  * parsing is REAL** (dep-free RIFF chunk walk, [[wavHeader]]/
  * [[withAudioMeta]]). Video keyframe decode has no JDK codec, so frame
  * sampling stays a documented byte-range stub ([[sampleFrames]]), as
  * does the generic [[StubDecoder]] kept for format-agnostic plumbing
  * tests.
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

  /** Real image metadata via the JDK's `javax.imageio`: format + dims
    * come from the stream header (no full pixel decode — a reader
    * parses IHDR/SOF/etc. only), so this is cheap enough for a
    * 100 TB metadata sweep. Undecodable blobs yield
    * ("unknown", n, 0, 0) rather than failing the batch (the ref
    * swallows per-page decode errors, streamlit_app.py:84-86). */
  final class ImageIoDecoder extends MediaDecoder {
    override def decodeBatch(batch: Seq[Array[Byte]]): Seq[MediaMeta] =
      batch.map { b =>
        if (b == null) MediaMeta("unknown", 0L, 0, 0)
        else imageHeader(b) match {
          case Some((fmt, w, h)) => MediaMeta(fmt, b.length.toLong, w, h)
          case None => MediaMeta("unknown", b.length.toLong, 0, 0)
        }
      }
  }

  /** (format, width, height) from the image header. Returns None for
    * bytes no registered ImageIO reader recognizes. */
  def imageHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    javax.imageio.ImageIO.setUseCache(false) // no tmp-file spooling on executors
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally if (iis != null) iis.close()
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

  private val imageStatsType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("avg_r", IntegerType, nullable = false),
    StructField("avg_g", IntegerType, nullable = false),
    StructField("avg_b", IntegerType, nullable = false)))

  /** Append an `image_stats` struct — REAL full-pixel decode through
    * `javax.imageio` (format, dims, per-channel mean in [0,255]) — via
    * the same batched-mapPartitions shape as [[withMeta]]. Undecodable
    * or null blobs yield a null struct. Means are floor(sum/pixels),
    * exact for solid fills (the oracle-checkable case). */
  def withImageStats(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("image_stats", imageStatsType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val stats =
            if (r.isNullAt(binIdx)) null
            else decodeImageStats(r.getAs[Array[Byte]](binIdx)).map { s =>
              Row(s._1, s._2, s._3, s._4, s._5, s._6)
            }.orNull
          Row.fromSeq(r.toSeq :+ stats)
        }
      }
    }(enc)
  }

  /** Full decode + channel means; None when no reader takes the bytes. */
  private def decodeImageStats(bytes: Array[Byte])
      : Option[(String, Int, Int, Int, Int, Int)] =
    try {
      imageHeader(bytes).flatMap { case (fmt, _, _) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
            i += 1
          }
          val n = px.length.toLong
          Some((fmt, w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt))
        }
      }
    } catch { case _: Exception => None }

  /** Deterministic solid-fill PNG — the closed-form test/oracle vehicle:
    * PNG is lossless, so decode must return exactly (w, h, r, g, b). */
  def syntheticPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    img.setRGB(0, 0, width, height, Array.fill(width * height)(rgb), 0, width)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image resize (JDK `Graphics2D`, bilinear) re-encoded as PNG.
    * None when the input is undecodable. Solid fills stay exactly solid
    * under any interpolation — the oracle-checkable invariant. */
  def resizeImage(bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (src == null || width <= 0 || height <= 0) None
      else {
        val dst = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, width, height, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Append `outCol` = `binCol` resized to width x height (PNG bytes;
    * null for undecodable inputs). Batched mapPartitions, same contract
    * as [[withMeta]]. */
  def withResized(df: DataFrame, binCol: String, outCol: String,
      width: Int, height: Int, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val resized =
            if (r.isNullAt(binIdx)) null
            else resizeImage(r.getAs[Array[Byte]](binIdx), width, height).orNull
          Row.fromSeq(r.toSeq :+ resized)
        }
      }
    }(enc)
  }

  /** Perceptual difference-hash (dHash) over REAL decoded pixels: the
    * image is block-averaged to a 9x8 luminance grid (deterministic
    * integer arithmetic — no resampler variance), and bit (x, y) is set
    * when grid(x+1, y) > grid(x, y). Near-duplicate images land within
    * a few bits of Hamming distance, so the existing near-dup machinery
    * (band the 64-bit hash, verify in-bucket — `Dedup.simhash` shape)
    * applies to image columns unchanged. None for undecodable bytes. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val (gw, gh) = (9, 8)
        val grid = Array.ofDim[Long](gw, gh) // luminance sums then means
        val cnt = Array.ofDim[Long](gw, gh)
        var y = 0
        while (y < h) {
          val gy = math.min(y * gh / h, gh - 1)
          var x = 0
          while (x < w) {
            val gx = math.min(x * gw / w, gw - 1)
            val p = px(y * w + x)
            // integer BT.601-ish luma: (77R + 150G + 29B) >> 8
            val luma = (77 * ((p >> 16) & 0xFF) + 150 * ((p >> 8) & 0xFF) +
              29 * (p & 0xFF)) >> 8
            grid(gx)(gy) += luma
            cnt(gx)(gy) += 1
            x += 1
          }
          y += 1
        }
        var bits = 0L
        var i = 0
        while (i < 64) {
          val (gx, gy) = (i % 8, i / 8)
          val a = if (cnt(gx)(gy) == 0) 0L else grid(gx)(gy) / cnt(gx)(gy)
          val b = if (cnt(gx + 1)(gy) == 0) 0L else grid(gx + 1)(gy) / cnt(gx + 1)(gy)
          if (b > a) bits |= (1L << i)
          i += 1
        }
        Some(bits)
      }
    } catch { case _: Exception => None }

  /** REAL image feature vector from decoded pixels: the image is
    * block-averaged to a `grid` x `grid` raster and each cell emits its
    * mean (R, G, B) scaled to [0, 1] — 3*grid^2 floats of genuine
    * visual signal (layout + palette), the classic pre-CNN baseline.
    * Deterministic integer pooling (no resampler variance); compatible
    * with every embedding operator (cosine ANN, embedding dedup,
    * vector index). None for undecodable bytes. */
  def gridFeatures(bytes: Array[Byte], grid: Int = 4): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val sums = Array.ofDim[Long](grid * grid, 3)
        val cnts = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          val gy = math.min(y * grid / h, grid - 1)
          var x = 0
          while (x < w) {
            val gx = math.min(x * grid / w, grid - 1)
            val cell = gy * grid + gx
            val p = px(y * w + x)
            sums(cell)(0) += (p >> 16) & 0xFF
            sums(cell)(1) += (p >> 8) & 0xFF
            sums(cell)(2) += p & 0xFF
            cnts(cell) += 1
            x += 1
          }
          y += 1
        }
        val out = new Array[Float](3 * grid * grid)
        var c = 0
        while (c < grid * grid) {
          val n = math.max(1L, cnts(c))
          out(3 * c) = (sums(c)(0).toDouble / n / 255.0).toFloat
          out(3 * c + 1) = (sums(c)(1).toDouble / n / 255.0).toFloat
          out(3 * c + 2) = (sums(c)(2).toDouble / n / 255.0).toFloat
          c += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** [[gridFeatures]] as a column (nullable array<float>). */
  def gridFeaturesCol(bin: org.apache.spark.sql.Column, grid: Int = 4)
      : org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) None else gridFeatures(b, grid)
    }
    f(bin)
  }

  /** `dHash` as a column (nullable long) for image near-dup pipelines. */
  def dHashCol(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf { (b: Array[Byte]) =>
      if (b == null) None else dHash(b)
    }
    f(bin)
  }

  /** Typed audio metadata (the WAV analogue of [[MediaMeta]]). */
  final case class AudioMeta(
      format: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long)

  private val audioMetaType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** REAL dep-free WAV (RIFF) parse: walks the chunk list for `fmt ` +
    * `data`, honoring chunk sizes and word alignment — extra chunks
    * (LIST/INFO/fact) are skipped, not tripped over. PCM and IEEE-float
    * formats accepted. None on anything that is not a complete WAV. */
  def wavHeader(bytes: Array[Byte]): Option[AudioMeta] = {
    def le16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, rate, bits)
    var dataBytes = -1L
    var o = 12
    while (o + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = tag(o)
      val sz = le32(o + 4)
      if (id == "fmt " && o + 8 + 16 <= bytes.length)
        fmt = Some((le16(o + 8), le16(o + 10), le32(o + 12).toInt, le16(o + 22)))
      else if (id == "data")
        dataBytes = math.min(sz, bytes.length.toLong - (o + 8)) // tolerate truncation claims
      if (sz > Int.MaxValue - 16) o = bytes.length // absurd chunk size: stop the walk
      else o += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    fmt.collect {
      case (af, ch, rate, bits)
          if (af == 1 || af == 3) && ch > 0 && bits > 0 && (bits % 8 == 0) &&
            rate > 0 && dataBytes >= 0 =>
        AudioMeta("wav", rate, ch, bits, dataBytes / (ch.toLong * (bits / 8)))
    }
  }

  /** Deterministic PCM16 WAV (hash-derived samples) — closed-form
    * header fields for the oracle; sample VALUES only matter for being
    * reproducible. */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val dataBytes = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < nFrames * channels) {
      bb.putShort((Dedup.splitmix64(seed ^ i.toLong) >>> 48).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL PCM16 DSP over the decoded sample stream: energy (sum of
    * squared samples), peak amplitude, and zero-crossing count (a sign
    * flip between consecutive samples of the interleaved stream). All
    * integer arithmetic — exact, engine-independent, oracle-checkable.
    * None for non-WAV or non-16-bit payloads. */
  def pcmStats(bytes: Array[Byte]): Option[(Long, Int, Long)] =
    wavHeader(bytes).filter(_.bitsPerSample == 16).flatMap { m =>
      // locate the data chunk again (wavHeader validated the layout)
      def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def le32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      var o = 12
      var dataOff = -1
      var dataLen = 0L
      while (o + 8 <= bytes.length && dataOff < 0) {
        val sz = le32(o + 4)
        if (tag(o) == "data") {
          dataOff = o + 8
          dataLen = math.min(sz, bytes.length.toLong - dataOff)
        }
        if (sz > Int.MaxValue - 16) o = bytes.length
        else o += 8 + sz.toInt + (sz.toInt & 1)
      }
      if (dataOff < 0) None
      else {
        val nSamples = (dataLen / 2).toInt
        var (sumSq, peak, crossings) = (0L, 0, 0L)
        var prevNeg = false
        var first = true
        var i = 0
        while (i < nSamples) {
          val off = dataOff + 2 * i
          val v = ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort.toInt
          sumSq += v.toLong * v
          val a = math.abs(v)
          if (a > peak) peak = a
          val neg = v < 0
          if (!first && neg != prevNeg) crossings += 1
          prevNeg = neg
          first = false
          i += 1
        }
        Some((sumSq, peak, crossings))
      }
    }

  private val audioStatsType = StructType(Seq(
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))

  /** Append an `audio_stats` struct ([[pcmStats]]; null for non-PCM16
    * blobs) — batched mapPartitions, same contract as [[withMeta]]. */
  def withAudioStats(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("audio_stats", audioStatsType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val stats =
            if (r.isNullAt(binIdx)) null
            else pcmStats(r.getAs[Array[Byte]](binIdx))
              .map { case (s, p, z) => Row(s, p, z) }.orNull
          Row.fromSeq(r.toSeq :+ stats)
        }
      }
    }(enc)
  }

  /** Deterministic PCM16 ramp WAV: sample i (interleaved stream order)
    * has value ((i mod 512) - 256) * 64 — closed-form in SQL, so energy
    * / peak / crossings have an arithmetic oracle. */
  def rampWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val dataBytes = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < nFrames * channels) {
      bb.putShort((((i % 512) - 256) * 64).toShort)
      i += 1
    }
    bb.array()
  }

  /** Append an `audio_meta` struct parsed from `binCol` (null struct
    * for non-WAV bytes) — batched mapPartitions, same contract as
    * [[withMeta]]. */
  def withAudioMeta(df: DataFrame, binCol: String, batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("audio_meta", audioMetaType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val meta =
            if (r.isNullAt(binIdx)) null
            else wavHeader(r.getAs[Array[Byte]](binIdx)).map { m =>
              Row(m.format, m.sampleRate, m.channels, m.bitsPerSample, m.nFrames)
            }.orNull
          Row.fromSeq(r.toSeq :+ meta)
        }
      }
    }(enc)
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
