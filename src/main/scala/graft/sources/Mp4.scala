package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** MP4 / ISO-BMFF (ISO 14496-12) METADATA probe — dependency-free box
  * walking for the multimodal ingest path.
  *
  * The reference ingests opaque uploads (`streamlit_app.py:127`); a
  * training-data pipeline meets millions of video blobs and must
  * triage them — container sanity, duration, track shapes, sample
  * counts — WITHOUT decoding a single frame (decode needs codec libs
  * this environment doesn't have; the metadata layer is pure byte
  * structure, same division as [[Magic]]/[[graft.operators.Multimodal
  * .wavHeader]]). The box grammar is `[size:u32][type:4cc][payload]`
  * with `size==1` → 64-bit largesize and `size==0` → to-EOF;
  * containers (moov/trak/mdia/minf/stbl) nest. The probe extracts:
  *
  *  - `ftyp` major brand
  *  - `mvhd` movie duration (version 0 u32 and version 1 u64 layouts)
  *  - per-`trak`: `hdlr` handler (vide/soun), `tkhd` 16.16-fixed
  *    width/height, `stsz` sample count
  *
  * Truncation-safe: every read is bounds-checked; a malformed size or
  * a cut-off payload stops the walk and reports what parsed, with
  * `ok=false` — ingest never throws on a corrupt blob (the OCR-route
  * error-swallow discipline). A writer half ([[syntheticMp4]]) builds
  * structurally-real fixtures for the golden-bytes spec and the q190
  * arithmetic-oracle gate, the [[graft.operators.Multimodal
  * .syntheticPng]] pattern.
  */
object Mp4 {

  final case class Mp4Meta(ok: Boolean, brand: String, durationMs: Long,
      nTracks: Int, hasVideo: Boolean, hasAudio: Boolean,
      width: Int, height: Int, nSamples: Long, err: String)

  private val Empty = Mp4Meta(ok = false, "", 0L, 0, hasVideo = false,
    hasAudio = false, 0, 0, 0L, "")

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def u64(b: Array[Byte], o: Int): Long = (u32(b, o) << 32) | u32(b, o + 4)
  private def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, US_ASCII)

  private final class Walk(b: Array[Byte]) {
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var hasVideo = false
    var hasAudio = false
    var width = 0
    var height = 0
    var nSamples = 0L
    var err = ""
    var bad = false

    /** Walk the boxes in [from, to); returns false on malformed
      * structure (err set). */
    def boxes(from: Long, to: Long, depth: Int): Boolean = {
      var o = from
      while (o < to) {
        if (o + 8 > to) { err = s"truncated box header at $o"; return false }
        var size = u32(b, o.toInt)
        val t = tag(b, o.toInt + 4)
        var payload = o + 8
        if (size == 0) size = to - o // to end of enclosing box
        else if (size == 1) {
          if (o + 16 > to) { err = s"truncated largesize at $o"; return false }
          size = u64(b, o.toInt + 8)
          payload = o + 16
        }
        if (size < payload - o || o + size > to) {
          err = s"bad box size $size for '$t' at $o"; return false
        }
        val end = o + size
        t match {
          case "ftyp" =>
            if (payload + 4 <= end) brand = tag(b, payload.toInt)
          case "moov" | "mdia" | "minf" | "stbl" =>
            if (depth < 8 && !boxes(payload, end, depth + 1)) return false
          case "trak" =>
            nTracks += 1
            if (depth < 8 && !boxes(payload, end, depth + 1)) return false
          case "mvhd" =>
            if (payload + 1 <= end) {
              val v = b(payload.toInt) & 0xFF
              if (v == 1 && payload + 28 + 8 <= end) {
                timescale = u32(b, payload.toInt + 20)
                duration = u64(b, payload.toInt + 24)
              } else if (v == 0 && payload + 20 + 4 <= end) {
                timescale = u32(b, payload.toInt + 12)
                duration = u32(b, payload.toInt + 16)
              }
            }
          case "tkhd" =>
            if (payload + 1 <= end) {
              val v = b(payload.toInt) & 0xFF
              // width/height are the LAST 8 bytes (16.16 fixed) in
              // both versions
              if (end - 8 >= payload) {
                val w = (u32(b, end.toInt - 8) >> 16).toInt
                val h = (u32(b, end.toInt - 4) >> 16).toInt
                // the audio track's 0x0 must not clobber video dims
                if (w > 0 && h > 0 && v <= 1) { width = w; height = h }
              }
            }
          case "hdlr" =>
            if (payload + 12 + 4 <= end) {
              tag(b, payload.toInt + 8) match {
                case "vide" => hasVideo = true
                case "soun" => hasAudio = true
                case _ => ()
              }
            }
          case "stsz" =>
            if (payload + 12 <= end) nSamples += u32(b, payload.toInt + 8)
          case _ => () // unknown boxes skip by size — forward compatible
        }
        o = end
      }
      true
    }
  }

  /** Parse a blob's MP4 metadata; never throws. `ok=false` carries
    * whatever parsed plus the structural error. A blob that isn't
    * ISO-BMFF at all (no ftyp/moov found) reports ok=false, err set. */
  def probe(bytes: Array[Byte]): Mp4Meta = {
    if (bytes == null || bytes.length < 8)
      return Empty.copy(err = "too short")
    val w = new Walk(bytes)
    val clean = w.boxes(0L, bytes.length.toLong, 0)
    val sane = w.brand.nonEmpty && w.timescale > 0
    val durMs =
      if (w.timescale > 0) w.duration * 1000L / w.timescale else 0L
    Mp4Meta(ok = clean && sane, w.brand, durMs, w.nTracks, w.hasVideo,
      w.hasAudio, w.width, w.height, w.nSamples,
      if (!clean) w.err else if (!sane) "not ISO-BMFF" else "")
  }

  // ---------- writer half (fixtures; the PdfCrypt discipline) ----------

  private def box(t: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val size = payload.length + 8
    out.write(Array[Byte]((size >>> 24).toByte, (size >>> 16).toByte,
      (size >>> 8).toByte, size.toByte))
    out.write(t.getBytes(US_ASCII))
    out.write(payload)
    out.toByteArray
  }
  private def be32(v: Long): Array[Byte] = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def trakBox(handler: String, trackId: Int, duration: Long,
      timescale: Long, width: Int, height: Int, nSamples: Long): Array[Byte] = {
    val tkhd = box("tkhd", cat(be32(7), be32(0), be32(0), be32(trackId),
      be32(0), be32(duration), be32(0), be32(0),
      be16(0), be16(0), be16(if (handler == "soun") 0x0100 else 0), be16(0),
      // identity matrix
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16)))
    val mdhd = box("mdhd", cat(be32(0), be32(0), be32(0), be32(timescale),
      be32(duration), be16(0x55C4), be16(0)))
    val hdlr = box("hdlr", cat(be32(0), be32(0),
      handler.getBytes(US_ASCII), be32(0), be32(0), be32(0), Array[Byte](0)))
    val stsz = box("stsz", cat(be32(0), be32(256), be32(nSamples)))
    val stbl = box("stbl", stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", cat(mdhd, hdlr, minf))
    box("trak", cat(tkhd, mdia))
  }

  /** A minimal structurally-real MP4: ftyp + moov(mvhd + video trak
    * [+ audio trak]); no mdat (metadata-only fixture). */
  def syntheticMp4(durationMs: Long, timescale: Long, width: Int,
      height: Int, videoSamples: Long, audio: Boolean): Array[Byte] = {
    require(timescale > 0 && durationMs >= 0, "bad fixture params")
    val duration = durationMs * timescale / 1000L
    val ftyp = box("ftyp", cat("isom".getBytes(US_ASCII), be32(0x200),
      "isom".getBytes(US_ASCII), "iso2".getBytes(US_ASCII),
      "mp41".getBytes(US_ASCII)))
    val mvhd = box("mvhd", cat(be32(0), be32(0), be32(0), be32(timescale),
      be32(duration), be32(0x00010000L), be16(0x0100), be16(0),
      be32(0), be32(0),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0),
      be32(if (audio) 3 else 2)))
    val video = trakBox("vide", 1, duration, timescale, width, height,
      videoSamples)
    val moov =
      if (audio)
        box("moov", cat(mvhd, video,
          trakBox("soun", 2, duration, timescale, 0, 0, videoSamples * 2)))
      else box("moov", cat(mvhd, video))
    cat(ftyp, moov)
  }

  /** Struct column of [[probe]] over a binary column. */
  def mp4MetaCol(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = org.apache.spark.sql.functions.udf((b: Array[Byte]) => probe(b))
    f(bin)
  }
}
