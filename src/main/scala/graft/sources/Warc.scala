package graft.sources

import java.nio.charset.StandardCharsets

/** Dep-free WARC (ISO 28500) archive parse + write — the web-crawl
  * container: 100-TB text corpora arrive as Common-Crawl-style
  * directories of `.warc.gz` shards, each a stream of
  * version-line + headers + Content-Length-framed block records. The
  * reference ingests one uploaded file at a time
  * (`/root/reference/streamlit_app.py:127`); at corpus scale the same
  * ingest runs over crawl shards, so the engine reads them natively
  * ([[graft.operators.Ingest.readWarcRecords]]).
  *
  * Scope: WARC/1.0 and WARC/1.1 records, uncompressed or gzip'd.
  * Compressed shards may be one gzip member for the whole file or —
  * the Common Crawl convention, chosen so a record range is
  * independently fetchable — one gzip member PER RECORD back to back;
  * `java.util.zip.GZIPInputStream` consumes concatenated members
  * natively, so both arrive through the same path. Header names are
  * case-insensitive per the spec; values are UTF-8. A truncated or
  * malformed tail ends iteration with the complete records already
  * parsed, never throws — a half-fetched crawl shard still yields its
  * sound prefix (the same contract as [[Tar.members]]).
  *
  * The writer exists for tests and roundtrip gates and emits
  * spec-shaped records (CRLF line ends, mandatory WARC-Type /
  * WARC-Record-ID / WARC-Date / Content-Length, two CRLFs after the
  * block), optionally one-gzip-member-per-record.
  *
  * Callers materialize one whole shard as a single `Array[Byte]`
  * (binaryFile), so a shard must stay under the JVM's ~2 GB array
  * ceiling — crawl shards are sized ~1 GB for exactly that kind of
  * worker-local handling.
  */
object Warc {
  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** One parsed record: canonical-cased header map (keys lower-cased)
    * plus the raw content block. */
  final case class Record(headers: Map[String, String], block: Array[Byte]) {
    def warcType: String = headers.getOrElse("warc-type", "")
    def targetUri: String = headers.getOrElse("warc-target-uri", "")
    def recordId: String = headers.getOrElse("warc-record-id", "")
    def date: String = headers.getOrElse("warc-date", "")
    def contentType: String = headers.getOrElse("content-type", "")
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B

  /** Inflate a (possibly multi-member) gzip stream fully. GZIPInputStream
    * reads concatenated members transparently, which is exactly the
    * per-record-member WARC convention. A corrupt tail returns the
    * bytes inflated so far (truncation contract). */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
    val buf = new Array[Byte](64 * 1024)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), buf.length)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => /* truncated member: keep prefix */ }
    out.toByteArray
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Iterate records of one shard (gzip'd or not). */
  def records(shard: Array[Byte]): Iterator[Record] = {
    val raw = if (isGzip(shard)) gunzipAll(shard) else shard
    new Iterator[Record] {
      private var off = 0
      private var nextRec: Record = null
      private def advance(): Unit = {
        nextRec = null
        // skip inter-record CRLFs (spec: two after each block; be lenient)
        while (off + 1 < raw.length && raw(off) == '\r' && raw(off + 1) == '\n') off += 2
        if (off >= raw.length) return
        val verEnd = indexOfCrlf(raw, off)
        if (verEnd < 0) { off = raw.length; return }
        val ver = new String(raw, off, verEnd - off, StandardCharsets.US_ASCII)
        if (!ver.startsWith("WARC/")) { off = raw.length; return }
        var p = verEnd + 2
        var headers = Map.empty[String, String]
        var done = false
        while (!done) {
          val lineEnd = indexOfCrlf(raw, p)
          if (lineEnd < 0) { off = raw.length; return } // truncated headers
          if (lineEnd == p) { done = true; p += 2 } // blank line ends headers
          else {
            val line = new String(raw, p, lineEnd - p, StandardCharsets.UTF_8)
            val colon = line.indexOf(':')
            if (colon > 0)
              headers += (line.substring(0, colon).trim.toLowerCase ->
                line.substring(colon + 1).trim)
            p = lineEnd + 2
          }
        }
        val len =
          try headers.getOrElse("content-length", "").toLong
          catch { case _: NumberFormatException => -1L }
        if (len < 0 || p + len > raw.length) { off = raw.length; return } // truncated block
        nextRec = Record(headers,
          java.util.Arrays.copyOfRange(raw, p, (p + len).toInt))
        off = (p + len).toInt
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Record = { val r = nextRec; advance(); r }
    }
  }

  /** Peel the HTTP envelope off an `application/http` response block:
    * returns the body after the first blank line, or the whole block
    * when no HTTP header section is present (lenient — some writers
    * store bare payloads). Chunked transfer encoding is NOT decoded
    * (crawlers store the dechunked payload; Common Crawl does). */
  def httpBody(block: Array[Byte]): Array[Byte] = {
    if (block.length < 5 ||
        !new String(block, 0, 5, StandardCharsets.US_ASCII).startsWith("HTTP/"))
      return block
    var i = 0
    while (i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(block, i + 4, block.length)
      i += 1
    }
    block // headers never ended: treat as bare payload
  }

  /** Write one record's bytes (version line, headers, block, 2 CRLF). */
  private def recordBytes(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(block.length + 256)
    def line(s: String): Unit = {
      out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(Crlf)
    }
    line("WARC/1.0")
    val names = headers.map(_._1.toLowerCase).toSet
    headers.foreach { case (k, v) => line(s"$k: $v") }
    if (!names.contains("warc-record-id"))
      line(s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes(block)}>")
    if (!names.contains("warc-date"))
      line("WARC-Date: 2026-01-01T00:00:00Z") // deterministic archives
    line(s"Content-Length: ${block.length}")
    out.write(Crlf)
    out.write(block)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.finish(); gz.close()
    out.toByteArray
  }

  /** Assemble a shard from (headers, block) records. `gzipPerRecord`
    * writes the Common Crawl layout (one gzip member per record). The
    * caller supplies WARC-Type / WARC-Target-URI / Content-Type;
    * Record-ID and Date are defaulted deterministically if absent,
    * Content-Length is always computed here. */
  def archive(records: Seq[(Seq[(String, String)], Array[Byte])],
      gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (hdrs, block) =>
      val rec = recordBytes(hdrs, block)
      out.write(if (gzipPerRecord) gzipMember(rec) else rec)
    }
    out.toByteArray
  }

  /** Convenience: an `application/http; msgtype=response` record whose
    * block wraps `body` in a minimal HTTP 200 envelope — the shape of
    * a crawl `response` record. */
  def httpResponseRecord(uri: String, body: Array[Byte],
      payloadType: String = "text/html"): (Seq[(String, String)], Array[Byte]) = {
    val http = new java.io.ByteArrayOutputStream(body.length + 128)
    def line(s: String): Unit = {
      http.write(s.getBytes(StandardCharsets.US_ASCII)); http.write(Crlf)
    }
    line("HTTP/1.1 200 OK")
    line(s"Content-Type: $payloadType")
    line(s"Content-Length: ${body.length}")
    http.write(Crlf)
    http.write(body)
    (Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      http.toByteArray)
  }
}
