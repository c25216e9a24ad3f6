package graft.sources

/** Magic-byte content sniffing — the router in front of every binary
  * ingest: a crawl or tar/WARC shard delivers blobs whose extension or
  * Content-Type header lies often enough that pipelines route on the
  * BYTES (a "jpg" that is HTML, a "html" that is a gzip bomb). One
  * cheap pure function classifies a blob so the multimodal decoders,
  * archive exploders and text extractors each receive only what they
  * can parse. Detection is first-match on well-known signatures, then
  * a strict UTF-8 probe; unknown bytes report "binary", never throw. */
object Magic {

  private def has(b: Array[Byte], off: Int, sig: Int*): Boolean =
    b.length >= off + sig.length &&
      sig.indices.forall(i => (b(off + i) & 0xFF) == sig(i))

  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** Case-insensitive ASCII match at `off`. */
  private def asciiCi(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length && s.indices.forall { i =>
      Character.toLowerCase((b(off + i) & 0xFF).toChar) == s.charAt(i)
    }

  /** Classify a blob: pdf, png, jpeg, gif, bmp, wav, riff, gzip, zip,
    * tar, warc, html, xml, text, binary, empty. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return "empty"
    if (ascii(bytes, 0, "%PDF-")) return "pdf"
    if (has(bytes, 0, 0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) return "png"
    if (has(bytes, 0, 0xFF, 0xD8, 0xFF)) return "jpeg"
    if (ascii(bytes, 0, "GIF87a") || ascii(bytes, 0, "GIF89a")) return "gif"
    if (ascii(bytes, 0, "RIFF"))
      return if (ascii(bytes, 8, "WAVE")) "wav" else "riff"
    if (ascii(bytes, 0, "BM") && bytes.length >= 14) return "bmp"
    if (has(bytes, 0, 0x1F, 0x8B)) return "gzip"
    if (has(bytes, 0, 0x50, 0x4B, 0x03, 0x04) ||
      has(bytes, 0, 0x50, 0x4B, 0x05, 0x06)) return "zip"
    if (ascii(bytes, 257, "ustar")) return "tar"
    if (ascii(bytes, 0, "WARC/")) return "warc"
    // markup: skip leading whitespace, then a case-insensitive tag
    var i = 0
    while (i < bytes.length && i < 256 &&
      (bytes(i) == ' ' || bytes(i) == '\t' || bytes(i) == '\r' || bytes(i) == '\n')) i += 1
    if (asciiCi(bytes, i, "<!doctype html") || asciiCi(bytes, i, "<html")) return "html"
    if (ascii(bytes, i, "<?xml")) return "xml"
    // strict UTF-8 probe (the sampled head is enough to reject
    // binaries); a cut mid-character at the probe boundary must not
    // condemn real text, so a truncated probe retries without its
    // last 3 bytes
    def decodes(probe: Array[Byte]): Boolean = {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try {
        // NUL bytes mean "not text" even when technically valid UTF-8
        dec.decode(java.nio.ByteBuffer.wrap(probe)).toString.indexOf(0.toChar) < 0
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    }
    val truncated = bytes.length > 8192
    val probe = if (!truncated) bytes else java.util.Arrays.copyOf(bytes, 8192)
    val isText = decodes(probe) ||
      (truncated && probe.length > 3 &&
        decodes(java.util.Arrays.copyOf(probe, probe.length - 3)))
    if (isText) "text" else "binary"
  }
}
