package graft.sources

import java.nio.charset.StandardCharsets

/** Pluggable document-text extraction (SURVEY.md §2.A, ops A1-A3).
  *
  * The reference extracts text per page with PyMuPDF and concatenates
  * pages with no separator (`/root/reference/streamlit_app.py:60-71`),
  * falling back to OCR when the text layer is whitespace-only
  * (`:65-69,73-86`), and swallowing per-page OCR errors to ""
  * (`:84-86`). This environment has no PDF/OCR JVM libraries (offline
  * resolver), so extraction is a trait: production plugs PDFBox/Tess4J
  * here; the default implementations are pure-JVM and deterministic so
  * the *pipeline* (binaryFile scan -> extract -> ocr-fallback branch ->
  * chunk -> embed -> index) is fully real and testable.
  */
trait TextExtractor extends Serializable {
  /** Extract the full text of one document; implementations must throw
    * on undecodable input (ref raises ValueError, streamlit_app.py:70-71). */
  def extract(content: Array[Byte]): String
}

/** Default: treat the blob as UTF-8 text (the testable path — TESTDATA's
  * `documents.text` stands in for extracted PDF text, FIXTURES.md). */
object Utf8TextExtractor extends TextExtractor {
  override def extract(content: Array[Byte]): String =
    new String(content, StandardCharsets.UTF_8)
}

/** Text layer parser for unfiltered and FlateDecode'd PDFs — a minimal,
  * dependency-free parser for the subset of the PDF spec where the text
  * layer is recoverable: content streams that are either unfiltered or
  * compressed with `/FlateDecode` (zlib — the overwhelmingly common case
  * in real-world PDFs, inflated here with the JDK's
  * `java.util.zip.Inflater`, zero new deps). Each stream's `BT..ET` text
  * blocks show strings via the `Tj`/`TJ`/`'`/`"` operators; shown
  * strings are concatenated in stream order, one line per text block.
  * Pages concatenate with no extra separator, matching the reference
  * (streamlit_app.py:63).
  *
  * Honest scope (ref op A2, streamlit_app.py:60-71): streams with other
  * or chained filters (DCTDecode images, LZW), or any `/DecodeParms`/`/DP`
  * predictor (flate+predictor xref/object streams, ubiquitous in PDF
  * 1.5+), have no recoverable text layer here, so they contribute "" and
  * [[FallbackExtractor]] routes whitespace-only documents to OCR — the
  * same path the reference takes for scanned pages. Hex show-text
  * operands (`<48656C6C6F> Tj`) decode as raw Latin-1 bytes; subset-font
  * CMap/ToUnicode remapping is PDFBox territory and out of scope.
  * Full-fidelity extraction (PDFBox) plugs in at the [[TextExtractor]]
  * trait.
  */
object SimplePdfTextExtractor extends TextExtractor {
  override def extract(content: Array[Byte]): String = {
    // ISO-8859-1 maps bytes 1:1 to chars, so offsets/scans are exact
    val s = new String(content, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF"))
      throw new IllegalArgumentException("not a PDF (missing %PDF header)")
    val out = new StringBuilder
    // Explicit scan (not a regex over the whole doc): a regex dict capture
    // either breaks on nested sub-dicts (/DecodeParms << ... >>) or
    // truncates at a literal "endstream" inside compressed payload bytes.
    // Here each `stream` keyword anchors a backward balanced-dict scan and
    // a forward payload scan, and the resume position always lands past
    // the stream actually consumed.
    var pos = 0
    var k = s.indexOf("stream", pos)
    while (k >= 0) {
      // keyword check: preceded (after optional EOL/space) by the dict's
      // ">>" — this also rejects the "stream" inside "endstream"
      var d = k - 1
      while (d >= 0 && s.charAt(d).isWhitespace) d -= 1
      if (d >= 1 && s.charAt(d) == '>' && s.charAt(d - 1) == '>') {
        val dict = balancedDict(s, d)
        var dataStart = k + 6
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        // any predictor (/DecodeParms, abbreviated /DP) means the inflated
        // bytes are row-filtered binary, never a text layer
        val hasParms = "/(?:DecodeParms|DP)\\b".r.findFirstIn(dict).isDefined
        val lenEnd = directLength(dict).collect {
          case n if dataStart + n.toLong <= s.length => dataStart + n
        }
        if (!hasParms && !dict.contains("/Filter")) {
          val end = lenEnd.getOrElse {
            val e = s.indexOf("endstream", dataStart); if (e < 0) s.length else e
          }
          shownText(s.substring(dataStart, end), out)
          pos = skipEndstream(s, end)
        } else if (!hasParms && flateOnly(dict)) {
          lenEnd match {
            case Some(end) =>
              // exact payload slice defeats embedded literal "endstream";
              // Inflater ignores trailing EOL bytes past the zlib stream
              inflate(s.substring(dataStart, end).getBytes(StandardCharsets.ISO_8859_1))
                .foreach(b => shownText(new String(b, StandardCharsets.ISO_8859_1), out))
              pos = skipEndstream(s, end)
            case None =>
              // indirect/absent /Length: the first "endstream" may sit
              // INSIDE the compressed bytes. Try successive candidates —
              // truncated zlib data inflates to None, the true boundary
              // inflates cleanly — and resume past the accepted one.
              var e = s.indexOf("endstream", dataStart)
              var attempts = 0
              var done = false
              while (!done && e >= 0 && attempts < 8) {
                inflate(s.substring(dataStart, e).getBytes(StandardCharsets.ISO_8859_1)) match {
                  case Some(b) =>
                    shownText(new String(b, StandardCharsets.ISO_8859_1), out)
                    done = true
                  case None =>
                    attempts += 1
                    if (attempts < 8) e = s.indexOf("endstream", e + 9)
                }
              }
              pos =
                if (done) e + 9
                else skipEndstream(s, dataStart) // corrupt: no text layer
          }
        } else {
          // other/chained filters or predicator streams: no recoverable
          // text; skip past the payload (length-guided when possible)
          pos = skipEndstream(s, lenEnd.getOrElse(dataStart))
        }
      } else pos = k + 6
      k = s.indexOf("stream", pos)
    }
    out.result()
  }

  /** Resume index just past the first "endstream" at/after `from`. */
  private def skipEndstream(s: String, from: Int): Int = {
    val e = s.indexOf("endstream", from)
    if (e < 0) s.length else e + 9
  }

  /** The innermost balanced `<< ... >>` whose closing ">>" ends at
    * `closeEnd` (index of the second '>'). One nesting level deep or
    * more — sub-dicts like `/DecodeParms << /Predictor 12 >>` stay part
    * of the captured stream dict instead of hijacking the capture. */
  private def balancedDict(s: String, closeEnd: Int): String = {
    var depth = 1
    var i = closeEnd - 2
    while (i > 0 && depth > 0) {
      if (s.charAt(i) == '<' && s.charAt(i - 1) == '<') {
        depth -= 1
        if (depth == 0) return s.substring(i + 1, closeEnd - 1)
        i -= 2
      } else if (s.charAt(i) == '>' && s.charAt(i - 1) == '>') { depth += 1; i -= 2 }
      else i -= 1
    }
    "" // unbalanced: treat as no dict (stream skipped by caller's checks)
  }

  /** True iff the dict's /Filter is exactly FlateDecode — the bare name
    * or a one-element array. Chained filters (e.g. [/ASCII85Decode
    * /FlateDecode]) and others are out of scope. */
  private def flateOnly(dict: String): Boolean =
    "/Filter\\s*(?:/FlateDecode\\b|\\[\\s*/FlateDecode\\s*\\])".r
      .findFirstIn(dict).isDefined

  /** A direct integer /Length (not an indirect `N G R` reference). The
    * possessive `\d++` is load-bearing: with a greedy `\d+`, "/Length 10
    * 0 R" backtracks the capture to "1" so the negative lookahead
    * passes, misreporting an indirect ref as a tiny direct length. */
  private def directLength(dict: String): Option[Int] =
    "/Length\\s+(\\d++)(?!\\s+\\d+\\s+R)".r.findFirstMatchIn(dict)
      .flatMap(_.group(1).toIntOption)

  /** zlib-inflate; None on truncated/corrupt data or a preset-dictionary
    * stream (never used by PDF producers). */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) return None
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Tokenizing scan of one content stream: string literals are parsed
    * with full escape/nesting rules FIRST, so a ")", "BT" or "ET" inside
    * shown text can never be mistaken for an operator (a regex over the
    * raw bytes truncates the block at e.g. "QUIET"); `BT`/`ET` are
    * recognized only as standalone operator tokens. Strings shown inside
    * a text block are appended in stream order; one line per block. */
  private def shownText(body: String, out: StringBuilder): Unit = {
    var i = 0
    var inText = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '(') {
        val (str, next) = parseString(body, i)
        if (inText) out ++= str
        i = next
      } else if (c == '<') {
        if (i + 1 < body.length && body.charAt(i + 1) == '<') i += 2 // dict, not a string
        else {
          val (str, next) = parseHexString(body, i)
          if (inText) out ++= str
          i = next
        }
      } else if (c == '%') { // comment to end of line
        while (i < body.length && body.charAt(i) != '\n' && body.charAt(i) != '\r') i += 1
      } else if (c.isLetter || c == '\'' || c == '"') {
        var j = i
        while (j < body.length && !isDelimiter(body.charAt(j))) j += 1
        body.substring(i, j) match {
          case "BT" => inText = true
          case "ET" => if (inText) out += '\n'; inText = false
          case _ => () // Tf/Td/Tj/TJ/... — positioning ignored, order kept
        }
        i = j
      } else i += 1
    }
  }

  /** One PDF hex string starting at `start` (the '<'): pairs of hex
    * digits are bytes, whitespace is ignored, an odd final digit gets an
    * implied trailing '0' (PDF 32000-1 §7.3.4.3). Bytes map 1:1 to chars
    * (ISO-8859-1) — the simple-encoding case; subset-font CMaps are out
    * of scope (see object scaladoc). Returns (text, index past '>'). */
  private def parseHexString(s: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var hi = -1 // pending high nibble, -1 = none
    var i = start + 1
    var open = true
    while (i < s.length && open) {
      val c = s.charAt(i)
      if (c == '>') open = false
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out += ((hi << 4) | d).toChar; hi = -1 }
        } // whitespace (and, leniently, any non-hex byte) is skipped
      }
      i += 1
    }
    if (hi >= 0) out += (hi << 4).toChar // odd count: implied trailing 0
    (out.result(), i)
  }

  private def isDelimiter(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c.toInt) >= 0

  /** One PDF string literal starting at `start` (the '('): balanced
    * unescaped parens nest (legal and common), backslash escapes incl.
    * octal and line continuation. Returns (unescaped text, index past
    * the closing paren). */
  private def parseString(s: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case 'r' => out += '\r'; i += 2
          case 't' => out += '\t'; i += 2
          case 'b' => out += '\b'; i += 2
          case 'f' => out += '\f'; i += 2
          case '\r' => // line continuation: no output
            i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' => // octal \d, \dd, or \ddd
            val end = math.min(i + 4, s.length)
            var j = i + 1
            while (j < end && s.charAt(j) >= '0' && s.charAt(j) <= '7') j += 1
            out += Integer.parseInt(s.substring(i + 1, j), 8).toChar
            i = j
          case other => out += other; i += 2 // \( \) \\ and any escaped char
        }
      } else if (c == '(') { depth += 1; out += c; i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) out += c; i += 1 }
      else { out += c; i += 1 }
    }
    (out.result(), i)
  }
}

/** OCR boundary (ref op A3). Real impl = rasterize + Tesseract; the
  * deterministic stub returns "" per page exactly like the reference's
  * per-image error path (streamlit_app.py:84-86). */
trait OcrExtractor extends Serializable {
  def ocr(content: Array[Byte]): String
}

object NoopOcrExtractor extends OcrExtractor {
  override def ocr(content: Array[Byte]): String = ""
}

/** Composite mirroring the reference's control flow: text layer first,
  * OCR only when the extracted text is whitespace-only
  * (streamlit_app.py:64-69). */
final class FallbackExtractor(
    primary: TextExtractor = Utf8TextExtractor,
    ocr: OcrExtractor = NoopOcrExtractor) extends TextExtractor {
  override def extract(content: Array[Byte]): String = {
    val text = primary.extract(content)
    if (text != null && text.trim.nonEmpty) text else ocr.ocr(content)
  }
}
