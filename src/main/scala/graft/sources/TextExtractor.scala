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
  * or chained filters (DCTDecode images, LZW, predictors) have no
  * recoverable text layer here, so they contribute "" and
  * [[FallbackExtractor]] routes whitespace-only documents to OCR — the
  * same path the reference takes for scanned pages. Full-fidelity
  * extraction (PDFBox) plugs in at the [[TextExtractor]] trait.
  */
object SimplePdfTextExtractor extends TextExtractor {
  override def extract(content: Array[Byte]): String = {
    // ISO-8859-1 maps bytes 1:1 to chars, so offsets/regexes are exact
    val s = new String(content, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF"))
      throw new IllegalArgumentException("not a PDF (missing %PDF header)")
    // the (?!<<) guard pins group 1 to the innermost << ... >> directly
    // preceding `stream` — the stream's own dict, not an earlier object's
    val streamRe = "(?s)<<((?:(?!<<).)*?)>>\\s*stream\r?\n(.*?)endstream".r
    val out = new StringBuilder
    for (m <- streamRe.findAllMatchIn(s)) {
      val dict = m.group(1)
      if (!dict.contains("/Filter")) shownText(m.group(2), out)
      else if (flateOnly(dict)) {
        // compressed bytes may contain the literal "endstream", which
        // would truncate the regex capture — a direct /Length slices the
        // exact payload from the stream start instead; Inflater ignores
        // any trailing EOL bytes once the zlib stream is finished
        val raw = directLength(dict) match {
          case Some(n) if m.start(2) + n <= s.length => s.substring(m.start(2), m.start(2) + n)
          case _ => m.group(2)
        }
        inflate(raw.getBytes(StandardCharsets.ISO_8859_1)) match {
          case Some(bytes) => shownText(new String(bytes, StandardCharsets.ISO_8859_1), out)
          case None => () // corrupt deflate data: no recoverable text layer
        }
      }
      // other/chained filters: no recoverable text layer, contribute ""
    }
    out.result()
  }

  /** True iff the dict's /Filter is exactly FlateDecode — the bare name
    * or a one-element array. Chained filters (e.g. [/ASCII85Decode
    * /FlateDecode]) and others are out of scope. */
  private def flateOnly(dict: String): Boolean =
    "/Filter\\s*(?:/FlateDecode\\b|\\[\\s*/FlateDecode\\s*\\])".r
      .findFirstIn(dict).isDefined

  /** A direct integer /Length (not an indirect `N G R` reference). */
  private def directLength(dict: String): Option[Int] =
    "/Length\\s+(\\d+)(?!\\s+\\d+\\s+R)".r.findFirstMatchIn(dict)
      .map(_.group(1).toInt)

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
