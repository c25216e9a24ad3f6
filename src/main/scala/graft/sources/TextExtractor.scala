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

/** Text layer of UNCOMPRESSED PDFs — a minimal, dependency-free parser
  * for the subset of the PDF spec where the text layer is directly
  * readable: unfiltered content streams, whose `BT..ET` text blocks
  * show strings via the `Tj`/`TJ`/`'`/`"` operators. Shown strings are
  * concatenated in stream order, one line per text block.
  *
  * Honest scope (ref op A2, streamlit_app.py:60-71): most real-world
  * PDFs FlateDecode their content streams; those have no parsable text
  * layer here, so this extractor yields "" for them and
  * [[FallbackExtractor]] routes to OCR — the same path the reference
  * takes for scanned pages. Full-fidelity extraction (PDFBox) plugs in
  * at the [[TextExtractor]] trait; this class makes the uncompressed
  * case real instead of stubbed, pinned by a golden-bytes fixture spec.
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
      if (!m.group(1).contains("/Filter")) shownText(m.group(2), out)
    }
    out.result()
  }

  private val blockRe = "(?s)BT(.*?)ET".r
  private val strRe = """\(((?:[^()\\]|\\.)*)\)""".r

  /** All string literals inside BT..ET blocks (inside a text block,
    * parenthesized strings are text-show operands), unescaped. */
  private def shownText(body: String, out: StringBuilder): Unit =
    for (b <- blockRe.findAllMatchIn(body)) {
      for (str <- strRe.findAllMatchIn(b.group(1))) out ++= unescape(str.group(1))
      out += '\n'
    }

  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case 'r' => out += '\r'; i += 2
          case 't' => out += '\t'; i += 2
          case 'b' => out += '\b'; i += 2
          case 'f' => out += '\f'; i += 2
          case d if d >= '0' && d <= '7' => // octal \d, \dd, or \ddd
            val end = math.min(i + 4, s.length)
            var j = i + 1
            while (j < end && s.charAt(j) >= '0' && s.charAt(j) <= '7') j += 1
            out += Integer.parseInt(s.substring(i + 1, j), 8).toChar
            i = j
          case other => out += other; i += 2 // \( \) \\ and any escaped char
        }
      } else { out += c; i += 1 }
    }
    out.result()
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
