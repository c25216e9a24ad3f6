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
