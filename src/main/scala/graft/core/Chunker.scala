package graft.core

/** Fixed-size character chunking with overlap.
  *
  * Reproduces the splitter semantics the reference configures at
  * `/root/reference/streamlit_app.py:34-35` (`CharacterTextSplitter(
  * chunk_size=2000, chunk_overlap=100)` with the default separator):
  *
  *   - the text is split on the separator (default `"\n\n"`), empty
  *     fragments dropped;
  *   - consecutive fragments are greedily re-merged into chunks whose
  *     character length (separators included) stays <= `chunkSize`;
  *   - when a chunk is emitted, a tail of whole fragments totalling
  *     <= `chunkOverlap` chars is retained as the start of the next
  *     chunk (overlap is composed of whole fragments, never an exact
  *     character suffix);
  *   - a single separator-free fragment longer than `chunkSize` is
  *     emitted oversize as-is (the reference's splitter only warns);
  *   - chunks are whitespace-stripped; empty chunks dropped;
  *   - text with no separator at all yields exactly one chunk.
  *
  * Pure function — unit-testable without Spark; the Spark surface wraps
  * it in a UDF / generator (see graft.functions.TextFunctions).
  */
object Chunker {

  val DefaultChunkSize: Int = 2000
  val DefaultChunkOverlap: Int = 100
  val DefaultSeparator: String = "\n\n"

  def split(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      chunkOverlap: Int = DefaultChunkOverlap,
      separator: String = DefaultSeparator): Seq[String] = {
    require(chunkOverlap < chunkSize, "overlap must be smaller than chunk size")
    if (text == null || text.isEmpty) return Seq.empty
    val fragments: Seq[String] =
      if (separator.isEmpty) text.map(_.toString)
      else splitLiteral(text, separator).filter(_.nonEmpty)
    mergeFragments(fragments, chunkSize, chunkOverlap, separator)
  }

  /** Literal (non-regex) split that keeps interior empties for the caller to
    * filter; `String.split` would drop trailing empties and regex-escape. */
  private def splitLiteral(text: String, sep: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var from = 0
    var idx = text.indexOf(sep, from)
    while (idx >= 0) {
      out += text.substring(from, idx)
      from = idx + sep.length
      idx = text.indexOf(sep, from)
    }
    out += text.substring(from)
    out.result()
  }

  /** Greedy merge with whole-fragment overlap retention (ref semantics). */
  private def mergeFragments(
      fragments: Seq[String],
      chunkSize: Int,
      chunkOverlap: Int,
      separator: String): Seq[String] = {
    val sepLen = separator.length
    val docs = Vector.newBuilder[String]
    var current = Vector.empty[String]
    var total = 0 // chars of current, joining separators included

    def emit(): Unit = {
      val doc = current.mkString(separator).trim
      if (doc.nonEmpty) docs += doc
    }

    for (frag <- fragments) {
      val len = frag.length
      val joined = total + len + (if (current.nonEmpty) sepLen else 0)
      if (joined > chunkSize) {
        if (current.nonEmpty) {
          emit()
          // Retain a tail of whole fragments as overlap: drop from the front
          // while over the overlap budget, or while the incoming fragment
          // still would not fit.
          while (total > 0 && (
              total > chunkOverlap ||
              total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize)) {
            total -= current.head.length + (if (current.length > 1) sepLen else 0)
            current = current.tail
          }
        }
        // A fragment longer than chunkSize on its own is carried and emitted
        // oversize (the reference only warns).
      }
      current = current :+ frag
      total += len + (if (current.length > 1) sepLen else 0)
    }
    emit()
    docs.result()
  }
}
