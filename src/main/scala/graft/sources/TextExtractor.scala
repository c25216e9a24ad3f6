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

/** [[SimplePdfTextExtractor]] with a caller-supplied user password for
  * encrypted documents (see [[SimplePdfTextExtractor.withPassword]]).
  * A small serializable case class so it ships cleanly inside the
  * ingest UDF's closure like the password-less object does. */
final case class PasswordPdfTextExtractor(password: String)
    extends TextExtractor {
  override def extract(content: Array[Byte]): String =
    SimplePdfTextExtractor.extract(content, Some(password))
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
  * Supported stream filters (decoded dep-free, including chains in the
  * spec's decode order): `/FlateDecode` (zlib), `/LZWDecode` (honoring
  * `/EarlyChange`), `/RunLengthDecode`, `/ASCIIHexDecode`,
  * `/ASCII85Decode`, plus their inline-image abbreviations `/Fl`,
  * `/LZW`, `/RL`, `/AHx`, `/A85` — e.g. `[/ASCII85Decode /FlateDecode]`
  * works. An indirect `/Length N G R` is resolved by locating the
  * `N G obj` integer in the file (no xref walk needed for the direct-int
  * case every real producer emits). Shown strings carrying a UTF-16BE
  * (or UTF-8) BOM are decoded as such, per PDF 32000-1 §7.9.2.2.
  * Streams are processed in PAGE-TREE order (Catalog -> Pages -> Kids
  * -> Contents, including /Contents arrays) so incrementally-updated /
  * object-reordered files concatenate pages in page order like the
  * reference; an unwalkable tree (broken refs, cycles) falls back to
  * the byte-order scan. Page-tree dicts compressed into PDF 1.5+
  * object streams (`/Type /ObjStm`) are resolved: each ObjStm is
  * decoded (its header's N pairs locate the contained objects,
  * §7.5.7) and the walker reads tree nodes from it — content streams
  * themselves can never be ObjStm-contained (§7.5.7 forbids streams
  * inside object streams), so their offsets stay raw-document. Where
  * the same object has several bodies (incremental updates), the LAST
  * occurrence in byte order wins — later update bodies supersede
  * earlier ones; the xref that would disambiguate is not walked.
  *
  * Subset-font show-text decode is Tf-SCOPED: the page's /Resources
  * font dict (inline or indirect, inheritable from ancestor Pages
  * nodes, §7.7.3.4) is resolved to per-font decoders, the BT..ET scan
  * tracks the active font through `Tf` operands, and each shown
  * string decodes through THAT font's /ToUnicode CMap
  * (`beginbfchar`/`beginbfrange`, §9.10.3) at the code width each
  * entry's own src hex declares — 2-byte (CID/Identity-H) tried
  * first, then 1-byte (simple fonts), all-or-nothing per string —
  * so two subset fonts mapping the same code differently (the norm:
  * every subset starts at code 1) decode correctly per font. Simple
  * fonts with a custom `/Encoding /Differences` array decode per
  * byte through an AGL-subset glyph-name table (plus the
  * uniXXXX/uXXXX conventions); unmapped codes keep their Latin-1
  * baseline. Show text with NO resolvable active font falls back to
  * the merged-document CMaps (codes colliding across fonts dropped
  * to raw), then raw Latin-1 bytes (or BOM-tagged decode).
  *
  * ENCRYPTED documents (standard security handler, §7.6.3): documents
  * whose USER password verifies — the empty password by default (the
  * owner-locked/"protected" PDFs every viewer opens without prompting,
  * which crawled corpora are full of; the reference opens them
  * transparently via PyMuPDF, streamlit_app.py:62), or a
  * caller-supplied password via [[withPassword]] — decrypt before
  * filter decoding: RC4-40..128
  * (/V1, /V2, /V4 + /CFM /V2), AES-128-CBC (/V4 + /CFM /AESV2) with
  * per-object keys from the stream's owning header, and AES-256
  * (/V5 + /CFM /AESV3, R5 and R6 — Acrobat X+ output; file key
  * unwrapped from /UE via the SHA-2 algorithm-2.A/2.B hashes), all
  * JDK crypto ([[PdfCrypt]]). Strings inside content streams need no
  * separate pass (stream decryption covers them); ToUnicode CMaps and
  * ObjStm payloads decrypt the same way.
  *
  * Honest scope (ref op A2, streamlit_app.py:60-71): streams with other
  * filters (DCTDecode images, CCITT, JBIG2, JPX), a `/DecodeParms`/
  * `/DP` `/Predictor` ≥ 2 (flate+predictor xref streams — the decoded
  * bytes are PNG-row-filtered binary, never a text layer), and
  * encrypted documents OUTSIDE the supported envelope (a user
  * password the caller did not supply, non-/Standard handlers — their
  * payloads stay corrupt data) have no recoverable text layer here, so they
  * contribute "" and
  * [[FallbackExtractor]] routes whitespace-only documents to OCR — the
  * same path the reference takes for scanned pages. Full-fidelity
  * extraction (PDFBox) plugs in at the [[TextExtractor]] trait.
  */
object SimplePdfTextExtractor extends TextExtractor {
  override def extract(content: Array[Byte]): String =
    extract(content, None)

  /** Same extractor with a caller-supplied password for encrypted
    * documents (the reference flow accepts arbitrary PDFs; viewers
    * prompt — a batch pipeline passes the known password per corpus).
    * Authenticated viewer-style: as the USER password first, then the
    * empty password (so a password given for an unprotected or merely
    * owner-locked document is harmless), then as the OWNER password
    * (algorithm 7 / the 2.A owner half); a wrong password degrades to
    * the no-text route like every other out-of-envelope document —
    * never a throw. */
  def withPassword(password: String): TextExtractor =
    new PasswordPdfTextExtractor(password)

  private[sources] def extract(content: Array[Byte],
      password: Option[String]): String = {
    // ISO-8859-1 maps bytes 1:1 to chars, so offsets/scans are exact
    val s = new String(content, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF"))
      throw new IllegalArgumentException("not a PDF (missing %PDF header)")
    val out = new StringBuilder
    // one parse context per document: object-header index, decoded
    // ObjStms, font cache — the ToUnicode collection, the page-tree
    // walk, and font resolution all read from the same pass
    val doc = new Doc(s, password)
    val cmap = toUnicodeMap(doc)
    // PAGE-TREE order first (the reference concatenates pages in page
    // order, streamlit_app.py:63): walk Catalog -> Pages -> Kids ->
    // Contents and process exactly those streams, in that order —
    // byte order diverges from page order in incrementally-updated or
    // object-reordered files. Any unresolvable link (broken refs,
    // cycles) falls back to the byte-order scan below. Each page
    // carries its resolved /Resources font map for Tf-scoped decode.
    pageContentStreamOffsets(doc) match {
      case Some(pages) =>
        pages.foreach { case (ks, fonts) =>
          // a /Contents ARRAY is ONE logical content stream (§7.8.2:
          // the division falls on a token boundary) — decode each
          // piece, join with a newline, scan ONCE, so Tf/BT state
          // legally set in piece A still governs piece B (producers
          // like LibreOffice split mid-text-object)
          val bodies = ks.flatMap(k => decodeStream(doc, k)._1)
          if (bodies.nonEmpty) shownText(bodies.mkString("\n"), out, cmap, fonts)
        }
        return out.result()
      case None => ()
    }
    byteOrderScan(doc, out, cmap)
    out.result()
  }

  /** Fallback: every stream in byte order. Explicit scan (not a regex
    * over the whole doc): a regex dict capture either breaks on nested
    * sub-dicts (/DecodeParms << ... >>) or truncates at a literal
    * "endstream" inside compressed payload bytes. Each `stream` keyword
    * anchors a backward balanced-dict scan and a forward payload scan,
    * and the resume position always lands past the stream consumed.
    * Tf names resolve through the document-global font map (no page
    * context exists on this path); text state resets per stream —
    * unrelated streams must not leak BT/Tf state into each other. */
  private def byteOrderScan(doc: Doc, out: StringBuilder,
      cmap: Cmaps): Unit = {
    val s = doc.s
    val fonts = doc.globalFonts
    var pos = 0
    var k = s.indexOf("stream", pos)
    while (k >= 0) {
      val (body, next) = decodeStream(doc, k)
      body.foreach(b => shownText(b, out, cmap, fonts))
      pos = next
      k = s.indexOf("stream", pos)
    }
  }

  /** Handle ONE `stream` keyword occurrence at `k`: if it heads a real
    * stream (a `>>`-terminated dict precedes it), decode it per the
    * dict; returns (decoded body chars when a text layer is
    * recoverable, resume index past whatever was consumed — k + 6 for
    * a non-stream hit). */
  private def decodeStream(doc: Doc, k: Int): (Option[String], Int) = {
    val s = doc.s
    var pos = k + 6
    var body: Option[String] = None
    locally {
      // keyword check: preceded (after optional EOL/space) by the dict's
      // ">>" — this also rejects the "stream" inside "endstream"
      var d = k - 1
      while (d >= 0 && s.charAt(d).isWhitespace) d -= 1
      if (d >= 1 && s.charAt(d) == '>' && s.charAt(d - 1) == '>') {
        val dict = balancedDict(s, d)
        var dataStart = k + 6
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        // a /Predictor >= 2 means the decoded bytes are PNG/TIFF
        // row-filtered binary, never a text layer; an indirect
        // /DecodeParms ref can't be inspected, so reject conservatively.
        // /Predictor 1 (none) and /EarlyChange are benign.
        val hasParms =
          "/Predictor\\s+(\\d++)".r.findFirstMatchIn(dict)
            .flatMap(_.group(1).toIntOption).exists(_ >= 2) ||
          // the lookahead spans the whitespace too: with `\s*(?![<\[])`
          // outside it, the engine backtracks \s* to zero and "passes"
          // the lookahead on the space itself
          "/(?:DecodeParms|DP)\\b(?!\\s*[<\\[])".r.findFirstIn(dict).isDefined
        val earlyChange =
          "/EarlyChange\\s+(\\d++)".r.findFirstMatchIn(dict)
            .flatMap(_.group(1).toIntOption).getOrElse(1)
        val lenEnd = directLength(dict).orElse(indirectLength(dict, doc)).collect {
          case n if dataStart + n.toLong <= s.length => dataStart + n
        }
        // stream payloads in an encrypted doc decrypt (per-object key
        // from the OWNING header) before filter decoding — except XRef
        // streams, which are never encrypted (§7.5.8.2). A failed
        // decrypt falls back to the stored bytes, which downstream
        // decoding rejects to no-text, the pre-encryption behavior.
        val enc = doc.crypt.filter(_ =>
          "/Type\\s*/XRef\\b".r.findFirstIn(dict).isEmpty)
        def payload(end: Int): String = {
          val raw = s.substring(dataStart, end)
          enc.flatMap(cx => doc.ownerOf(k)
            .flatMap { case (n, g) => cx.decrypt(raw, n, g) }).getOrElse(raw)
        }
        val filters = filterNames(dict)
        if (!hasParms && filters.isEmpty) {
          val end = lenEnd.getOrElse {
            val e = s.indexOf("endstream", dataStart); if (e < 0) s.length else e
          }
          body = Some(payload(end))
          pos = skipEndstream(s, end)
        } else if (!hasParms && filters.exists(_.forall(Decoders.contains))) {
          val chain = filters.get
          lenEnd match {
            case Some(end) =>
              // exact payload slice defeats embedded literal "endstream";
              // each decoder ignores trailing bytes past its own EOD
              body = decodeChain(payload(end), chain, earlyChange)
              pos = skipEndstream(s, end)
            case None =>
              chain.head match {
                case "ASCIIHexDecode" | "AHx" =>
                  // hex data cannot contain the letters of "endstream";
                  // the EOD '>' (or the first endstream) bounds the data
                  val eod = s.indexOf('>', dataStart)
                  val end = if (eod < 0) s.length else eod + 1
                  body = decodeChain(payload(end), chain, earlyChange)
                  pos = skipEndstream(s, end)
                case "ASCII85Decode" | "A85" =>
                  // base-85 data CAN spell "endstream", but its '~>' EOD
                  // marker cannot appear in valid data — bound by it
                  val eod = s.indexOf("~>", dataStart)
                  val end = if (eod < 0) s.length else eod + 2
                  body = decodeChain(payload(end), chain, earlyChange)
                  pos = skipEndstream(s, end)
                case _ =>
                  // flate first with indirect/absent /Length: the first
                  // "endstream" may sit INSIDE the compressed bytes. Try
                  // successive candidates — truncated zlib data decodes
                  // to None, the true boundary decodes cleanly (for an
                  // encrypted doc each candidate slice decrypts first —
                  // a wrong boundary decrypts to garbage zlib, which
                  // also rejects) — and resume past the accepted one.
                  var e = s.indexOf("endstream", dataStart)
                  var attempts = 0
                  while (body.isEmpty && e >= 0 && attempts < 8) {
                    decodeChain(payload(e), chain, earlyChange) match {
                      case some @ Some(_) => body = some
                      case None =>
                        attempts += 1
                        if (attempts < 8) e = s.indexOf("endstream", e + 9)
                    }
                  }
                  pos =
                    if (body.isDefined) e + 9
                    else skipEndstream(s, dataStart) // corrupt: no text layer
              }
          }
        } else {
          // unsupported filters or predictor streams: no recoverable
          // text; skip past the payload (length-guided when possible)
          pos = skipEndstream(s, lenEnd.getOrElse(dataStart))
        }
      } else pos = k + 6
    }
    (body, pos)
  }

  private val ObjHeaderRe = "(?<![0-9])(\\d+)\\s+(\\d+)\\s+obj\\b".r

  /** Per-document parse context, built once per [[extract]] call: the
    * raw chars, a one-pass object-header index, the decoded ObjStm
    * objects, and a font-resolution cache. The index replaces the
    * per-lookup `findAllMatchIn` scans that made the page-tree walk
    * O(objects x document size) in regex work (ADVICE r10). */
  private final class Doc(val s: String,
      val password: Option[String] = None) {
    /** (objNum, gen) -> offset just past the LAST matching `N G obj`
      * header in byte order: in an incrementally-updated PDF the
      * superseded body of an object appears EARLIER (update bodies
      * append), so the last match is the live object — the xref table
      * that would disambiguate authoritatively is not walked.
      * Generation is part of the key, so a freed-then-reused object
      * number resolves to the body whose generation matches the
      * request, not whichever header happens to come last. */
    val idx: scala.collection.mutable.HashMap[(Long, Long), Int] = {
      val m = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
      ObjHeaderRe.findAllMatchIn(s).foreach { mm =>
        for (n <- mm.group(1).toLongOption; g <- mm.group(2).toLongOption)
          m((n, g)) = mm.end
      }
      m
    }

    /** Decoded `/Type /ObjStm` objects: objNum -> body text. Reads only
      * `s` and `idx`, both initialized above (declaration order). */
    val stm: scala.collection.Map[String, String] = parseObjectStreams(this)

    def lastObjStart(n: String, g: String): Option[Int] =
      for {
        nl <- n.toLongOption; gl <- g.toLongOption; at <- idx.get((nl, gl))
      } yield at

    /** The object's dict/prelude only — stop at the first `stream` so a
      * payload's bytes can't be mistaken for dict entries. */
    def objPrelude(at: Int): String = {
      val endObj = s.indexOf("endobj", at)
      val streamKw = s.indexOf("stream", at)
      val end = Seq(endObj, streamKw).filter(_ >= 0) match {
        case Nil => math.min(s.length, at + 2048)
        case es => es.min
      }
      s.substring(at, end)
    }

    /** Direct (uncompressed) bodies win over ObjStm copies: an
      * incremental update supersedes an ObjStm-contained object by
      * appending the new body as a direct object. ObjStm objects always
      * have generation 0 (§7.5.7). */
    def objBody(n: String, g: String): Option[String] =
      lastObjStart(n, g).map(objPrelude)
        .orElse(if (g == "0") stm.get(n) else None)

    /** One resolved [[FontDec]] per referenced font object. */
    val fontCache = scala.collection.mutable.HashMap.empty[(String, String), Option[FontDec]]

    /** Font-resource name -> decoder across the whole document — the
      * byte-order fallback's Tf resolution, where no per-page
      * /Resources context exists. */
    lazy val globalFonts: Map[String, FontDec] = buildGlobalFonts(this)

    /** Object headers sorted by offset, for [[ownerOf]]. */
    private lazy val headersByOffset: Array[(Int, Long, Long)] =
      idx.iterator.map { case ((n, g), off) => (off, n, g) }.toArray.sortBy(_._1)

    /** The object OWNING byte offset `at`: the header with the greatest
      * start <= at — what per-object decryption keys are derived from.
      * A spurious "N G obj" inside some binary payload would misnumber
      * the following stream (same ambiguity [[idx]] already accepts);
      * the wrong key then decrypts to garbage, which downstream filter
      * decoding rejects to no-text — never a crash. */
    def ownerOf(at: Int): Option[(Long, Long)] = {
      val arr = headersByOffset
      var lo = 0; var hi = arr.length - 1; var res = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid)._1 <= at) { res = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (res < 0) None else Some((arr(res)._2, arr(res)._3))
    }

    /** Stream-decryption context — Some iff the doc carries a
      * supported /Encrypt dict AND the empty user password verifies.
      * MUST NOT read [[stm]]: ObjStm payloads are themselves encrypted,
      * so decoding them needs this field first (the spec guarantees the
      * Encrypt dict is never ObjStm-contained, so direct-object
      * resolution suffices). */
    lazy val crypt: Option[StreamCrypt] = parseEncryption(this)
  }

  /** Per-document stream decryption (PDF 32000-1 §7.6): the verified
    * file key plus the stream crypt method. Decrypt-then-defilter: the
    * file stores Encrypt(filter-encoded bytes). V5/AES-256 (`v5`) uses
    * the FILE key directly — per-object key derivation is a V<5
    * construct. */
  private[sources] final case class StreamCrypt(fileKey: Array[Byte],
      aes: Boolean, v5: Boolean = false) {
    def decrypt(raw: String, objNum: Long, gen: Long): Option[String] = {
      val data = raw.getBytes(StandardCharsets.ISO_8859_1)
      val plain =
        if (v5) PdfCrypt.decryptAes(fileKey, data)
        else {
          val okey = PdfCrypt.objectKey(fileKey, objNum, gen, aes)
          if (aes) PdfCrypt.decryptAes(okey, data)
          else Some(PdfCrypt.rc4(okey, data))
        }
      plain.map(new String(_, StandardCharsets.ISO_8859_1))
    }
  }

  /** Parse the trailer's /Encrypt dict and verify the user password:
    * the caller-supplied one first when present, then the empty
    * password (PdfCrypt's scope note) — so a password given for an
    * unprotected or merely owner-locked document never breaks it.
    * Returns None — leaving every stream to decode as the (garbage)
    * stored bytes, i.e. no text layer, the pre-existing behavior —
    * when the doc is unencrypted, the handler/version is unsupported
    * (non-/Standard, versions beyond V5), streams are exempt
    * (/StmF /Identity), or no candidate password verifies. */
  private def parseEncryption(doc: Doc): Option[StreamCrypt] = {
    val s = doc.s
    // /Encrypt lives in a trailer dictionary (classic xref) or in the
    // xref STREAM object's dict at the startxref offset (§7.5.8). Scan
    // those anchored regions only — a compressed stream payload can
    // contain the bytes `/Encrypt N G R` by accident, and with a whole-
    // file last-match-wins scan a late-file accident would override the
    // true pointer (verification then fails and a supported encrypted
    // document silently degrades to no text layer). Last anchored match
    // wins (incremental updates append trailers); the whole-file scan
    // survives only as a fallback for files with mangled trailers.
    val encRe = "/Encrypt\\s+(\\d+)\\s+(\\d+)\\s+R".r
    def lastEncIn(regions: Seq[String]): Option[(String, String)] = {
      var ref: Option[(String, String)] = None
      regions.foreach(t => encRe.findAllMatchIn(t)
        .foreach(m => ref = Some((m.group(1), m.group(2)))))
      ref
    }
    val trailerDicts = "trailer".r.findAllMatchIn(s).toSeq.flatMap { m =>
      val at = s.indexOf("<<", m.end)
      // the dict opens within a few bytes of the keyword; a distant `<<`
      // means this `trailer` occurrence was stream-payload noise
      if (at < 0 || at - m.end > 64) None
      else Some(balancedDictForward(s, at))
    }
    val xrefStreamDicts = "startxref\\s+(\\d+)".r.findAllMatchIn(s).toSeq
      .flatMap(_.group(1).toIntOption).flatMap { off =>
        // at the offset sits `N G obj << ... >>` for an xref stream;
        // classic xref tables (keyword `xref`) are covered above, so
        // only accept a dict opening right after a nearby obj header —
        // nothing but the header (and whitespace) may sit between the
        // offset and the `<<`, or the "offset" is stream-payload noise
        val at = if (off < 0 || off >= s.length) -1 else s.indexOf("<<", off)
        if (at < 0 || at - off > 256) None
        else if (!"\\s*\\d+\\s+\\d+\\s+obj\\s*".r.matches(s.substring(off, at))) None
        else Some(balancedDictForward(s, at))
      }
    val encRef = lastEncIn(trailerDicts).orElse(lastEncIn(xrefStreamDicts))
      .orElse(lastEncIn(Seq(s)))
    val dict = encRef.flatMap { case (n, g) =>
      doc.lastObjStart(n, g).map(doc.objPrelude) // never via stm (see crypt)
    }.orElse {
      // direct-dict form in the trailer — same anchoring discipline
      def direct(regions: Seq[String]): Option[String] = {
        var d: Option[String] = None
        regions.foreach(t => "/Encrypt\\s*<<".r.findAllMatchIn(t)
          .foreach(m => d = Some(balancedDictForward(t, m.end - 2))))
        d
      }
      direct(trailerDicts).orElse(direct(xrefStreamDicts))
        .orElse(direct(Seq(s)))
    }
    dict.filter(d => "/Filter\\s*/Standard\\b".r.findFirstIn(d).isDefined)
      .flatMap { d =>
        def num(key: String): Option[Long] =
          ("/" + key + "\\s+(-?\\d+)").r.findFirstMatchIn(d)
            .flatMap(_.group(1).toLongOption)
        def str(key: String): Option[Array[Byte]] =
          ("/" + key + "\\s*([(<])").r.findFirstMatchIn(d).map { m =>
            val at = m.end - 1
            val parsed =
              if (d.charAt(at) == '(') parseString(d, at)._1
              else parseHexString(d, at)._1
            parsed.getBytes(StandardCharsets.ISO_8859_1)
          }
        val v = num("V").getOrElse(0L).toInt
        val r = num("R").getOrElse(0L).toInt
        // P is a signed 32-bit int, but writers emit it unsigned too
        val p = num("P").map(x => (x & 0xFFFFFFFFL).toInt).getOrElse(-1)
        val bits = num("Length").getOrElse(40L).toInt
        val encMeta =
          !"/EncryptMetadata\\s+false".r.findFirstIn(d).isDefined
        // /StmF names the stream crypt filter (V4/V5); default Identity
        // = streams NOT encrypted (only strings would be)
        def stmF = "/StmF\\s*/(\\w+)".r.findFirstMatchIn(d)
          .map(_.group(1)).getOrElse("Identity")
        def cfDict = ("/" + stmF + "\\s*<<").r.findFirstMatchIn(d)
          .map(m => balancedDictForward(d, m.end - 2))
        // candidate USER passwords, tried in order: the caller's (V5
        // wants UTF-8 bytes, V<5 the Latin-1/PDFDocEncoding bytes the
        // padding algorithm consumes), then the empty password
        def pwdCandidates(cs: java.nio.charset.Charset): Seq[Array[Byte]] =
          doc.password.map(_.getBytes(cs)).toSeq :+ Array.emptyByteArray
        if (v == 5) {
          // AES-256: R5 (legacy Adobe) / R6 (ISO 32000-2); the file key
          // unwraps from /UE after the /U hash proves the user
          // password (no /O//ID//P in the derivation, no per-object
          // keys) — or, viewer-style, from /OE when the supplied
          // password turns out to be the OWNER password (2.A owner
          // half, /U as udata)
          if (stmF == "Identity" ||
              !cfDict.exists(cf => "/CFM\\s*/AESV3\\b".r.findFirstIn(cf).isDefined))
            None
          else for {
            u <- str("U")
            ue <- str("UE")
            if r == 5 || r == 6
            key <- pwdCandidates(StandardCharsets.UTF_8).iterator
              .flatMap(pw => PdfCrypt.fileKeyV5(pw, u, ue, r))
              .nextOption()
              .orElse(for {
                pw <- doc.password.map(_.getBytes(StandardCharsets.UTF_8))
                o <- str("O")
                oe <- str("OE")
                k <- PdfCrypt.fileKeyV5Owner(pw, o, u, oe, r)
              } yield k)
          } yield StreamCrypt(key, aes = true, v5 = true)
        } else {
          val carrier: Option[(Int, Boolean)] = v match {
            case 1 => Some((5, false))
            case 2 => Some((math.max(5, math.min(16, bits / 8)), false))
            case 4 =>
              if (stmF == "Identity") None
              else cfDict.flatMap { cf =>
                val cfm = "/CFM\\s*/(\\w+)".r.findFirstMatchIn(cf).map(_.group(1))
                // CF /Length is bytes per spec, bits from sloppy writers
                val cfLen = "/Length\\s+(\\d+)".r.findFirstMatchIn(cf)
                  .flatMap(_.group(1).toIntOption)
                  .map(l => if (l >= 40) l / 8 else l)
                cfm.collect {
                  case "AESV2" => (16, true)
                  case "V2" => (cfLen.getOrElse(math.max(5, math.min(16, bits / 8))), false)
                }
              }
            case _ => None // exotic versions: out of scope
          }
          for {
            (keyLen, aes) <- carrier
            o <- str("O") if o.length >= 32
            u <- str("U") if r >= 2 && r <= 4
            id0 = trailerId0(doc)
            key <- pwdCandidates(StandardCharsets.ISO_8859_1).iterator
              .map(pw => PdfCrypt.fileKey(pw, o, p, id0, r, keyLen, encMeta))
              .find(k => PdfCrypt.verifyUser(k, u, id0, r))
              // viewer-style: a supplied password that fails the user
              // route is tried as the OWNER password (algorithm 7)
              .orElse(doc.password.map(_.getBytes(StandardCharsets.ISO_8859_1))
                .flatMap(pw => PdfCrypt.fileKeyFromOwner(
                  pw, o, u, p, id0, r, keyLen, encMeta)))
          } yield StreamCrypt(key, aes)
        }
      }
  }

  /** First element of the trailer /ID array (hex or literal string);
    * empty when absent (lenient — the spec requires /ID on encrypted
    * docs, but key derivation with an empty ID still round-trips for
    * writers that omit it). Last occurrence wins, matching trailer
    * precedence; ID[0] is the immutable original-document half. */
  private def trailerId0(doc: Doc): Array[Byte] = {
    val s = doc.s
    var at = -1
    "/ID\\s*\\[\\s*".r.findAllMatchIn(s).foreach(m => at = m.end)
    if (at < 0 || at >= s.length) Array.emptyByteArray
    else s.charAt(at) match {
      case '<' => parseHexString(s, at)._1.getBytes(StandardCharsets.ISO_8859_1)
      case '(' => parseString(s, at)._1.getBytes(StandardCharsets.ISO_8859_1)
      case _ => Array.emptyByteArray
    }
  }

  /** ONE entry per page, in PAGE-TREE order: the page's content-stream
    * `stream` keyword offsets (a /Contents array contributes each ref
    * in array order — the pieces of one logical stream, §7.8.2) plus
    * its resolved /Resources font map (for Tf-scoped decode) — or None
    * when the tree cannot be walked (broken refs, cycles, no catalog),
    * in which case the caller's byte-order scan takes over. Tree dicts
    * compressed into `/Type /ObjStm` object streams resolve from
    * [[parseObjectStreams]]; content streams cannot be ObjStm-contained
    * (§7.5.7), so their offsets always point into the raw document.
    * /Resources is inheritable (§7.7.3.4): a page without its own dict
    * uses the nearest ancestor Pages node's. */
  private def pageContentStreamOffsets(doc: Doc)
      : Option[Seq[(Seq[Int], Map[String, FontDec])]] = {
    val s = doc.s
    val ref = "(\\d+)\\s+(\\d+)\\s+R".r
    val pagesRef = "/Pages\\s+(\\d+)\\s+(\\d+)\\s+R".r
    val catalog = {
      // last direct catalog wins (incremental updates append); the
      // /Pages ref sits in the same object dict — bounded window
      var lastAt = -1
      "/Type\\s*/Catalog".r.findAllMatchIn(s).foreach(m => lastAt = m.start)
      val direct =
        if (lastAt < 0) None
        else {
          val win = s.substring(math.max(0, lastAt - 512), math.min(s.length, lastAt + 512))
          pagesRef.findFirstMatchIn(win).map(m => (m.group(1), m.group(2)))
        }
      direct.orElse { // the catalog itself may be ObjStm-compressed
        doc.stm.valuesIterator.foldLeft(Option.empty[(String, String)]) { (acc, body) =>
          if ("/Type\\s*/Catalog".r.findFirstIn(body).isDefined)
            pagesRef.findFirstMatchIn(body).map(m => (m.group(1), m.group(2))).orElse(acc)
          else acc
        }
      }
    }
    catalog.flatMap { root =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[Int], Map[String, FontDec])]
      val visited = scala.collection.mutable.Set.empty[(String, String)]
      // false = unresolvable; inhRes = nearest ancestor /Resources body
      def walk(n: String, g: String, inhRes: Option[String]): Boolean = {
        if (!visited.add((n, g))) return false // cycle
        doc.objBody(n, g) match {
          case None => false // missing object
          case Some(body) =>
            val res = dictOrRefValue(body, "Resources", doc).orElse(inhRes)
            if ("/Type\\s*/Pages\\b".r.findFirstIn(body).isDefined) {
              val kids = "/Kids\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(body).map(_.group(1))
              kids match {
                case None => false
                case Some(list) =>
                  ref.findAllMatchIn(list).forall(m => walk(m.group(1), m.group(2), res))
              }
            } else if ("/Type\\s*/Page\\b".r.findFirstIn(body).isDefined) {
              "/Contents\\s*(\\d+\\s+\\d+\\s+R|\\[[^\\]]*\\])".r.findFirstMatchIn(body) match {
                case None => true // empty page: legal, contributes nothing
                case Some(m) =>
                  val ks = scala.collection.mutable.ArrayBuffer.empty[Int]
                  val ok = ref.findAllMatchIn(m.group(1)).forall { r =>
                    doc.lastObjStart(r.group(1), r.group(2)).flatMap { cAt =>
                      val kw = s.indexOf("stream", cAt)
                      // the keyword must belong to THIS object
                      val endObj = s.indexOf("endobj", cAt)
                      if (kw >= 0 && (endObj < 0 || kw < endObj)) Some(kw) else None
                    } match {
                      case Some(kw) => ks += kw; true
                      case None => false
                    }
                  }
                  if (ok && ks.nonEmpty)
                    out += ((ks.toSeq,
                      res.map(fontMap(_, doc)).getOrElse(Map.empty[String, FontDec])))
                  ok
              }
            } else false // unexpected node type
        }
      }
      if (walk(root._1, root._2, None) && out.nonEmpty) Some(out.toSeq) else None
    }
  }

  /** Decode the stream of the object whose `N G obj` header ends at
    * `at`: (stream dict, decoded bytes as ISO-8859-1 chars). None when
    * no stream precedes `endobj`, the filter chain is unsupported, a
    * /Predictor >= 2 is set, or the data is corrupt. */
  private def streamObjectAt(doc: Doc, at: Int): Option[(String, String)] = {
    val s = doc.s
    val kw = s.indexOf("stream", at)
    val endObj = s.indexOf("endobj", at)
    if (kw < 0 || (endObj >= 0 && endObj < kw)) return None
    var d = kw - 1
    while (d >= 0 && s.charAt(d).isWhitespace) d -= 1
    if (d < 1 || s.charAt(d) != '>' || s.charAt(d - 1) != '>') return None
    val dict = balancedDict(s, d)
    var dataStart = kw + 6
    if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
    if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
    if ("/Predictor\\s+(\\d++)".r.findFirstMatchIn(dict)
        .flatMap(_.group(1).toIntOption).exists(_ >= 2)) return None
    val end = directLength(dict).orElse(indirectLength(dict, doc))
      .map(dataStart + _).filter(_ <= s.length)
      .getOrElse {
        val e = s.indexOf("endstream", dataStart); if (e < 0) s.length else e
      }
    val stored = s.substring(dataStart, end)
    // ObjStm payloads are encrypted like any other stream (the objects
    // INSIDE then carry no further string encryption, §7.5.7)
    val raw = doc.crypt.flatMap(cx => doc.ownerOf(kw)
      .flatMap { case (n, g) => cx.decrypt(stored, n, g) }).getOrElse(stored)
    filterNames(dict) match {
      case None => Some((dict, raw))
      case Some(chain) if chain.forall(Decoders.contains) =>
        decodeChain(raw, chain, 1).map((dict, _))
      case _ => None
    }
  }

  /** All `/Type /ObjStm` object streams (PDF 1.5+, §7.5.7), decoded and
    * split into contained objects: objNum -> body text. The stream's
    * first /First chars hold N (objNum, relative offset) integer pairs;
    * each body runs to the next offset (or stream end). Duplicate
    * object numbers: the LAST ObjStm in byte order wins, matching
    * [[lastObjStart]]'s incremental-update discipline. Iteration order
    * of the result follows first insertion (LinkedHashMap). */
  private def parseObjectStreams(doc: Doc):
      scala.collection.Map[String, String] = {
    val s = doc.s
    if (!s.contains("/ObjStm")) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    "/Type\\s*/ObjStm\\b".r.findAllMatchIn(s).foreach { m =>
      streamObjectAt(doc, m.end).foreach { case (dict, content) =>
        // the match must really be this stream's dict entry, not bytes
        // inside some unrelated payload
        if ("/Type\\s*/ObjStm\\b".r.findFirstIn(dict).isDefined) {
          for {
            n <- "/N\\s+(\\d+)".r.findFirstMatchIn(dict).flatMap(_.group(1).toIntOption)
            first <- "/First\\s+(\\d+)".r.findFirstMatchIn(dict).flatMap(_.group(1).toIntOption)
            if first <= content.length
          } {
            // toIntOption (not toInt): a corrupt/adversarial header
            // integer past Int range drops its pair instead of throwing
            // through extract() (ADVICE r10)
            val pairs = "\\d+".r.findAllIn(content.substring(0, first))
              .toSeq.take(2 * n).grouped(2).toSeq
              .flatMap {
                case Seq(objNum, off) => off.toIntOption.map((objNum, _))
                case _ => None
              }
            pairs.zipWithIndex.foreach { case ((objNum, off), i) =>
              val start = first + off
              val end =
                if (i + 1 < pairs.length) first + pairs(i + 1)._2 else content.length
              if (start >= 0 && start <= end && end <= content.length)
                out(objNum) = content.substring(start, end)
            }
          }
        }
      }
    }
    out
  }

  /** Merged ToUnicode maps keyed by code WIDTH: simple fonts declare
    * 1-byte srcs (`<41>`), CID/Identity-H fonts 2-byte (`<0041>`) —
    * the width is read off each entry's own src hex length, so no
    * codespacerange parse is needed. */
  private final case class Cmaps(one: Map[Int, String], two: Map[Int, String]) {
    def isEmpty: Boolean = one.isEmpty && two.isEmpty
  }
  private val EmptyCmaps = Cmaps(Map.empty, Map.empty)

  /** One font's decode state, resolved from its font dict: its OWN
    * ToUnicode CMap split by declared code width (`one`/`two`), and a
    * simple-font `/Encoding /Differences` code -> unicode map (glyph
    * names resolved through the AGL subset [[Agl]]). Tf-scoped decode
    * prefers the CMap (all-or-nothing per string), then Differences
    * (per-byte, unmapped codes keep their Latin-1 baseline), then raw. */
  private final case class FontDec(one: Map[Int, String], two: Map[Int, String],
      diffs: Map[Int, String],
      charset: Option[java.nio.charset.Charset] = None) {
    def hasCmap: Boolean = one.nonEmpty || two.nonEmpty
    def isEmpty: Boolean = !hasCmap && diffs.isEmpty && charset.isEmpty
  }

  /** Glyph-name -> unicode for the names that cover the overwhelming
    * majority of real `/Differences` arrays: the Adobe Glyph List
    * subset for ASCII + Latin-1 (names listed in codepoint order, "."
    * = no standard name at that position) plus the WinAnsi/standard-
    * encoding punctuation, ligature, and accent names beyond Latin-1.
    * `uniXXXX` / `uXXXX[XX]` conventions are handled in
    * [[glyphToUnicode]], not here. */
  private val Agl: Map[String, String] = {
    val m = scala.collection.mutable.HashMap.empty[String, String]
    def seq(startCode: Int, names: String): Unit =
      names.split(' ').zipWithIndex.foreach { case (nm, i) =>
        if (nm != ".") m(nm) = (startCode + i).toChar.toString
      }
    seq(0x20, "space exclam quotedbl numbersign dollar percent ampersand " +
      "quotesingle parenleft parenright asterisk plus comma hyphen period slash " +
      "zero one two three four five six seven eight nine " +
      "colon semicolon less equal greater question at")
    (0x41 to 0x5A).foreach(c => m(c.toChar.toString) = c.toChar.toString)
    seq(0x5B, "bracketleft backslash bracketright asciicircum underscore grave")
    (0x61 to 0x7A).foreach(c => m(c.toChar.toString) = c.toChar.toString)
    seq(0x7B, "braceleft bar braceright asciitilde")
    seq(0xA1, "exclamdown cent sterling currency yen brokenbar section dieresis " +
      "copyright ordfeminine guillemotleft logicalnot . registered macron " +
      "degree plusminus twosuperior threesuperior acute mu paragraph " +
      "periodcentered cedilla onesuperior ordmasculine guillemotright " +
      "onequarter onehalf threequarters questiondown " +
      "Agrave Aacute Acircumflex Atilde Adieresis Aring AE Ccedilla " +
      "Egrave Eacute Ecircumflex Edieresis Igrave Iacute Icircumflex Idieresis " +
      "Eth Ntilde Ograve Oacute Ocircumflex Otilde Odieresis multiply " +
      "Oslash Ugrave Uacute Ucircumflex Udieresis Yacute Thorn germandbls " +
      "agrave aacute acircumflex atilde adieresis aring ae ccedilla " +
      "egrave eacute ecircumflex edieresis igrave iacute icircumflex idieresis " +
      "eth ntilde ograve oacute ocircumflex otilde odieresis divide " +
      "oslash ugrave uacute ucircumflex udieresis yacute thorn ydieresis")
    Seq("quoteleft" -> 0x2018, "quoteright" -> 0x2019, "quotedblleft" -> 0x201C,
      "quotedblright" -> 0x201D, "quotesinglbase" -> 0x201A,
      "quotedblbase" -> 0x201E, "endash" -> 0x2013, "emdash" -> 0x2014,
      "bullet" -> 0x2022, "dagger" -> 0x2020, "daggerdbl" -> 0x2021,
      "ellipsis" -> 0x2026, "perthousand" -> 0x2030, "guilsinglleft" -> 0x2039,
      "guilsinglright" -> 0x203A, "trademark" -> 0x2122, "Euro" -> 0x20AC,
      "florin" -> 0x0192, "fraction" -> 0x2044, "circumflex" -> 0x02C6,
      "tilde" -> 0x02DC, "Scaron" -> 0x0160, "scaron" -> 0x0161,
      "Zcaron" -> 0x017D, "zcaron" -> 0x017E, "OE" -> 0x0152, "oe" -> 0x0153,
      "Ydieresis" -> 0x0178, "dotlessi" -> 0x0131, "fi" -> 0xFB01,
      "fl" -> 0xFB02, "minus" -> 0x2212, "breve" -> 0x02D8, "caron" -> 0x02C7,
      "dotaccent" -> 0x02D9, "hungarumlaut" -> 0x02DD, "ogonek" -> 0x02DB,
      "ring" -> 0x02DA).foreach { case (k, v) => m(k) = v.toChar.toString }
    m.toMap
  }

  /** WinAnsiEncoding's 0x80-0x9F block (CP1252, PDF 32000-1 Annex D.2)
    * — the only range where WinAnsi diverges from Latin-1 (0xA0-0xFF
    * coincide, so the Latin-1 baseline already covers them). Applied as
    * the base layer when a font declares `/Encoding /WinAnsiEncoding`
    * (or `/BaseEncoding /WinAnsiEncoding` in its encoding dict);
    * /Differences entries override it. Undefined codes (81 8D 8F 90 9D)
    * keep the raw byte. */
  private val WinAnsiHigh: Map[Int, String] = Map(
    0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
    0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
    0x89 -> "‰", 0x8A -> "Š", 0x8B -> "‹", 0x8C -> "Œ",
    0x8E -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
    0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
    0x98 -> "˜", 0x99 -> "™", 0x9A -> "š", 0x9B -> "›",
    0x9C -> "œ", 0x9E -> "ž", 0x9F -> "Ÿ")

  /** MacRomanEncoding's high range (0x80-0xFF) — unlike WinAnsi, Mac
    * Roman diverges from Latin-1 across the WHOLE high range (0x80 is
    * Adieresis, not a control char), so Mac-authored PDFs with
    * `/Encoding /MacRomanEncoding` decode as mojibake without it.
    * Built from the JDK's own x-MacRoman charset (jdk.charsets module)
    * rather than a hand-typed 128-entry table; a runtime stripped of
    * that module degrades to the Latin-1 baseline instead of failing.
    *
    * The JDK charset implements post-1998 Mac OS Roman, which diverges
    * from PDF 32000-1 Annex D MacRomanEncoding in two slots: 0xDB is
    * `currency` (U+00A4) in Annex D but EURO SIGN in Mac OS Roman 8.5+,
    * and 0xF0 (Apple logo, U+F8FF) is undefined in Annex D. Those are
    * overlaid/removed so spec-conforming Mac-encoded PDFs decode per
    * Annex D; an undefined 0xF0 keeps the raw byte like any other
    * unmapped code. */
  private lazy val MacRomanHigh: Map[Int, String] =
    if (!java.nio.charset.Charset.isSupported("x-MacRoman")) Map.empty
    else {
      val cs = java.nio.charset.Charset.forName("x-MacRoman")
      (0x80 to 0xFF).map(b => b -> new String(Array(b.toByte), cs)).toMap -
        0xF0 + (0xDB -> "¤")
    }

  /** AGL-subset lookup plus the `uniXXXX` (one or more UTF-16 units)
    * and `uXXXX`-`uXXXXXX` (one code point) glyph-name conventions. */
  private def glyphToUnicode(name: String): Option[String] = {
    def isHex(c: Char): Boolean = Character.digit(c, 16) >= 0
    Agl.get(name).orElse {
      if (name.length >= 7 && name.startsWith("uni") &&
          (name.length - 3) % 4 == 0 && name.drop(3).forall(isHex))
        Some(name.drop(3).grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString)
      else if (name.length >= 5 && name.length <= 7 && name.charAt(0) == 'u' &&
          name.drop(1).forall(isHex)) {
        val cp = Integer.parseInt(name.drop(1), 16)
        if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp)))
        else None
      } else None
    }
  }

  /** The balanced `<< ... >>` dict whose opening "<<" begins at `open`
    * in `t`; inner content without the outer delimiters, "" when
    * unbalanced. Forward twin of [[balancedDict]], for values whose
    * START is known (inline /Resources, /Font, /Encoding dicts). */
  private def balancedDictForward(t: String, open: Int): String = {
    var depth = 0
    var i = open
    while (i + 1 < t.length) {
      if (t.charAt(i) == '<' && t.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (t.charAt(i) == '>' && t.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return t.substring(open + 2, i - 2)
      } else i += 1
    }
    ""
  }

  /** Resolve `/key`'s value in `body` when it is an inline `<< ... >>`
    * dict (returns the dict's content) or an `N G R` reference (returns
    * the referenced object's body, direct or ObjStm). None for absent
    * keys and other value types (e.g. a bare name like
    * `/Encoding /WinAnsiEncoding`). */
  private def dictOrRefValue(body: String, key: String, doc: Doc): Option[String] =
    ("/" + key + "\\b").r.findFirstMatchIn(body).flatMap { m =>
      var i = m.end
      while (i < body.length && body.charAt(i).isWhitespace) i += 1
      if (i + 1 < body.length && body.charAt(i) == '<' && body.charAt(i + 1) == '<')
        Some(balancedDictForward(body, i))
      else
        "\\A(\\d+)\\s+(\\d+)\\s+R".r
          .findFirstMatchIn(body.substring(i, math.min(body.length, i + 32)))
          .flatMap(r => doc.objBody(r.group(1), r.group(2)))
    }

  /** The `/Font` resource dict of one /Resources body as
    * name -> resolved decoder; names whose font object is missing or
    * carries no decode state (no ToUnicode, no Differences) are absent,
    * so their show text falls back to the merged-document maps. */
  private def fontMap(resBody: String, doc: Doc): Map[String, FontDec] =
    dictOrRefValue(resBody, "Font", doc).map { fd =>
      "/([^\\s/\\[\\]<>()]+)\\s+(\\d+)\\s+(\\d+)\\s+R".r.findAllMatchIn(fd)
        .flatMap(m => fontFor(m.group(2), m.group(3), doc).map(m.group(1) -> _))
        .toMap
    }.getOrElse(Map.empty)

  /** Resolve one font object to its decode state, cached per document.
    * None when the object is absent, is not a font dict, or has nothing
    * to decode with. */
  private def fontFor(n: String, g: String, doc: Doc): Option[FontDec] =
    doc.fontCache.getOrElseUpdate((n, g),
      doc.objBody(n, g)
        .filter(b => "/Type\\s*/Font\\b".r.findFirstIn(b).isDefined)
        .map(parseFontDict(_, doc)).filterNot(_.isEmpty))

  /** One font dict's decode state: its /ToUnicode CMap (resolved and
    * parsed at each entry's declared width) and its
    * `/Encoding /Differences` map (inline dict or indirect encoding
    * object — `streamlit_app.py:62-63`'s PyMuPDF handles these
    * natively; custom-encoded simple fonts are ubiquitous in pre-2010
    * and form-generated PDFs and otherwise emit mojibake). */
  private def parseFontDict(body: String, doc: Doc): FontDec = {
    val (one, two) =
      "/ToUnicode\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(body) match {
        case Some(m) =>
          val entries = doc.lastObjStart(m.group(1), m.group(2))
            .flatMap(streamObjectAt(doc, _))
            .map { case (_, cm) => parseCmapSafe(cm) }
            .getOrElse(Seq.empty)
          val o = Map.newBuilder[Int, String]
          val t = Map.newBuilder[Int, String]
          entries.foreach { case (w, code, str) =>
            if (w == 1) o += (code -> str) else t += (code -> str)
          }
          (o.result(), t.result())
        case None => (Map.empty[Int, String], Map.empty[Int, String])
      }
    val encBody = dictOrRefValue(body, "Encoding", doc)
    // named base-encoding layer first, /Differences overrides on top
    // (§9.6.6.3: Differences modify the base encoding, they do not
    // replace it)
    def named(enc: String): Boolean =
      ("/Encoding\\s*/" + enc + "\\b").r.findFirstIn(body).isDefined ||
        encBody.exists(e =>
          ("/BaseEncoding\\s*/" + enc + "\\b").r.findFirstIn(e).isDefined)
    val base =
      if (named("WinAnsiEncoding")) WinAnsiHigh
      else if (named("MacRomanEncoding")) MacRomanHigh
      else Map.empty[Int, String]
    val diffs = base ++ encBody.map(parseDifferences).getOrElse(Map.empty)
    // Predefined CMap encodings (§9.7.5.2): the Uni* family's SOURCE
    // codes are UCS-2/UTF-16BE units (decode directly); the national-
    // encoding families' (90ms-RKSJ, GBK-EUC, B5pc, KSC-EUC, ...)
    // source codes ARE Shift-JIS/EUC/Big5/UHC bytes, which the JDK
    // ships charsets for — decoding the source bytes with the national
    // charset skips the src -> CID -> Unicode indirection those CMaps
    // exist for, which is text-identical on the national repertoire
    // (that round trip is what the CMap encodes; the full Adobe CID
    // registry tables this offline env lacks only matter for
    // vertical-form/gaiji leaf cases, which degrade per-char to
    // replacement, never fail the document). See
    // [[predefinedCmapCharset]].
    // Identity-H/V CID font with NO /ToUnicode (r18, closing the A2
    // partial): the text mapping lives in the embedded font program —
    // the CID in the show string is the glyph id (directly under
    // /CIDToGIDMap /Identity, through the packed u16 stream map
    // otherwise), and the font's own `cmap` table inverted gives
    // glyph -> Unicode. This is PyMuPDF's fallback for exactly this
    // shape (the reference's extractor, streamlit_app.py:62-63). An
    // explicit /ToUnicode always wins — this only fills the gap.
    val twoEff =
      if (two.nonEmpty ||
          "/Subtype\\s*/Type0\\b".r.findFirstIn(body).isEmpty ||
          "/Encoding\\s*/Identity-[HV]\\b".r.findFirstIn(body).isEmpty) two
      else identityCidToUnicode(body, doc)
    FontDec(one, twoEff, diffs, predefinedCmapCharset(body))
  }

  /** CID -> Unicode for an Identity-H/V Type0 font without /ToUnicode:
    * descendant CIDFontType2's /FontFile2 TrueType program, `cmap`
    * inverted ([[TrueTypeCmap]]), composed through /CIDToGIDMap.
    * Anything missing or malformed yields empty (the show text then
    * degrades per-char exactly like any unmapped code). */
  private def identityCidToUnicode(body: String, doc: Doc): Map[Int, String] = {
    val descBody =
      "/DescendantFonts\\s*\\[\\s*(\\d+)\\s+(\\d+)\\s+R".r
        .findFirstMatchIn(body)
        .flatMap(m => doc.objBody(m.group(1), m.group(2)))
        .orElse {
          // the array itself held as an indirect object
          "/DescendantFonts\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(body)
            .flatMap(m => doc.objBody(m.group(1), m.group(2)))
            .flatMap(arr => "(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(arr))
            .flatMap(m => doc.objBody(m.group(1), m.group(2)))
        }
    val g2u: Map[Int, Int] = (for {
      db <- descBody
      fd <- "/FontDescriptor\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(db)
      fdBody <- doc.objBody(fd.group(1), fd.group(2))
      ff <- "/FontFile2\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(fdBody)
      at <- doc.lastObjStart(ff.group(1), ff.group(2))
      dataPair <- streamObjectAt(doc, at)
    } yield TrueTypeCmap.gidToUnicode(
      dataPair._2.getBytes(StandardCharsets.ISO_8859_1)))
      .getOrElse(Map.empty)
    if (g2u.isEmpty) return Map.empty
    def str(cp: Int) = new String(Character.toChars(cp))
    val gidStream = descBody.flatMap { db =>
      "/CIDToGIDMap\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(db)
        .flatMap(m => doc.lastObjStart(m.group(1), m.group(2)))
        .flatMap(streamObjectAt(doc, _))
        .map(_._2.getBytes(StandardCharsets.ISO_8859_1))
    }
    gidStream match {
      case Some(arr) =>
        // packed big-endian u16 glyph ids indexed by CID (§9.7.4.2)
        (0 until arr.length / 2).flatMap { cid =>
          val gid = ((arr(2 * cid) & 0xff) << 8) | (arr(2 * cid + 1) & 0xff)
          g2u.get(gid).map(cp => cid -> str(cp))
        }.toMap
      case None => // /Identity or absent: CID == GID
        g2u.map { case (gid, cp) => gid -> str(cp) }
    }
  }

  /** `/Encoding /<predefined-CMap-name>` -> the JDK charset whose
    * bytes the CMap's source codes are (§9.7.5.2): UTF-16BE for the
    * Uni* families (name stem allows digits — UniJIS2004-UTF16-H /
    * UniJISX0213-... are current Adobe-Japan1 producer output),
    * national encodings for the Adobe-Japan1/GB1/CNS1/Korea1 legacy
    * families. None for Identity-H/V (codes are raw CIDs — no text
    * mapping exists without registry tables) and anything unknown. */
  private def predefinedCmapCharset(
      body: String): Option[java.nio.charset.Charset] =
    "/Encoding\\s*/([A-Za-z0-9-]+)".r.findFirstMatchIn(body)
      .map(_.group(1)).flatMap { full =>
        val n = full.stripSuffix("-H").stripSuffix("-V").stripSuffix("-HW")
        val cs =
          if (n.startsWith("Uni") && (n.endsWith("UCS2") || n.endsWith("UTF16")))
            Some("UTF-16BE")
          else n match {
            // Adobe-Japan1: Microsoft producers write 90ms* (CP932);
            // the Mac/extended stems are plain Shift-JIS
            case "90ms-RKSJ" | "90msp-RKSJ" => Some("windows-31j")
            case "90pv-RKSJ" | "83pv-RKSJ" | "Add-RKSJ" | "Ext-RKSJ" =>
              Some("Shift_JIS")
            case "EUC" => Some("EUC-JP")
            // Adobe-GB1
            case "GB-EUC" | "GBpc-EUC" => Some("GB2312")
            case "GBK-EUC" | "GBKp-EUC" => Some("GBK")
            case "GBK2K" => Some("GB18030")
            // Adobe-CNS1
            case "B5pc" | "ETen-B5" | "ETenms-B5" => Some("Big5")
            case "HKscs-B5" => Some("Big5-HKSCS")
            // Adobe-Korea1
            case "KSC-EUC" | "KSCpc-EUC" => Some("EUC-KR")
            case "KSCms-UHC" | "KSCms-UHC-HW" => Some("MS949")
            case _ => None
          }
        cs.flatMap(c =>
          try Some(java.nio.charset.Charset.forName(c))
          catch { case _: Exception => None })
      }

  /** `/Differences [ code /name /name ... code /name ... ]` of one
    * encoding dict: each integer resets the code counter, each name
    * takes the next code (§9.6.6.3). Names outside the AGL subset and
    * the uniXXXX/uXXXX conventions still consume their code but map
    * nothing — those codes keep their Latin-1 baseline at decode. */
  private def parseDifferences(enc: String): Map[Int, String] =
    "/Differences\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(enc).map { m =>
      val b = Map.newBuilder[Int, String]
      var code = -1
      "(\\d+)|/([^\\s/\\[\\]<>()]+)".r.findAllMatchIn(m.group(1)).foreach { t =>
        if (t.group(1) != null) code = t.group(1).toIntOption.getOrElse(-1)
        else if (code >= 0 && code <= 255) {
          glyphToUnicode(t.group(2)).foreach(u => b += (code -> u))
          code += 1
        }
      }
      b.result()
    }.getOrElse(Map.empty)

  /** Font-resource name -> decoder across the WHOLE document (raw +
    * ObjStm bodies) — the byte-order fallback's Tf resolution, where
    * no per-page /Resources context exists. A name bound to DIFFERENT
    * font objects by different resource dicts is dropped (its show
    * text falls back to the merged-document maps), never guessed. */
  private def buildGlobalFonts(doc: Doc): Map[String, FontDec] = {
    val bound = scala.collection.mutable.HashMap.empty[String, (String, String)]
    val dropped = scala.collection.mutable.HashSet.empty[String]
    def scan(body: String): Unit =
      "/Font\\b".r.findAllMatchIn(body).foreach { m =>
        var i = m.end
        while (i < body.length && body.charAt(i).isWhitespace) i += 1
        val fd =
          if (i + 1 < body.length && body.charAt(i) == '<' && body.charAt(i + 1) == '<')
            Some(balancedDictForward(body, i))
          else
            "\\A(\\d+)\\s+(\\d+)\\s+R".r
              .findFirstMatchIn(body.substring(i, math.min(body.length, i + 32)))
              .flatMap(r => doc.objBody(r.group(1), r.group(2)))
        fd.foreach { d =>
          "/([^\\s/\\[\\]<>()]+)\\s+(\\d+)\\s+(\\d+)\\s+R".r.findAllMatchIn(d)
            .foreach { e =>
              val name = e.group(1)
              val tgt = (e.group(2), e.group(3))
              bound.get(name) match {
                case Some(prev) if prev != tgt => dropped += name
                case _ => bound(name) = tgt
              }
            }
        }
      }
    scan(doc.s)
    doc.stm.valuesIterator.foreach(scan)
    bound.iterator.filterNot { case (nm, _) => dropped(nm) }
      .flatMap { case (nm, (on, og)) => fontFor(on, og, doc).map(nm -> _) }
      .toMap
  }

  /** Merged ToUnicode CMaps across the document's fonts: show-text
    * code -> unicode string, from every /ToUnicode stream's
    * `beginbfchar`/`beginbfrange` sections (§9.10.3), split by code
    * width. This is the FALLBACK map for show text whose active font
    * could not be resolved (no Tf seen, or the Tf name is not in the
    * page's /Resources); Tf-scoped decode uses the per-font maps from
    * [[fontFor]]. Codes mapped differently by different fonts are
    * dropped from the merged map so they fall back to raw bytes rather
    * than decoding as the wrong font's text. */
  private def toUnicodeMap(doc: Doc): Cmaps = {
    val s = doc.s
    if (!s.contains("/ToUnicode") && doc.stm.isEmpty) return EmptyCmaps
    val refRe = "/ToUnicode\\s+(\\d+)\\s+(\\d+)\\s+R".r
    // font dicts routinely live inside object streams — scan their
    // decoded bodies for refs too (the CMap streams themselves cannot
    // be ObjStm-contained, so resolution stays raw-document)
    val refs = (refRe.findAllMatchIn(s).map(m => (m.group(1), m.group(2))) ++
        doc.stm.valuesIterator.flatMap(body =>
          refRe.findAllMatchIn(body).map(m => (m.group(1), m.group(2))))
      ).toSeq.distinct
    val out = Array.fill(2)(scala.collection.mutable.HashMap.empty[Int, String])
    val collided = Array.fill(2)(scala.collection.mutable.HashSet.empty[Int])
    refs.foreach { case (n, g) =>
      doc.lastObjStart(n, g).flatMap(streamObjectAt(doc, _)).foreach { case (_, cm) =>
        parseCmapSafe(cm).foreach { case (width, code, str) =>
          val i = width - 1
          out(i).get(code) match {
            case Some(prev) if prev != str => collided(i) += code
            case _ => out(i)(code) = str
          }
        }
      }
    }
    def clean(i: Int): Map[Int, String] =
      out(i).filterNot { case (code, _) => collided(i)(code) }.toMap
    Cmaps(clean(0), clean(1))
  }

  /** [[parseCmap]] with a per-stream catch: one corrupt CMap yields no
    * entries instead of failing the whole extract (ADVICE r10). */
  private def parseCmapSafe(cm: String): Seq[(Int, Int, String)] =
    try parseCmap(cm)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** (srcWidth, code, unicode) bfchar/bfrange entries of one ToUnicode
    * CMap stream; widths other than 1 or 2 bytes are skipped. Range
    * dsts come in both forms: a base hex whose last UTF-16 unit
    * increments across the range, or an explicit `[ <dst> ... ]`
    * array. */
  private def parseCmap(cm: String): Seq[(Int, Int, String)] = {
    val hex = "<([0-9A-Fa-f]+)>"
    def hexStr(h: String): String = {
      val padded = if (h.length % 2 == 0) h else h + "0"
      val bytes = new Array[Byte](padded.length / 2)
      var i = 0
      while (i < bytes.length) {
        bytes(i) = Integer.parseInt(padded.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      new String(bytes, StandardCharsets.UTF_16BE)
    }
    def widthOf(h: String): Int =
      if (h.length == 2) 1 else if (h.length == 4) 2 else 0
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    ("beginbfchar([\\s\\S]*?)endbfchar").r.findAllMatchIn(cm).foreach { sec =>
      (hex + "\\s*" + hex).r.findAllMatchIn(sec.group(1)).foreach { p =>
        val w = widthOf(p.group(1))
        if (w > 0) buf += ((w, Integer.parseInt(p.group(1), 16), hexStr(p.group(2))))
      }
    }
    ("beginbfrange([\\s\\S]*?)endbfrange").r.findAllMatchIn(cm).foreach { sec =>
      (hex + "\\s*" + hex + "\\s*(?:" + hex + "|\\[([\\s\\S]*?)\\])").r
        .findAllMatchIn(sec.group(1)).foreach { r =>
          // width FIRST, parse after (ADVICE r10): a src code of 8+ hex
          // digits (3/4-byte codespaces are legal; corrupt CMaps occur
          // in crawled PDFs) must skip the entry, not throw
          // NumberFormatException through extract() — widthOf caps the
          // parsed hex at 4 digits, so parseInt can never overflow
          val w = widthOf(r.group(1))
          if (w > 0 && widthOf(r.group(2)) == w) {
            val lo = Integer.parseInt(r.group(1), 16)
            val hi = Integer.parseInt(r.group(2), 16)
            if (hi >= lo && hi - lo <= 0xFFFF) {
              if (r.group(3) != null) {
                val base = hexStr(r.group(3))
                if (base.nonEmpty) (0 to hi - lo).foreach { k =>
                  val chars = base.toCharArray
                  chars(chars.length - 1) = (chars(chars.length - 1) + k).toChar
                  buf += ((w, lo + k, new String(chars)))
                }
              } else {
                hex.r.findAllMatchIn(r.group(4)).zipWithIndex.foreach { case (mm, k) =>
                  if (lo + k <= hi) buf += ((w, lo + k, hexStr(mm.group(1))))
                }
              }
            }
          }
        }
    }
    buf.toSeq
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

  /** The dict's /Filter names in DECODE order (PDF 32000-1 §7.4.1: an
    * array lists filters in the order they must be applied to decode).
    * None = no /Filter entry (unfiltered stream). An indirect /Filter
    * reference (`N G R`) parses as an empty list, which the caller's
    * supported-set check rejects — never misread as unfiltered. */
  private def filterNames(dict: String): Option[Seq[String]] =
    "/Filter\\s*(/\\w+|\\[[^\\]]*\\]|\\d+\\s+\\d+\\s+R)".r.findFirstMatchIn(dict)
      .map { m =>
        val v = m.group(1)
        if (v.startsWith("/") || v.startsWith("["))
          "/(\\w+)".r.findAllMatchIn(v).map(_.group(1)).toSeq
        else Seq("__indirect__") // unsupported: resolved refs need an xref walk
      }

  /** Filters decodable here, by spec name and inline-image abbreviation. */
  private val Decoders: Set[String] =
    Set("FlateDecode", "Fl", "LZWDecode", "LZW", "RunLengthDecode", "RL",
      "ASCIIHexDecode", "AHx", "ASCII85Decode", "A85")

  /** Apply the filter chain in decode order; None as soon as any stage
    * hits truncated/corrupt data. Returns the decoded content stream as
    * ISO-8859-1 chars (1:1 bytes). */
  private def decodeChain(raw: String, chain: Seq[String],
      earlyChange: Int): Option[String] =
    chain.foldLeft(Option(raw.getBytes(StandardCharsets.ISO_8859_1))) { (acc, f) =>
      acc.flatMap { bytes =>
        f match {
          case "FlateDecode" | "Fl" => inflate(bytes)
          case "LZWDecode" | "LZW" => lzwDecode(bytes, earlyChange)
          case "RunLengthDecode" | "RL" => runLengthDecode(bytes)
          case "ASCIIHexDecode" | "AHx" => asciiHexDecode(bytes)
          case "ASCII85Decode" | "A85" => ascii85Decode(bytes)
          case _ => None
        }
      }
    }.map(new String(_, StandardCharsets.ISO_8859_1))

  /** LZWDecode (§7.4.4): TIFF-style LZW. 9-bit codes growing to 12;
    * code 256 clears the table, 257 is EOD; with `/EarlyChange 1` (the
    * default) the code width bumps one entry early. Strict: data that
    * ends without EOD or contains an out-of-range code decodes to None,
    * which keeps the endstream candidate-extension boundary scan sound
    * (a truncated slice never "accidentally" decodes). */
  private def lzwDecode(data: Array[Byte], earlyChange: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    val table = new Array[Array[Byte]](4096)
    var b = 0
    while (b < 256) { table(b) = Array(b.toByte); b += 1 }
    var next = 258
    var width = 9
    var prev: Array[Byte] = null
    var acc = 0
    var nbits = 0
    var i = 0
    while (i < data.length) {
      acc = (acc << 8) | (data(i) & 0xFF)
      nbits += 8
      i += 1
      while (nbits >= width) {
        val code = (acc >>> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if (code == 256) { next = 258; width = 9; prev = null }
        else if (code == 257) return Some(out.toByteArray)
        else {
          val entry: Array[Byte] =
            if (code < next && table(code) != null) table(code)
            else if (code == next && prev != null) prev :+ prev(0) // KwKwK
            else return None // out-of-range code: corrupt/truncated
          out.write(entry, 0, entry.length)
          if (prev != null && next < 4096) { table(next) = prev :+ entry(0); next += 1 }
          prev = entry
          if (width < 12 && next + earlyChange >= (1 << width)) width += 1
        }
      }
    }
    None // ran out of data without EOD
  }

  /** RunLengthDecode (§7.4.5): length byte L ∈ [0,127] copies the next
    * L+1 bytes, L ∈ [129,255] repeats the next byte 257−L times, 128 is
    * EOD. Strict on EOD for the same boundary-scan reason as LZW. */
  private def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xFF
      if (l == 128) return Some(out.toByteArray)
      else if (l < 128) {
        if (i + 2 + l > data.length) return None // literal run truncated
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return None // repeat byte missing
        var n = 257 - l
        while (n > 0) { out.write(data(i + 1)); n -= 1 }
        i += 2
      }
    }
    None // ran out of data without EOD
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, '>' is EOD
    * (odd final digit gets an implied 0). Any other byte is corrupt. */
  private def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i).toChar
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return Some(out.toByteArray)
      }
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      } else if (!c.isWhitespace) return None
      i += 1
    }
    // EOD marker missing: accept what decoded (spec tolerates it on EOF)
    if (hi >= 0) out.write(hi << 4)
    Some(out.toByteArray)
  }

  /** ASCII85Decode (§7.4.3): 5 chars in '!'..'u' encode 4 bytes base 85;
    * 'z' is four zero bytes (group boundary only); a final partial group
    * of n chars yields n-1 bytes (pad with 'u'); '~>' is EOD. */
  private def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var n = 0
    def flush(count: Int): Boolean = { // count = chars in the group (2-5)
      if (count == 1) return false // a 1-char final group is invalid
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < count) grp(i) else 84); i += 1 }
      if (v > 0xFFFFFFFFL) return false // group overflows 32 bits
      var shift = 24
      var emitted = 0
      while (emitted < count - 1) {
        out.write(((v >> shift) & 0xFF).toInt); shift -= 8; emitted += 1
      }
      true
    }
    var i = 0
    while (i < data.length) {
      val c = data(i).toChar
      if (c == '~') { // EOD '~>' — tolerate a missing '>' at EOF
        if (n > 0 && !flush(n)) return None
        return Some(out.toByteArray)
      } else if (c == 'z') {
        if (n != 0) return None // 'z' inside a group is corrupt
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'
        n += 1
        if (n == 5) { if (!flush(5)) return None; n = 0 }
      } else if (!c.isWhitespace) return None
      i += 1
    }
    if (n > 0 && !flush(n)) return None
    Some(out.toByteArray)
  }

  /** A direct integer /Length (not an indirect `N G R` reference). The
    * possessive `\d++` is load-bearing: with a greedy `\d+`, "/Length 10
    * 0 R" backtracks the capture to "1" so the negative lookahead
    * passes, misreporting an indirect ref as a tiny direct length. */
  private def directLength(dict: String): Option[Int] =
    "/Length\\s+(\\d++)(?!\\s+\\d+\\s+R)".r.findFirstMatchIn(dict)
      .flatMap(_.group(1).toIntOption)

  /** Resolve an indirect `/Length N G R` by locating `N G obj <int>` in
    * the document — every real producer stores the deferred length as a
    * bare integer object, so a full xref walk is unnecessary. None when
    * the object is absent/non-integer (the caller then falls back to
    * EOD/boundary scanning). Resolution is an O(1) lookup in the
    * document's last-header index (incremental-update discipline as
    * everywhere: the LAST body wins). */
  private def indirectLength(dict: String, doc: Doc): Option[Int] =
    "/Length\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(dict).flatMap { m =>
      doc.lastObjStart(m.group(1), m.group(2)).flatMap { at =>
        "\\A\\s*(\\d++)".r
          .findFirstMatchIn(doc.s.substring(at, math.min(doc.s.length, at + 24)))
          .flatMap(_.group(1).toIntOption)
      }
    }

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
    * a text block are appended in stream order; one line per block.
    * The ACTIVE FONT is tracked through `Tf` operands (`/F1 12 Tf`):
    * each shown string decodes through that font's own CMap /
    * Differences map; a Tf name with no resolved font (or no Tf seen
    * yet) falls back to the merged-document maps. */
  private def shownText(body: String, out: StringBuilder,
      cmap: Cmaps, fonts: Map[String, FontDec]): Unit = {
    var i = 0
    var inText = false
    var lastName: String = null // most recent /Name token (Tf operand)
    var activeFont: FontDec = null
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '(') {
        val (str, next) = parseString(body, i)
        if (inText) out ++= decodeLiteralText(str, activeFont)
        i = next
      } else if (c == '<') {
        if (i + 1 < body.length && body.charAt(i + 1) == '<') i += 2 // dict, not a string
        else {
          val (str, next) = parseHexString(body, i)
          if (inText) out ++= decodeHexText(str, activeFont, cmap)
          i = next
        }
      } else if (c == '%') { // comment to end of line
        while (i < body.length && body.charAt(i) != '\n' && body.charAt(i) != '\r') i += 1
      } else if (c == '/') { // name token: remember it for Tf
        var j = i + 1
        while (j < body.length && !isDelimiter(body.charAt(j))) j += 1
        lastName = body.substring(i + 1, j)
        i = j
      } else if (c.isLetter || c == '\'' || c == '"') {
        var j = i
        while (j < body.length && !isDelimiter(body.charAt(j))) j += 1
        body.substring(i, j) match {
          case "BT" => inText = true
          case "ET" => if (inText) out += '\n'; inText = false
          case "Tf" =>
            activeFont =
              if (lastName == null) null else fonts.getOrElse(lastName, null)
          case _ => () // Td/Tj/TJ/... — positioning ignored, order kept
        }
        i = j
      } else i += 1
    }
  }

  /** BOM-tagged string (UTF-16BE FE FF or UTF-8 EF BB BF prefix)? Such
    * strings carry their own encoding and bypass font maps. */
  private def hasBom(raw: String): Boolean =
    (raw.length >= 2 && raw.charAt(0) == 0xFE.toChar && raw.charAt(1) == 0xFF.toChar) ||
      (raw.length >= 3 && raw.charAt(0) == 0xEF.toChar &&
        raw.charAt(1) == 0xBB.toChar && raw.charAt(2) == 0xBF.toChar)

  /** All-or-nothing decode of a shown string's codes through
    * (two, one) code -> unicode maps: 2-byte grouping tried first (the
    * CID/Identity-H case), then 1-byte (simple fonts); None unless ALL
    * codes map at one width. The all-or-nothing rule keeps a
    * simple-encoding string — whose byte pairs would only
    * coincidentally hit CMap codes — from decoding as mojibake:
    * partial hits fall back whole. */
  private def decodeAllMapped(raw: String, two: Map[Int, String],
      one: Map[Int, String]): Option[String] = {
    if (raw.isEmpty) return None
    if (two.nonEmpty && raw.length % 2 == 0) {
      val codes = new Array[Int](raw.length / 2)
      var i = 0
      var allMapped = true
      while (i < codes.length && allMapped) {
        codes(i) = (raw.charAt(2 * i) << 8) | raw.charAt(2 * i + 1)
        allMapped = two.contains(codes(i))
        i += 1
      }
      if (allMapped) return Some(codes.iterator.map(two).mkString)
    }
    if (one.nonEmpty) {
      var i = 0
      var allMapped = true
      while (i < raw.length && allMapped) {
        allMapped = one.contains(raw.charAt(i).toInt)
        i += 1
      }
      if (allMapped) return Some(raw.iterator.map(c => one(c.toInt)).mkString)
    }
    None
  }

  /** Per-byte `/Differences` decode: remapped codes take their glyph's
    * unicode, unmapped codes keep the Latin-1 baseline (a Differences
    * array only overrides part of the base encoding, §9.6.6.3);
    * BOM-tagged strings bypass the map. Falls through to
    * [[decodeTextString]] when the font has no Differences. */
  private def applyDiffsOrRaw(raw: String, font: FontDec): String =
    if (font.diffs.nonEmpty && !hasBom(raw))
      raw.iterator.map(c => font.diffs.getOrElse(c.toInt, c.toString)).mkString
    else decodeTextString(raw)

  /** Literal show-string decode under the active font: the font's own
    * CMap first (all-or-nothing — simple fonts with ToUnicode show
    * literal strings whose byte codes the CMap maps), then its
    * Differences map, then the BOM/raw baseline. NO merged-document
    * fallback here: literal strings in un-tracked fonts keep the
    * historical raw decode (hex strings are the subset-font vehicle). */
  private def decodeLiteralText(str: String, font: FontDec): String =
    if (font == null) decodeTextString(str)
    else if (font.hasCmap && !hasBom(str))
      decodeAllMapped(str, font.two, font.one)
        .getOrElse(font.charset.map(charsetText(str, _))
          .getOrElse(applyDiffsOrRaw(str, font)))
    else font.charset.map(charsetText(str, _))
      .getOrElse(applyDiffsOrRaw(str, font))

  /** One PDF hex string starting at `start` (the '<'): pairs of hex
    * digits are bytes, whitespace is ignored, an odd final digit gets an
    * implied trailing '0' (PDF 32000-1 §7.3.4.3). Bytes map 1:1 to chars
    * (ISO-8859-1); [[decodeHexText]] then applies the document's
    * ToUnicode CMaps. Returns (text, index past '>'). */
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

  /** Hex show-text decode: the ACTIVE FONT's own CMap first
    * (all-or-nothing via [[decodeAllMapped]]), then its Differences
    * map; when no font is active (or the font carries no decode
    * state), the merged-document CMaps — the historical fallback —
    * then BOM-tagged / raw Latin-1 bytes. A font that HAS a CMap never
    * cross-decodes through another font's merged entries: its misses
    * fall back to Differences/raw, which is what kills the cross-font
    * collision problem (two subset fonts mapping code 1 differently is
    * the norm, not the edge). */
  private def decodeHexText(raw: String, font: FontDec, cmaps: Cmaps): String =
    if (font == null)
      decodeAllMapped(raw, cmaps.two, cmaps.one).getOrElse(decodeTextString(raw))
    else if (font.hasCmap)
      decodeAllMapped(raw, font.two, font.one)
        .getOrElse(font.charset.map(charsetText(raw, _))
          .getOrElse(applyDiffsOrRaw(raw, font)))
    else font.charset.map(charsetText(raw, _))
      .getOrElse(applyDiffsOrRaw(raw, font))

  /** Show-string bytes under a predefined CMap encoding: the codes ARE
    * code units of `cs` — UTF-16BE for the Uni* families, the national
    * charset for the legacy CJK families ([[predefinedCmapCharset]]).
    * A BOM-tagged string keeps the §7.9.2.2 decode (which also strips
    * the BOM); surrogate pairs / multi-byte sequences fall out of the
    * charset decode naturally, and malformed sequences degrade
    * per-char to the replacement character — never a throw. */
  private def charsetText(raw: String, cs: java.nio.charset.Charset): String =
    if (hasBom(raw)) decodeTextString(raw)
    else new String(raw.getBytes(StandardCharsets.ISO_8859_1), cs)

  /** PDF text strings are PDFDocEncoding (≈Latin-1 here) unless tagged
    * with a UTF-16BE or UTF-8 BOM (PDF 32000-1 §7.9.2.2) — the standard
    * vehicle for non-Latin show text. The parsed chars map 1:1 to the
    * original bytes, so re-decode through the tagged charset. */
  private def decodeTextString(raw: String): String =
    if (raw.length >= 2 && raw.charAt(0) == 0xFE.toChar && raw.charAt(1) == 0xFF.toChar)
      new String(raw.getBytes(StandardCharsets.ISO_8859_1), 2, raw.length - 2,
        StandardCharsets.UTF_16BE)
    else if (raw.length >= 3 && raw.charAt(0) == 0xEF.toChar &&
        raw.charAt(1) == 0xBB.toChar && raw.charAt(2) == 0xBF.toChar)
      new String(raw.getBytes(StandardCharsets.ISO_8859_1), 3, raw.length - 3,
        StandardCharsets.UTF_8)
    else raw

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
