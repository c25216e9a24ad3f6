package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source robustness: the error-row channel for malformed input
  * (the Spark analogue of the reference's explicit extraction errors,
  * streamlit_app.py:70-71 — bad rows are surfaced, not silently lost). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A structurally complete one-page PDF whose content stream is NOT
    * filtered — the subset where the text layer is directly parsable.
    * Golden bytes, built inline: catalog -> pages -> page -> contents. */
  private def goldenPdf(contentStream: String, filtered: Boolean): Array[Byte] = {
    val filter = if (filtered) "/Filter /FlateDecode " else ""
    (s"""%PDF-1.4
       |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
       |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
       |3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]
       |  /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj
       |4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj
       |5 0 obj << ${filter}/Length ${contentStream.length} >>
       |stream
       |$contentStream
       |endstream
       |endobj
       |trailer << /Size 6 /Root 1 0 R >>
       |%%EOF""").stripMargin.getBytes("ISO-8859-1")
  }

  /** zlib-deflate (level -1 = default; 0 = stored blocks, which embed the
    * input bytes verbatim — used to plant "endstream" inside the payload). */
  private def deflate(data: String, level: Int = -1): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(data.getBytes("ISO-8859-1")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Byte-exact PDF assembly: strings are ISO-8859-1 text parts, raw
    * compressed payloads pass through verbatim (string interpolation +
    * stripMargin would corrupt payloads containing '\n'+ws+'|' and break
    * the /Length byte count). */
  private def pdfBytes(parts: Any*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach {
      case str: String => out.write(str.getBytes("ISO-8859-1"))
      case raw: Array[Byte] => out.write(raw)
      case other => fail(s"unexpected fixture part: $other")
    }
    out.toByteArray
  }

  /** Multi-page golden PDF with FlateDecode'd content streams, one per
    * page. `lengthOf` renders each stream's /Length value (default: the
    * exact byte count as a direct int; override for indirect refs). */
  private def flatePdf(pageStreams: Seq[Array[Byte]],
      lengthOf: Array[Byte] => String = b => b.length.toString,
      extraObjs: Seq[Array[Byte]] => String = _ => ""): Array[Byte] = {
    val kids = pageStreams.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    val parts = scala.collection.mutable.ArrayBuffer[Any](
      "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      s"2 0 obj << /Type /Pages /Kids [$kids] /Count ${pageStreams.length} >> endobj\n")
    pageStreams.zipWithIndex.foreach { case (bytes, i) =>
      parts += s"${3 + 2 * i} 0 obj << /Type /Page /Parent 2 0 R /Contents ${4 + 2 * i} 0 R >> endobj\n"
      parts += s"${4 + 2 * i} 0 obj << /Filter /FlateDecode /Length ${lengthOf(bytes)} >>\nstream\n"
      parts += bytes
      parts += "\nendstream\nendobj\n"
    }
    parts += extraObjs(pageStreams)
    parts += s"trailer << /Size ${3 + 2 * pageStreams.length} /Root 1 0 R >>\n%%EOF"
    pdfBytes(parts.toSeq: _*)
  }

  test("golden-bytes PDF: FlateDecode'd content streams are inflated and extracted (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // single page, default compression
    val one = flatePdf(Seq(deflate("BT /F1 12 Tf 72 712 Td (Compressed hello) Tj ET")))
    assert(SimplePdfTextExtractor.extract(one) == "Compressed hello\n")
    // multi-page: pages concatenate with no extra separator beyond the
    // one line per BT..ET block (ref concatenates pages with no
    // separator, streamlit_app.py:63)
    val multi = flatePdf(Seq(
      deflate("BT (page one) Tj ET"),
      deflate("BT (page two) Tj ET"),
      deflate("BT (page three) Tj ET")))
    assert(SimplePdfTextExtractor.extract(multi) == "page one\npage two\npage three\n")
    // [/FlateDecode] one-element array form of the filter is recognized
    val arr = new String(flatePdf(Seq(deflate("BT (array form) Tj ET"))), "ISO-8859-1")
      .replace("/Filter /FlateDecode", "/Filter [/FlateDecode]")
    assert(SimplePdfTextExtractor.extract(arr.getBytes("ISO-8859-1")) == "array form\n")
  }

  test("FlateDecode: literal 'endstream' inside compressed payload does not truncate (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // level 0 = stored blocks: input bytes appear verbatim in the
    // compressed payload, so the shown string "...endstream..." plants
    // the keyword inside the stream body; only /Length-based slicing
    // (not the regex capture) recovers the full stream
    val payload = deflate("BT (before endstream after) Tj ET", level = 0)
    assert(new String(payload, "ISO-8859-1").contains("endstream"))
    val text = SimplePdfTextExtractor.extract(flatePdf(Seq(payload)))
    assert(text == "before endstream after\n")
  }

  test("indirect /Length N G R: multi-digit object numbers do not misparse as direct (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // '/Length 10 0 R' must NOT parse as direct length 1 (greedy-regex
    // backtracking shrinks (\d+) to '1' so the lookahead passes); the ref
    // resolves through the '10 0 obj <int>' object to an exact slice
    def indirectPdf(payload: Array[Byte]): Array[Byte] = flatePdf(Seq(payload),
      lengthOf = _ => "10 0 R",
      extraObjs = ps => s"10 0 obj ${ps.head.length} endobj\n")
    val simple = indirectPdf(deflate("BT (indirect length works) Tj ET"))
    assert(SimplePdfTextExtractor.extract(simple) == "indirect length works\n")
    // embedded literal 'endstream' + resolvable indirect /Length: the
    // resolved exact slice never even sees the embedded keyword
    val tricky = deflate("BT (pre endstream post) Tj ET", level = 0)
    assert(new String(tricky, "ISO-8859-1").contains("endstream"))
    assert(SimplePdfTextExtractor.extract(indirectPdf(tricky)) == "pre endstream post\n")
    // UNRESOLVABLE indirect /Length (no such object) + embedded
    // 'endstream': the first candidate boundary is inside the compressed
    // bytes (truncated zlib -> None); the extractor extends to the next
    // candidate and recovers the text
    val unresolvable = flatePdf(Seq(tricky), lengthOf = _ => "99 0 R")
    assert(SimplePdfTextExtractor.extract(unresolvable) == "pre endstream post\n")
  }

  test("indirect /Length on an UNFILTERED stream: exact slice recovers text past an embedded 'endstream' (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // For raw (unfiltered) payloads there is no decode-failure signal to
    // detect a truncated boundary, so only a resolved /Length can carry
    // the scan past a literal 'endstream' inside the shown text
    val content = "BT (before endstream after) Tj ET"
    val resolved = filteredPdf("", content.getBytes("ISO-8859-1"))
    assert(SimplePdfTextExtractor.extract(resolved) == "before endstream after\n")
    // unresolvable: the scan must stop at the first 'endstream' (the
    // safe truncation) rather than swallowing the rest of the file
    val lost = filteredPdf("", content.getBytes("ISO-8859-1"), resolvable = false)
    assert(SimplePdfTextExtractor.extract(lost) == "before ")
  }

  test("nested /DecodeParms sub-dict: predictor streams contribute no garbage text (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // A flate+predictor stream (the xref/object-stream shape in nearly
    // every PDF 1.5+). A non-nesting-aware dict capture grabs only the
    // inner << /Predictor ... >> (no /Filter!) and feeds raw zlib bytes
    // to the text scanner as if unfiltered -> garbage. Must yield "".
    val payload = deflate("BT (must not appear) Tj ET")
    val parms = pdfBytes(
      "%PDF-1.5\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
      s"4 0 obj << /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> /Length ${payload.length} >>\nstream\n",
      payload,
      "\nendstream\nendobj\n",
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(parms) == "")
    // ...and a predictor stream earlier in the file must not poison a
    // later plain text stream (the resume position stays stream-aligned)
    val good = deflate("BT (real text) Tj ET")
    val mixed = pdfBytes(
      "%PDF-1.5\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      s"6 0 obj << /Type /XRef /Filter /FlateDecode /DP << /Predictor 12 /Columns 4 >> /Length ${payload.length} >>\nstream\n",
      payload,
      "\nendstream\nendobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${good.length} >>\nstream\n",
      good,
      "\nendstream\nendobj\n",
      "trailer << /Size 7 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(mixed) == "real text\n")
  }

  test("hex-string show-text operands <...> Tj/TJ decode as raw bytes (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // <48656C6C6F> = "Hello"; whitespace inside hex is ignored; an odd
    // final digit gets an implied trailing 0 (<4F4B2> = "OK" + 0x20)
    val content = "BT <48656C6C6F> Tj ET\n" +
      "BT [<20> (mix) <21>] TJ ET\n" +
      "BT <48 65 6C> Tj <4F4B2> Tj ET"
    val text = SimplePdfTextExtractor.extract(goldenPdf(content, filtered = false))
    assert(text == "Hello\n mix!\nHelOK \n")
    // hex strings inside a FlateDecode'd stream take the same path
    val flate = flatePdf(Seq(deflate("BT <636F6D7072657373656420686578> Tj ET")))
    assert(SimplePdfTextExtractor.extract(flate) == "compressed hex\n")
    // a << dict >> operand inside the content stream is not shown text
    val dict = SimplePdfTextExtractor.extract(
      goldenPdf("BT /P << /MCID 0 >> BDC (tagged) Tj EMC ET", filtered = false))
    assert(dict == "tagged\n")
  }

  /** Test-only ASCII85 encoder (inverse of the extractor's decoder). */
  private def a85(data: Array[Byte]): String = {
    val sb = new StringBuilder
    data.grouped(4).foreach { g =>
      var v = 0L
      g.foreach(b => v = (v << 8) | (b & 0xFF))
      v <<= 8 * (4 - g.length)
      val cs = new Array[Char](5)
      var rem = v
      (4 to 0 by -1).foreach { i => cs(i) = ('!' + (rem % 85).toInt).toChar; rem /= 85 }
      if (g.length == 4 && v == 0) sb += 'z' else sb ++= cs.take(g.length + 1)
    }
    sb ++= "~>"
    sb.result()
  }

  /** One-page PDF whose content stream carries an arbitrary /Filter
    * value and pre-encoded payload. /Length is always the indirect ref
    * `10 0 R`: with `resolvable = true` the `10 0 obj` integer exists
    * (exercising indirect-length resolution → exact payload slice);
    * with `false` it does not, so boundary detection exercises each
    * filter's EOD logic. `filterVal = ""` omits the /Filter key
    * (unfiltered stream). `extraDict` splices additional entries
    * (e.g. a /DecodeParms sub-dict) into the stream dict. */
  private def filteredPdf(filterVal: String, payload: Array[Byte],
      resolvable: Boolean = true, extraDict: String = ""): Array[Byte] = {
    val filterEntry = if (filterVal.isEmpty) "" else s"/Filter $filterVal "
    pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
      s"4 0 obj << $filterEntry$extraDict/Length 10 0 R >>\nstream\n",
      payload,
      "\nendstream\nendobj\n",
      if (resolvable) s"10 0 obj ${payload.length} endobj\n" else "",
      "trailer << /Size 11 /Root 1 0 R >>\n%%EOF")
  }

  test("ASCIIHexDecode and ASCII85Decode streams extract, incl. abbreviations (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val content = "BT (ascii filter text) Tj ET"
    val hex = content.getBytes("ISO-8859-1").map(b => f"$b%02X").mkString(" ") + ">"
    // resolvable /Length -> exact slice; unresolvable -> the '>' EOD
    // marker bounds the data (hex cannot spell 'endstream')
    for (res <- Seq(true, false)) {
      assert(SimplePdfTextExtractor.extract(
        filteredPdf("/ASCIIHexDecode", hex.getBytes("ISO-8859-1"), resolvable = res))
        == "ascii filter text\n")
      assert(SimplePdfTextExtractor.extract(
        filteredPdf("/AHx", hex.getBytes("ISO-8859-1"), resolvable = res))
        == "ascii filter text\n")
    }
    val b85 = a85(content.getBytes("ISO-8859-1"))
    // unresolvable -> the '~>' EOD marker bounds the data
    for (res <- Seq(true, false)) {
      assert(SimplePdfTextExtractor.extract(
        filteredPdf("/ASCII85Decode", b85.getBytes("ISO-8859-1"), resolvable = res))
        == "ascii filter text\n")
      assert(SimplePdfTextExtractor.extract(
        filteredPdf("/A85", b85.getBytes("ISO-8859-1"), resolvable = res))
        == "ascii filter text\n")
    }
    // 'z' shorthand for an all-zero group: four NUL bytes at a 4-byte
    // boundary encode as one 'z' (the token scanner skips NULs, so only
    // the shown string survives in the output)
    val zsrc = "\u0000\u0000\u0000\u0000BT (z ok) Tj ET"
    val zpay = a85(zsrc.getBytes("ISO-8859-1"))
    assert(zpay.startsWith("z"), "fixture must actually exercise the 'z' shorthand")
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("/A85", zpay.getBytes("ISO-8859-1"), resolvable = false)) == "z ok\n")
  }

  test("chained filters decode in spec order: [/ASCII85Decode /FlateDecode] (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // encoder applies Flate then ASCII85; decoder must run ASCII85 first,
    // then inflate (the /Filter array lists DECODE order)
    val content = "BT (chained filters work) Tj ET"
    val enc = a85(deflate(content))
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("[/ASCII85Decode /FlateDecode]", enc.getBytes("ISO-8859-1")))
      == "chained filters work\n")
    val encHex = (deflate(content).map(b => f"$b%02X").mkString + ">")
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("[/AHx /Fl]", encHex.getBytes("ISO-8859-1")))
      == "chained filters work\n")
    // unsupported filter anywhere in the chain: no text, no garbage
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("[/DCTDecode /FlateDecode]", enc.getBytes("ISO-8859-1"))) == "")
    // indirect /Filter reference: unsupported (needs xref walk), not
    // misread as unfiltered raw text
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("11 0 R", content.getBytes("ISO-8859-1"))) == "")
  }

  /** Test-only PDF LZW encoder (§7.4.4 inverse): 9→12-bit codes
    * MSB-first, Clear (256) first, EOD (257) last; the code width bumps
    * when `next + earlyChange - 1` fills the current width — one entry
    * ahead of the decoder, whose table lags the encoder's by one. */
  private def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code; nbits += width
      while (nbits >= 8) { out.write(((acc >> (nbits - 8)) & 0xFF).toInt); nbits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var next = 258
    emit(256) // Clear
    var w = Vector.empty[Byte]
    def codeOf(seq: Seq[Byte]): Int = if (seq.length == 1) seq.head & 0xFF else dict(seq)
    data.foreach { byt =>
      val wk = w :+ byt
      if (wk.length == 1 || dict.contains(wk)) w = wk
      else {
        emit(codeOf(w))
        if (next < 4096) {
          dict(wk) = next; next += 1
          if (width < 12 && next + earlyChange - 1 >= (1 << width)) width += 1
        }
        w = Vector(byt)
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(257) // EOD
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xFF).toInt)
    out.toByteArray
  }

  test("LZWDecode streams extract, incl. /EarlyChange 0 and code-width growth (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // enough distinct digrams to push the code table past 511 entries,
    // so the 9->10 bit width bump (and its EarlyChange timing) is
    // actually exercised — a width mismatch derails every later code
    val texts = (0 until 150).map(i => s"lzw token ${i * 37 % 997} #$i")
    val content = texts.map(t => s"BT ($t) Tj ET").mkString("\n")
    val expected = texts.map(_ + "\n").mkString
    val enc1 = lzwEncode(content.getBytes("ISO-8859-1"))
    assert(enc1.length > 512 * 10 / 8, "fixture must grow past 9-bit codes")
    assert(SimplePdfTextExtractor.extract(filteredPdf("/LZWDecode", enc1)) == expected)
    assert(SimplePdfTextExtractor.extract(filteredPdf("/LZW", enc1)) == expected)
    // /EarlyChange 0 shifts every width bump by one entry; the decoder
    // must honor the parm (and a benign parm dict must not be rejected)
    val enc0 = lzwEncode(content.getBytes("ISO-8859-1"), earlyChange = 0)
    assert(SimplePdfTextExtractor.extract(filteredPdf("/LZWDecode", enc0,
      extraDict = "/DecodeParms << /EarlyChange 0 >> ")) == expected)
    // ...and the wrong EarlyChange timing must fail closed ("" not garbage)
    assert(SimplePdfTextExtractor.extract(filteredPdf("/LZWDecode", enc0)) == "")
    // unresolvable /Length: strict-EOD decode keeps the endstream
    // candidate-extension scan sound for LZW payloads too
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("/LZWDecode", enc1, resolvable = false)) == expected)
    // chain: ASCII85 text-armored LZW decodes in spec order
    val chained = a85(enc1).getBytes("ISO-8859-1")
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("[/ASCII85Decode /LZWDecode]", chained)) == expected)
  }

  test("RunLengthDecode streams extract; literal and repeat runs both decode (A2)") {
    import graft.sources.SimplePdfTextExtractor
    def lit(s: String): Array[Byte] =
      (s.length - 1).toByte +: s.getBytes("ISO-8859-1")
    // hand-assembled RL payload: literal run + 20-byte repeat run ('A'
    // x20 encodes as two bytes) + literal run + EOD (128)
    val payload = lit("BT (ab") ++ Array((257 - 20).toByte, 'A'.toByte) ++
      lit(") Tj ET") ++ Array(128.toByte)
    val expected = "ab" + ("A" * 20) + "\n"
    assert(SimplePdfTextExtractor.extract(filteredPdf("/RunLengthDecode", payload)) == expected)
    assert(SimplePdfTextExtractor.extract(filteredPdf("/RL", payload)) == expected)
    // truncated RL data (missing EOD) fails closed
    assert(SimplePdfTextExtractor.extract(
      filteredPdf("/RunLengthDecode", payload.dropRight(1))) == "")
  }

  test("benign /DecodeParms (/Predictor 1) is not rejected; /Predictor 2+ still is (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val payload = deflate("BT (predictor one is none) Tj ET")
    assert(SimplePdfTextExtractor.extract(filteredPdf("/FlateDecode", payload,
      extraDict = "/DecodeParms << /Predictor 1 >> ")) == "predictor one is none\n")
    assert(SimplePdfTextExtractor.extract(filteredPdf("/FlateDecode", payload,
      extraDict = "/DecodeParms << /Predictor 12 /Columns 4 >> ")) == "")
    // an indirect /DecodeParms ref cannot be inspected: fail closed
    assert(SimplePdfTextExtractor.extract(filteredPdf("/FlateDecode", payload,
      extraDict = "/DecodeParms 12 0 R ")) == "")
  }

  test("BOM-tagged show strings decode as UTF-16BE / UTF-8 (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // <FEFF...> hex string: UTF-16BE "Hí" (0048 00ED)
    val utf16 = SimplePdfTextExtractor.extract(
      goldenPdf("BT <FEFF004800ED> Tj ET", filtered = false))
    assert(utf16 == "Hí\n")
    // literal string with UTF-8 BOM bytes (EF BB BF) + "héllo" in UTF-8
    val lit = "BT (ï»¿hÃ©llo) Tj ET"
    val utf8 = SimplePdfTextExtractor.extract(goldenPdf(lit, filtered = false))
    assert(utf8 == "héllo\n")
    // no BOM: bytes stay Latin-1 (PDFDocEncoding approximation)
    val plain = SimplePdfTextExtractor.extract(
      goldenPdf("BT <48E9> Tj ET", filtered = false))
    assert(plain == "Hé\n")
  }

  test("compressed PDF flows through the full ingest pipeline without routing to OCR") {
    import graft.sources.{FallbackExtractor, OcrExtractor, SimplePdfTextExtractor}
    object TrapOcr extends OcrExtractor {
      override def ocr(content: Array[Byte]): String = "OCR-SHOULD-NOT-RUN"
    }
    val dir = Files.createTempDirectory("graft_pdf_ingest")
    Files.write(dir.resolve("doc.pdf"),
      flatePdf(Seq(deflate("BT (The quick brown fox jumps over the lazy dog) Tj ET"))))
    val docs = graft.operators.Ingest.readBinaryDocs(
      spark, dir.toString, new FallbackExtractor(SimplePdfTextExtractor, TrapOcr))
    val out = graft.operators.Ingest.pipeline(docs).cache()
    try {
      assert(out.count() >= 1)
      val texts = out.select("chunk_text").as[String].collect()
      assert(texts.exists(_.contains("quick brown fox")))
      assert(!texts.exists(_.contains("OCR-SHOULD-NOT-RUN")))
    } finally out.unpersist()
  }

  test("golden-bytes PDF: uncompressed text layer is extracted (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val content = "BT /F1 12 Tf 72 712 Td (Hello graft \\(PDF\\)) Tj ET\n" +
      "BT /F1 12 Tf 72 690 Td [(page ) (one)] TJ ET"
    val text = SimplePdfTextExtractor.extract(goldenPdf(content, filtered = false))
    assert(text == "Hello graft (PDF)\npage one\n")
    // octal + control escapes survive unescaping
    val esc = SimplePdfTextExtractor.extract(
      goldenPdf("BT (A\\tB\\101) Tj ET", filtered = false))
    assert(esc == "A\tBA\n")
    // "ET"/"BT" INSIDE a shown string must not terminate the block (a
    // regex over raw bytes truncates at "QUIET"), and balanced unescaped
    // parens are legal in PDF string literals
    val tricky = SimplePdfTextExtractor.extract(
      goldenPdf("BT (QUIET BUDGET) Tj (Hello (nested) world) Tj ET", filtered = false))
    assert(tricky == "QUIET BUDGETHello (nested) world\n")
    // backslash-newline is line continuation: no output character
    val cont = SimplePdfTextExtractor.extract(
      goldenPdf("BT (long\\\n text) Tj ET", filtered = false))
    assert(cont == "long text\n")
  }

  test("golden-bytes PDF: corrupt/undecodable filtered stream -> OCR fallback (A3)") {
    import graft.sources.{FallbackExtractor, OcrExtractor, SimplePdfTextExtractor}
    // a stream CLAIMING /FlateDecode whose body is not valid zlib data
    // (here: raw uncompressed text) yields no text layer -> the fallback
    // routes to OCR, mirroring the reference's scanned-page path
    val pdf = goldenPdf("BT (invisible) Tj ET", filtered = true)
    assert(SimplePdfTextExtractor.extract(pdf) == "")
    object FakeOcr extends OcrExtractor {
      override def ocr(content: Array[Byte]): String = "ocr-text"
    }
    val composite = new FallbackExtractor(SimplePdfTextExtractor, FakeOcr)
    assert(composite.extract(pdf) == "ocr-text")
    // non-PDF bytes are an explicit error (ref raises, not silently empty)
    intercept[IllegalArgumentException] {
      SimplePdfTextExtractor.extract("plain text".getBytes("UTF-8"))
    }
  }

  test("PDF page-tree order wins over byte order; broken trees fall back (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val pg1 = deflate("BT (page one) Tj ET")
    val pg2 = deflate("BT (page two) Tj ET")
    // page TWO's content object is written FIRST in the file: the
    // byte-order scan would emit "page two" first, the Kids walk must
    // restore page order (ref concatenates pages in page order)
    val outOfOrder = pdfBytes(
      "%PDF-1.4\n",
      s"6 0 obj << /Filter /FlateDecode /Length ${pg2.length} >>\nstream\n", pg2,
      "\nendstream\nendobj\n",
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
      "5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${pg1.length} >>\nstream\n", pg1,
      "\nendstream\nendobj\n",
      "trailer << /Size 7 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(outOfOrder) == "page one\npage two\n")
    // a /Contents ARRAY contributes each stream in array order
    val contentsArray = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents [6 0 R 4 0 R] >> endobj\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${pg2.length} >>\nstream\n", pg2,
      "\nendstream\nendobj\n",
      s"6 0 obj << /Filter /FlateDecode /Length ${pg1.length} >>\nstream\n", pg1,
      "\nendstream\nendobj\n",
      "trailer << /Size 7 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(contentsArray) == "page one\npage two\n")
    // NO catalog: fall back to the byte-order scan, text still extracted
    val noCatalog = pdfBytes(
      "%PDF-1.4\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${pg1.length} >>\nstream\n", pg1,
      "\nendstream\nendobj\n%%EOF")
    assert(SimplePdfTextExtractor.extract(noCatalog) == "page one\n")
    // CYCLIC Kids: the walk bails, the byte-order fallback still works
    val cyclic = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [2 0 R] /Count 1 >> endobj\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${pg1.length} >>\nstream\n", pg1,
      "\nendstream\nendobj\n",
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(cyclic) == "page one\n")
    // a DANGLING /Contents ref (object absent, e.g. in an ObjStm):
    // fall back rather than silently dropping the page
    val dangling = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 9 0 R >> endobj\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${pg1.length} >>\nstream\n", pg1,
      "\nendstream\nendobj\n",
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(dangling) == "page one\n")
  }

  /** Deflated `/Type /ObjStm` payload: (stream bytes, N, First). */
  private def objStmPayload(objs: Seq[(Int, String)]): (Array[Byte], Int, Int) = {
    var off = 0
    val offsets = objs.map { case (_, body) => val o = off; off += body.length; o }
    val header = objs.zip(offsets).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
    (deflate(header + objs.map(_._2).mkString), objs.length, header.length)
  }

  test("PDF 1.5 ObjStm: page tree compressed in an object stream still walks in tree order (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val pg1 = deflate("BT (page one) Tj ET")
    val pg2 = deflate("BT (page two) Tj ET")
    // the ENTIRE page tree (catalog, pages, both page dicts) lives in a
    // FlateDecode'd object stream; only the content streams are direct
    // objects — the modern (PDF 1.5+) layout the round-9 walker bailed
    // on. Content objects are written pg2-first so byte order diverges
    // from page order: only a real ObjStm-resolved tree walk yields
    // "page one" first.
    val (stm, n, first) = objStmPayload(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      5 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"))
    val pdf = pdfBytes(
      "%PDF-1.5\n",
      s"6 0 obj << /Filter /FlateDecode /Length ${pg2.length} >>\nstream\n", pg2,
      "\nendstream\nendobj\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${pg1.length} >>\nstream\n", pg1,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Type /ObjStm /N $n /First $first /Filter /FlateDecode" +
        s" /Length ${stm.length} >>\nstream\n", stm,
      "\nendstream\nendobj\n",
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf) == "page one\npage two\n")
    // hybrid: Page dicts in the ObjStm, catalog + pages direct
    val (stm2, n2, first2) = objStmPayload(Seq(
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      5 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"))
    val hybrid = pdfBytes(
      "%PDF-1.5\n",
      s"6 0 obj << /Filter /FlateDecode /Length ${pg2.length} >>\nstream\n", pg2,
      "\nendstream\nendobj\n",
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n",
      s"4 0 obj << /Filter /FlateDecode /Length ${pg1.length} >>\nstream\n", pg1,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Type /ObjStm /N $n2 /First $first2 /Filter /FlateDecode" +
        s" /Length ${stm2.length} >>\nstream\n", stm2,
      "\nendstream\nendobj\n",
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(hybrid) == "page one\npage two\n")
  }

  test("PDF ToUnicode CMap: subset-font hex show-text decodes to real text (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // bfchar singles, an array-form bfrange (repeated 'l'), a multi-char
    // dst (ffl ligature), and an increment-form bfrange (A, B, C)
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |4 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |<0005> <006F>
        |<0006> <00660066006C>
        |endbfchar
        |2 beginbfrange
        |<0003> <0004> [<006C> <006C>]
        |<0100> <0102> <0041>
        |endbfrange
        |endcmap
        |end""".stripMargin
    val content = deflate(
      "BT <000100020003000400050006> Tj ET BT <010001010102> Tj ET")
    val pdf = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${content.length} >>\nstream\n", content,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Length ${cmap.length} >>\nstream\n", cmap,
      "\nendstream\nendobj\n",
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf) == "Helloffl\nABC\n")
    // all-or-nothing: a hex string with ANY unmapped 2-byte code falls
    // back whole to raw bytes — no partial CMap mojibake
    val mixed = deflate("BT <00010009> Tj ET")
    val pdf2 = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${mixed.length} >>\nstream\n", mixed,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Length ${cmap.length} >>\nstream\n", cmap,
      "\nendstream\nendobj\n",
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf2) == "\u0000\u0001\u0000\t\n")
    // no ToUnicode in the doc: hex strings keep decoding as raw bytes
    val plainHex = flatePdf(Seq(deflate("BT <686578207374696C6C20776F726B73> Tj ET")))
    assert(SimplePdfTextExtractor.extract(plainHex) == "hex still works\n")
    // 1-BYTE codes (simple fonts declare <41>-style srcs): width comes
    // from the CMap's own src hex length; the odd-length hex string
    // can't group as 2-byte and must decode through the 1-byte map
    val cmap1 =
      """1 beginbfchar
        |<2A> <0021>
        |endbfchar
        |1 beginbfrange
        |<41> <43> <0057>
        |endbfrange""".stripMargin
    val oneByte = deflate("BT <414243> Tj <2A> Tj ET")
    val pdf1b = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /TrueType /ToUnicode 7 0 R >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${oneByte.length} >>\nstream\n", oneByte,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Length ${cmap1.length} >>\nstream\n", cmap1,
      "\nendstream\nendobj\n",
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf1b) == "WXY!\n")
    // the /ToUnicode ref inside an ObjStm-compressed font dict is
    // still collected (PDF 1.5+ files compress font dicts too)
    val (stm, n, first) = objStmPayload(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"),
      4 -> "<< /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >>"))
    val pdf3 = pdfBytes(
      "%PDF-1.5\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${content.length} >>\nstream\n", content,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Length ${cmap.length} >>\nstream\n", cmap,
      "\nendstream\nendobj\n",
      s"8 0 obj << /Type /ObjStm /N $n /First $first /Filter /FlateDecode" +
        s" /Length ${stm.length} >>\nstream\n", stm,
      "\nendstream\nendobj\n",
      "trailer << /Size 9 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf3) == "Helloffl\nABC\n")
  }

  test("PDF incremental update: the LAST body of an object wins (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val stale = deflate("BT (stale draft text) Tj ET")
    val live = deflate("BT (live updated text) Tj ET")
    // the superseded generation of object 4 appears EARLIER in byte
    // order (incremental updates append); without an xref walk the last
    // textual match must win, for the /Contents target and for the
    // indirect /Length object alike
    val pdf = pdfBytes(
      "%PDF-1.4\n",
      "9 0 obj 5 endobj\n", // stale /Length value for object 4
      s"4 0 obj << /Filter /FlateDecode /Length ${stale.length} >>\nstream\n", stale,
      "\nendstream\nendobj\n",
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n",
      s"9 0 obj ${live.length} endobj\n", // live /Length value
      s"4 0 obj << /Filter /FlateDecode /Length 9 0 R >>\nstream\n", live,
      "\nendstream\nendobj\n",
      "trailer << /Size 10 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf) == "live updated text\n")
  }

  test("PDF /Encoding /Differences: custom-encoded simple fonts decode via glyph names (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // codes 128-131 remapped via an INLINE /Encoding dict; unmapped
    // codes keep their Latin-1 baseline; /uni20AC exercises the AGL
    // uniXXXX convention. Literal and hex show-strings take the same map.
    val content = deflate(
      "BT /F1 12 Tf (caf\u0080 \u0081 \u0082\u0083) Tj ET BT <63616680> Tj ET")
    def diffPdf(fontObj: String, extra: String = ""): Array[Byte] = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n",
      fontObj,
      s"5 0 obj << /Filter /FlateDecode /Length ${content.length} >>\nstream\n", content,
      "\nendstream\nendobj\n",
      extra,
      "trailer << /Size 9 /Root 1 0 R >>\n%%EOF")
    val inline = diffPdf(
      "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding " +
        "<< /Differences [ 128 /eacute /bullet /uni20AC 131 /oe ] >> >> endobj\n")
    assert(SimplePdfTextExtractor.extract(inline) ==
      "café • €œ\ncafé\n")
    // /Encoding as an INDIRECT ref to an encoding dict object
    val indirect = diffPdf(
      "4 0 obj << /Type /Font /Subtype /Type1 /Encoding 6 0 R >> endobj\n",
      "6 0 obj << /Type /Encoding /Differences " +
        "[ 128 /eacute /bullet /uni20AC 131 /oe ] >> endobj\n")
    assert(SimplePdfTextExtractor.extract(indirect) ==
      "café • €œ\ncafé\n")
    // /Resources INHERITED from the Pages node (§7.7.3.4), font dict
    // ObjStm-compressed: the modern compact layout
    val (stm, n, first) = objStmPayload(Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> ("<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 4 0 R >> >> >>"),
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      4 -> ("<< /Type /Font /Subtype /Type1 /Encoding " +
        "<< /Differences [ 128 /eacute /bullet /uni20AC 131 /oe ] >> >>")))
    val inherited = pdfBytes(
      "%PDF-1.5\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${content.length} >>\nstream\n", content,
      "\nendstream\nendobj\n",
      s"8 0 obj << /Type /ObjStm /N $n /First $first /Filter /FlateDecode" +
        s" /Length ${stm.length} >>\nstream\n", stm,
      "\nendstream\nendobj\n",
      "trailer << /Size 9 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(inherited) ==
      "café • €œ\ncafé\n")
    // /Encoding /WinAnsiEncoding as a bare NAME: the CP1252 0x80-0x9F
    // block (curly quotes, dashes, Euro — where WinAnsi diverges from
    // Latin-1) decodes through the base table; octal escapes in the
    // content keep the fixture source ASCII
    val winContent = deflate("BT /F1 12 Tf (\\223quoted\\224 \\227 \\200) Tj ET")
    def winPdf(fontObj: String): Array[Byte] = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n",
      fontObj,
      s"5 0 obj << /Filter /FlateDecode /Length ${winContent.length} >>\nstream\n",
      winContent,
      "\nendstream\nendobj\n",
      "trailer << /Size 6 /Root 1 0 R >>\n%%EOF")
    val bare = winPdf("4 0 obj << /Type /Font /Subtype /TrueType " +
      "/Encoding /WinAnsiEncoding >> endobj\n")
    assert(SimplePdfTextExtractor.extract(bare) == "“quoted” — €\n")
    // /BaseEncoding /WinAnsiEncoding + /Differences override: the
    // Differences entry wins where both define a code, the base fills
    // the rest
    val overridden = winPdf("4 0 obj << /Type /Font /Subtype /TrueType /Encoding " +
      "<< /BaseEncoding /WinAnsiEncoding /Differences [ 128 /eacute ] >> >> endobj\n")
    assert(SimplePdfTextExtractor.extract(overridden) == "“quoted” — é\n")
    // /MacRomanEncoding: Mac Roman diverges from Latin-1 across the
    // whole high range — same bytes, entirely different glyphs
    // (D2/D3 curly quotes, D1 emdash, 80 Adieresis)
    val macContent = deflate("BT /F1 12 Tf (\\322mac\\323 \\321 \\200) Tj ET")
    val macPdf = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type1 /Encoding /MacRomanEncoding >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${macContent.length} >>\nstream\n",
      macContent,
      "\nendstream\nendobj\n",
      "trailer << /Size 6 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(macPdf) == "“mac” — Ä\n")
    // PDF 32000-1 Annex D divergences from the JDK's post-1998 Mac OS
    // Roman table: 0xDB is `currency` (U+00A4), NOT the euro the JDK
    // charset yields, and 0xF0 (Apple logo in Mac OS Roman) is
    // UNDEFINED in Annex D — it keeps the raw byte (Latin-1 baseline)
    val annexContent = deflate("BT /F1 12 Tf (\\333 \\360) Tj ET")
    val annexPdf = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type1 /Encoding /MacRomanEncoding >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${annexContent.length} >>\nstream\n",
      annexContent,
      "\nendstream\nendobj\n",
      "trailer << /Size 6 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(annexPdf) == "¤ ð\n")
  }

  test("PDF /Contents array split mid-text-object: Tf/BT state spans the pieces (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // a /Contents ARRAY is one logical content stream (§7.8.2) and
    // producers split anywhere on a token boundary — here piece A opens
    // the text object and selects the font, piece B shows the string;
    // per-stream scanning would lose both the BT and the active font
    val pieceA = deflate("BT /F1 12 Tf")
    val pieceB = deflate("(caf\\200) Tj ET")
    val pdf = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents [5 0 R 6 0 R] >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type1 /Encoding " +
        "<< /Differences [ 128 /eacute ] >> >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${pieceA.length} >>\nstream\n", pieceA,
      "\nendstream\nendobj\n",
      s"6 0 obj << /Filter /FlateDecode /Length ${pieceB.length} >>\nstream\n", pieceB,
      "\nendstream\nendobj\n",
      "trailer << /Size 7 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf) == "café\n")
  }

  test("PDF Tf-scoped ToUnicode: colliding codes decode correctly per font (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // two subset fonts both map code <0001>, differently — the NORM in
    // multi-font PDFs (every subset starts at code 1). The first string
    // shows before any Tf: merged-map fallback drops the colliding code
    // to raw bytes; the Tf-scoped strings decode per their own font.
    def cmapFor(dst: String): String =
      s"1 beginbfchar\n<0001> <$dst>\nendbfchar"
    val cmapA = cmapFor("0041") // -> A
    val cmapB = cmapFor("0042") // -> B
    val content = deflate(
      "BT <0001> Tj /F1 12 Tf <0001> Tj /F2 12 Tf <0001> Tj /F1 12 Tf <0001> Tj ET")
    val pdf = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R /F2 8 0 R >> >> /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >> endobj\n",
      "8 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 9 0 R >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${content.length} >>\nstream\n", content,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Length ${cmapA.length} >>\nstream\n", cmapA,
      "\nendstream\nendobj\n",
      s"9 0 obj << /Length ${cmapB.length} >>\nstream\n", cmapB,
      "\nendstream\nendobj\n",
      "trailer << /Size 10 /Root 1 0 R >>\n%%EOF")
    // pre-Tf: raw U+0000 U+0001 (collision-dropped); then A, B, A
    assert(SimplePdfTextExtractor.extract(pdf) == "\u0000\u0001ABA\n")
  }

  test("PDF freed-then-reused object number: generation picks the right body (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val genZero = deflate("BT (generation zero) Tj ET")
    val genOne = deflate("BT (generation one) Tj ET")
    // object number 5 exists at generation 0 AND (freed-then-reused,
    // rare but legal) generation 1, the gen-1 body LAST in byte order;
    // the /Contents 5 0 R ref must resolve the gen-0 body — last-match
    // resolution is keyed by (objNum, gen), not objNum alone
    val pdf = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${genZero.length} >>\nstream\n", genZero,
      "\nendstream\nendobj\n",
      s"5 1 obj << /Filter /FlateDecode /Length ${genOne.length} >>\nstream\n", genOne,
      "\nendstream\nendobj\n",
      "trailer << /Size 6 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf) == "generation zero\n")
  }

  test("PDF corrupt CMap / ObjStm header integers: skip, never throw (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // bfrange src codes of 8 hex digits (>= <80000000>): 3/4-byte
    // codespaces are legal and corrupt CMaps occur in crawled PDFs —
    // the entry must be SKIPPED (width guard), not blow up extract()
    // with NumberFormatException; valid entries in the same CMap decode
    val cmap =
      """1 beginbfchar
        |<0001> <0048>
        |endbfchar
        |2 beginbfrange
        |<80000000> <80000001> <0041>
        |<0002> <0003> <0069>
        |endbfrange""".stripMargin
    val content = deflate("BT <000100020003> Tj ET")
    val pdf = pdfBytes(
      "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${content.length} >>\nstream\n", content,
      "\nendstream\nendobj\n",
      s"7 0 obj << /Length ${cmap.length} >>\nstream\n", cmap,
      "\nendstream\nendobj\n",
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf) == "Hij\n")
    // an ObjStm whose header carries an offset integer past Int range
    // drops that pair (toIntOption) instead of crashing extraction
    val pg = deflate("BT (survives bad objstm) Tj ET")
    val bad = deflate("3 99999999999999999999\n<< /Type /Page >>")
    val pdf2 = pdfBytes(
      "%PDF-1.5\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n",
      s"5 0 obj << /Filter /FlateDecode /Length ${pg.length} >>\nstream\n", pg,
      "\nendstream\nendobj\n",
      s"8 0 obj << /Type /ObjStm /N 1 /First 23 /Filter /FlateDecode" +
        s" /Length ${bad.length} >>\nstream\n", bad,
      "\nendstream\nendobj\n",
      "trailer << /Size 9 /Root 1 0 R >>\n%%EOF")
    assert(SimplePdfTextExtractor.extract(pdf2) == "survives bad objstm\n")
  }

  test("Tar: USTAR roundtrip, padding, skipped non-file entries, truncation") {
    import graft.sources.Tar
    // sizes straddling block boundaries: 0, 1, 511, 512, 513 bytes
    val entries = Seq(0, 1, 511, 512, 513).map { n =>
      (s"m$n.bin", Array.tabulate[Byte](n)(i => ((i * 7 + n) & 0xFF).toByte))
    }
    val tarred = Tar.archive(entries)
    assert(tarred.length % 512 == 0)
    val back = Tar.members(tarred).toSeq
    assert(back.map(_._1) == entries.map(_._1))
    back.zip(entries).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
    // a directory entry (typeflag '5') between files is skipped, members
    // after it still parse (the walk advances by header+payload, not luck)
    val withDir = {
      val a = Tar.archive(Seq(("keep1.txt", "first".getBytes)))
        .dropRight(1024) // strip end-of-archive
      val dirHdr = Tar.archive(Seq(("adir/", Array.empty[Byte]))).dropRight(1024)
      dirHdr(156) = '5' // typeflag: directory
      // fix checksum after the typeflag edit
      java.util.Arrays.fill(dirHdr, 148, 156, ' '.toByte)
      var sum = 0L; dirHdr.take(512).foreach(b => sum += (b & 0xFF))
      val cs = java.lang.Long.toOctalString(sum)
      System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes, 0, dirHdr, 148, 6)
      dirHdr(154) = 0; dirHdr(155) = ' '
      val b = Tar.archive(Seq(("keep2.txt", "second".getBytes)))
      a ++ dirHdr ++ b
    }
    assert(Tar.members(withDir).map(_._1).toSeq == Seq("keep1.txt", "keep2.txt"))
    // truncated archive yields its complete members, no throw
    val truncated = tarred.take(512 + 512 + 512 + 256) // cuts inside m511's data
    val partial = Tar.members(truncated).toSeq
    assert(partial.map(_._1) == Seq("m0.bin", "m1.bin"))
    // readTarMembers: one row per member across shards, bytes intact
    val dir = Files.createTempDirectory("graft_tar")
    Files.write(dir.resolve("s0.tar"), Tar.archive(Seq(
      ("a.png", graft.operators.Multimodal.syntheticPng(10, 8, 1, 2, 3)))))
    Files.write(dir.resolve("s1.tar"), Tar.archive(Seq(
      ("b.png", graft.operators.Multimodal.syntheticPng(12, 6, 9, 8, 7)),
      ("c.txt", "not an image".getBytes))))
    val rows = graft.operators.Ingest.readTarMembers(spark, dir.toString)
    assert(rows.count() == 3)
    val decoded = graft.operators.Multimodal.withImageStats(rows, "content")
      .select($"member", $"image_stats").collect()
      .map(r => r.getString(0) -> Option(r.getStruct(1))).toMap
    assert(decoded("a.png").map(s => (s.getInt(1), s.getInt(2))).contains((10, 8)))
    assert(decoded("b.png").map(s => (s.getInt(1), s.getInt(2))).contains((12, 6)))
    assert(decoded("c.txt").isEmpty)
  }

  test("Tar: webdataset sample pairing is a zero-shuffle adjacency fold") {
    import graft.sources.Tar
    import graft.operators.Ingest
    val dir = Files.createTempDirectory("graft_wds")
    // contiguous members per sample (webdataset layout); 'b' lacks a
    // txt part, 'c' has no extension, 'd.seg.png' has a dotted ext
    Files.write(dir.resolve("s.tar"), Tar.archive(Seq(
      ("a.png", "PNGA".getBytes), ("a.txt", "capA".getBytes),
      ("b.png", "PNGB".getBytes),
      ("c", "RAW".getBytes),
      ("d.seg.png", "SEG".getBytes), ("d.txt", "capD".getBytes))))
    val samples = Ingest.pairTarMembers(Ingest.readTarMembers(spark, dir.toString))
    assert(!samples.queryExecution.executedPlan.toString.contains("Exchange"),
      "pairing must not shuffle")
    val rows = samples.select($"key", $"parts").collect()
      .map(r => r.getString(0) -> r.getMap[String, Array[Byte]](1)).toMap
    assert(rows.keySet == Set("a", "b", "c", "d"))
    assert(new String(rows("a")("png")) == "PNGA" && new String(rows("a")("txt")) == "capA")
    assert(rows("b").keySet == Set("png"))
    assert(new String(rows("c")("")) == "RAW") // extension-less member
    assert(new String(rows("d")("seg.png")) == "SEG" && rows("d").size == 2)
  }

  test("Tar: GNU 'L' and PAX 'x' long names override the next member's name") {
    import graft.sources.Tar
    // >100-char name roundtrips through the writer's GNU 'L' prefix member
    val longName = ("deep/dir/" * 12) + "sample-0000001.png" // 126 chars
    assert(longName.length > 100)
    val tarred = Tar.archive(Seq(
      (longName, "LONG".getBytes), ("short.txt", "S".getBytes)))
    val back = Tar.members(tarred).toSeq
    assert(back.map(_._1) == Seq(longName, "short.txt"))
    assert(new String(back.head._2) == "LONG")
    // PAX 'x' extended header: path record overrides the following member
    val paxName = "pax/override/" + ("x" * 110) + ".bin"
    val record = s"path=$paxName\n"
    // len counts the whole record including the length field and space
    val paxData = {
      var len = record.length + 3 // 2-digit guess + space; recompute below
      len = s"$len $record".length
      s"$len $record".getBytes("UTF-8")
    }
    val paxArchive = {
      val hdr = Tar.archive(Seq(("PaxHeader/x", paxData))).dropRight(1024)
      hdr(156) = 'x'
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L; hdr.take(512).foreach(b => sum += (b & 0xFF))
      val cs = java.lang.Long.toOctalString(sum)
      System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes, 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      hdr ++ Tar.archive(Seq(("placeholder.bin", "PAXED".getBytes)))
    }
    val paxBack = Tar.members(paxArchive).toSeq
    assert(paxBack.map(_._1) == Seq(paxName))
    assert(new String(paxBack.head._2) == "PAXED")
    // MALFORMED pax record whose declared length leaves a negative body
    // (bytes "2 "): the record is ignored cleanly — no
    // StringIndexOutOfBoundsException, following members still parse
    val badPax = {
      val hdr = Tar.archive(Seq(("PaxHeader/bad", "2 ".getBytes("US-ASCII")))).dropRight(1024)
      hdr(156) = 'x'
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L; hdr.take(512).foreach(b => sum += (b & 0xFF))
      val cs = java.lang.Long.toOctalString(sum)
      System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes, 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      hdr ++ Tar.archive(Seq(("after-bad-pax.bin", "OK".getBytes)))
    }
    val badBack = Tar.members(badPax).toSeq
    assert(badBack.map(_._1) == Seq("after-bad-pax.bin"))
    assert(new String(badBack.head._2) == "OK")
  }

  /** Golden ENCRYPTED one-page PDF (standard security handler, empty
    * user password, owner password "owner-secret"), built with
    * PdfCrypt's writer halves — the same math the verifier runs, so a
    * sign/endianness slip would cancel out; the REAL assertion is that
    * decrypt-then-defilter recovers the planted text through the full
    * extractor. Modes: "rc4-40" (V1/R2, unfiltered), "rc4-128" (V2/R3,
    * unfiltered), "aes" (V4/R4 /AESV2, FlateDecode'd — exercises
    * decrypt-then-inflate), "aes256r5"/"aes256r6" (V5 /AESV3,
    * FlateDecode'd — R5's single-SHA-256 and R6's algorithm-2.B
    * iterated hash, file key unwrapped from /UE). corruptU simulates a
    * NON-empty user password: /U stops verifying, so no decryption is
    * attempted. `userPwd` writes the document under a REAL (non-empty)
    * user password — /O, the file key, and the V5 /U//UE hashes all
    * derive from it, so only a caller supplying that password opens
    * the document. */
  private def encryptedPdf(mode: String, corruptU: Boolean = false,
      userPwd: Option[String] = None): Array[Byte] = {
    import graft.sources.PdfCrypt
    val content = "BT /F1 12 Tf 72 712 Td (Sealed text layer) Tj ET"
    val id0: Array[Byte] = (1 to 16).map(_.toByte).toArray
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02X").mkString
    val p = -44
    val head =
      "%PDF-1.6\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 5 0 R >> endobj\n" +
      "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n"
    def trailerPart =
      s"trailer << /Size 7 /Root 1 0 R /Encrypt 6 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF"
    if (mode.startsWith("aes256")) {
      val r = if (mode == "aes256r5") 5 else 6
      val fileKey = Array.tabulate[Byte](32)(i => ((i * 89 + 17) & 0xFF).toByte)
      val vsalt = Array.tabulate[Byte](8)(i => (i + 1).toByte)
      val ksalt = Array.tabulate[Byte](8)(i => (i + 101).toByte)
      val (u0, ue) = PdfCrypt.computeUV5(fileKey, vsalt, ksalt, r,
        userPwd.map(_.getBytes("UTF-8")).getOrElse(Array.emptyByteArray))
      val u = if (corruptU) u0.map(b => (b ^ 0x5A).toByte) else u0
      // real owner route: /O//OE bound to /U under "owner-secret"
      val (o, oe) = PdfCrypt.computeOV5(fileKey,
        Array.tabulate[Byte](8)(i => (i + 51).toByte),
        Array.tabulate[Byte](8)(i => (i + 151).toByte), r,
        "owner-secret".getBytes("UTF-8"), u0)
      val encContent = PdfCrypt.encryptAes(fileKey,
        Array.tabulate(16)(i => (i * 11 + 5).toByte), deflate(content))
      pdfBytes(
        head +
        s"5 0 obj << /Filter /FlateDecode /Length ${encContent.length} >>\nstream\n",
        encContent,
        "\nendstream\nendobj\n" +
        s"6 0 obj << /Filter /Standard /V 5 /R $r /Length 256 " +
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
        "/StmF /StdCF /StrF /StdCF " +
        s"/O <${hex(o)}> /U <${hex(u)}> /OE <${hex(oe)}> /UE <${hex(ue)}> " +
        s"/P $p >> endobj\n" + trailerPart)
    } else {
      val (v, r, keyLen, aes) = mode match {
        case "rc4-40" => (1, 2, 5, false)
        case "rc4-128" => (2, 3, 16, false)
        // "aesv2-rc4": dict DECLARES /AESV2 but the payload was RC4'd —
        // a writer-bug mismatch the reader must degrade on, not throw
        case "aes" | "aesv2-rc4" => (4, 4, 16, true)
      }
      val pw = userPwd.map(_.getBytes("ISO-8859-1")).getOrElse(Array.emptyByteArray)
      val o = PdfCrypt.computeO("owner-secret".getBytes("ISO-8859-1"), r, keyLen, pw)
      val key = PdfCrypt.fileKey(pw, o, p, id0, r, keyLen, encryptMetadata = true)
      val u0 = PdfCrypt.computeU(key, id0, r)
      val u = if (corruptU) u0.map(b => (b ^ 0x5A).toByte) else u0
      val okey = PdfCrypt.objectKey(key, 5, 0, aes)
      val encContent =
        if (mode == "aesv2-rc4")
          PdfCrypt.rc4(PdfCrypt.objectKey(key, 5, 0, false), deflate(content))
        else if (aes) PdfCrypt.encryptAes(okey,
          Array.tabulate(16)(i => (i * 7 + 3).toByte), deflate(content))
        else PdfCrypt.rc4(okey, content.getBytes("ISO-8859-1"))
      val cf =
        if (aes) "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
          "/StmF /StdCF /StrF /StdCF "
        else ""
      val filter = if (aes) "/Filter /FlateDecode " else ""
      pdfBytes(
        head +
        s"5 0 obj << $filter/Length ${encContent.length} >>\nstream\n",
        encContent,
        "\nendstream\nendobj\n" +
        s"6 0 obj << /Filter /Standard /V $v /R $r /Length ${keyLen * 8} $cf" +
        s"/O <${hex(o)}> /U <${hex(u)}> /P $p >> endobj\n" + trailerPart)
    }
  }

  test("Type3 font with /Encoding /Differences decodes via glyph names like any simple font (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // Type3 glyphs are content streams; the TEXT mapping still rides
    // the /Encoding /Differences array (§9.6.5), so codes 1..3 with
    // AGL names must decode — no Subtype gate may block it
    val content = "BT /F1 12 Tf <010203> Tj ET"
    val pdf = (s"""%PDF-1.4
       |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
       |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
       |3 0 obj << /Type /Page /Parent 2 0 R
       |  /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj
       |4 0 obj << /Type /Font /Subtype /Type3 /FontBBox [0 0 10 10]
       |  /FontMatrix [0.001 0 0 0.001 0 0] /CharProcs 7 0 R
       |  /Encoding << /Type /Encoding /Differences [1 /y /e /s] >>
       |  /FirstChar 1 /LastChar 3 /Widths [10 10 10] >> endobj
       |5 0 obj << /Length ${content.length} >>
       |stream
       |$content
       |endstream
       |endobj
       |trailer << /Size 8 /Root 1 0 R >>
       |%%EOF""").stripMargin.getBytes("ISO-8859-1")
    assert(SimplePdfTextExtractor.extract(pdf) == "yes\n")
  }

  /** Minimal structurally-real TrueType font: sfnt header + one 'cmap'
    * table with a single (3,1) format-4 subtable, one single-char
    * segment per mapping (idRangeOffset 0, idDelta = gid - char). */
  private def miniTtf(charToGid: Seq[(Int, Int)]): Array[Byte] = {
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val segs = charToGid.sortBy(_._1)
    val n = segs.length + 1 // + the required 0xFFFF terminator segment
    val sub = new java.io.ByteArrayOutputStream()
    Seq(4, 14 + 2 + 8 * n, 0, 2 * n, 0, 0, 0).foreach(v => sub.write(u16(v)))
    (segs.map(_._1) :+ 0xffff).foreach(v => sub.write(u16(v))) // endCode
    sub.write(u16(0)) // reservedPad
    (segs.map(_._1) :+ 0xffff).foreach(v => sub.write(u16(v))) // startCode
    (segs.map { case (c, g) => (g - c) & 0xffff } :+ 1)
      .foreach(v => sub.write(u16(v))) // idDelta
    (0 until n).foreach(_ => sub.write(u16(0))) // idRangeOffset
    val cmap = new java.io.ByteArrayOutputStream()
    cmap.write(u16(0)); cmap.write(u16(1)) // version, one subtable
    cmap.write(u16(3)); cmap.write(u16(1)); cmap.write(u32(12L))
    cmap.write(sub.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    out.write(u32(0x00010000L)); out.write(u16(1)) // sfnt, 1 table
    out.write(u16(0)); out.write(u16(0)); out.write(u16(0))
    out.write("cmap".getBytes("ISO-8859-1")); out.write(u32(0L))
    out.write(u32(28L)); out.write(u32(cmap.size().toLong))
    out.write(cmap.toByteArray)
    out.toByteArray
  }

  test("Identity-H CID font WITHOUT /ToUnicode decodes via the embedded TrueType cmap (A2)") {
    import graft.sources.{SimplePdfTextExtractor, TrueTypeCmap}
    val ttf = miniTtf(Seq(0x48 -> 5, 0x69 -> 6, 0x21 -> 7)) // H i !
    // unit probe: inversion exact; truncation/garbage never throw
    assert(TrueTypeCmap.gidToUnicode(ttf) == Map(5 -> 0x48, 6 -> 0x69, 7 -> 0x21))
    (0 until ttf.length).foreach(k => TrueTypeCmap.gidToUnicode(ttf.take(k)))
    assert(TrueTypeCmap.gidToUnicode(null) == Map.empty)
    assert(TrueTypeCmap.gidToUnicode(Array.fill(64)(0x7f.toByte)) == Map.empty)
    def pdf(cidExtras: String, showHex: String, extra: String = ""): Array[Byte] = {
      val content = s"BT /F1 12 Tf <$showHex> Tj ET"
      pdfBytes(
        """%PDF-1.6
          |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
          |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
          |3 0 obj << /Type /Page /Parent 2 0 R
          |  /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj
          |4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Embedded
          |  /Encoding /Identity-H /DescendantFonts [6 0 R] >> endobj
          |""".stripMargin,
        s"5 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n",
        s"6 0 obj << /Type /Font /Subtype /CIDFontType2 $cidExtras" +
          " /FontDescriptor 7 0 R >> endobj\n",
        "7 0 obj << /Type /FontDescriptor /FontName /Embedded" +
          " /FontFile2 8 0 R >> endobj\n",
        s"8 0 obj << /Length ${ttf.length} >>\nstream\n", ttf,
        "\nendstream\nendobj\n", extra,
        "trailer << /Size 10 /Root 1 0 R >>\n%%EOF")
    }
    // implicit identity CIDToGIDMap: CID == GID
    assert(SimplePdfTextExtractor.extract(pdf("", "000500060007")) == "Hi!\n")
    // explicit /CIDToGIDMap /Identity
    assert(SimplePdfTextExtractor.extract(
      pdf("/CIDToGIDMap /Identity", "000500060007")) == "Hi!\n")
    // packed u16 STREAM CIDToGIDMap: CIDs 1,2,3 -> GIDs 5,6,7
    val gidMap = Array[Byte](0, 0, 0, 5, 0, 6, 0, 7)
    val streamed = pdf("/CIDToGIDMap 9 0 R", "000100020003",
      extra = new String(pdfBytes(
        s"9 0 obj << /Length ${gidMap.length} >>\nstream\n", gidMap,
        "\nendstream\nendobj\n"), "ISO-8859-1"))
    assert(SimplePdfTextExtractor.extract(streamed) == "Hi!\n")
    // a string with an unmapped CID falls back wholesale (the decoder's
    // all-or-nothing per-string CMap contract) — it never throws, and a
    // fully-mapped string still decodes
    SimplePdfTextExtractor.extract(pdf("", "00050999")): Unit
    assert(SimplePdfTextExtractor.extract(pdf("", "0005")) == "H\n")
  }

  test("crafted format-12/format-4 cmap coverage tables terminate immediately, not in hours (A2 robustness)") {
    import graft.sources.TrueTypeCmap
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    // format-12 subtable: one group entirely above U+10FFFF with end near
    // 0xFFFFFFFF (passes start>=0 / end>=start / gid0>=0 yet adds no
    // entries — pre-fix this spun ~4.3e9 no-op iterations), one group
    // straddling the Unicode ceiling, and one valid group.
    val sub12 = new java.io.ByteArrayOutputStream()
    sub12.write(u16(12)); sub12.write(u16(0))
    sub12.write(u32(16L + 12L * 3)); sub12.write(u32(0L)); sub12.write(u32(3L))
    Seq((0x110000L, 0xfffffff0L, 1L), (0x10fffeL, 0xfffffff0L, 9L),
      (0x41L, 0x43L, 5L)).foreach { case (s, e, g) =>
      sub12.write(u32(s)); sub12.write(u32(e)); sub12.write(u32(g))
    }
    val cmap = new java.io.ByteArrayOutputStream()
    cmap.write(u16(0)); cmap.write(u16(1))
    cmap.write(u16(3)); cmap.write(u16(10)); cmap.write(u32(12L))
    cmap.write(sub12.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    out.write(u32(0x00010000L)); out.write(u16(1))
    out.write(u16(0)); out.write(u16(0)); out.write(u16(0))
    out.write("cmap".getBytes("ISO-8859-1")); out.write(u32(0L))
    out.write(u32(28L)); out.write(u32(cmap.size().toLong))
    out.write(cmap.toByteArray)
    val t0 = System.nanoTime()
    val m = TrueTypeCmap.gidToUnicode(out.toByteArray)
    assert((System.nanoTime() - t0) < 5e9, "malformed coverage must not spin")
    // valid group decoded; straddling group clamped to <= U+10FFFF
    assert(m(5) == 0x41 && m(6) == 0x42 && m(7) == 0x43)
    assert(m(9) == 0x10fffe && m(10) == 0x10ffff && !m.contains(11))
  }

  test("predefined Unicode CMap encodings (/UniJIS-UCS2-H family) decode show text as UTF-16BE (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // こんにちは as UTF-16BE hex + a surrogate pair (U+1F600, UTF16
    // variant) — no embedded ToUnicode anywhere, the CJK-producer shape
    def pdf(enc: String, hexText: String): Array[Byte] = {
      val content = s"BT /F1 12 Tf <$hexText> Tj ET"
      (s"""%PDF-1.6
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R
         |  /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj
         |4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Gothic
         |  /Encoding /$enc /DescendantFonts [6 0 R] >> endobj
         |5 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |trailer << /Size 7 /Root 1 0 R >>
         |%%EOF""").stripMargin.getBytes("ISO-8859-1")
    }
    assert(SimplePdfTextExtractor.extract(pdf("UniJIS-UCS2-H", "30533093306B3061306F"))
      == "こんにちは\n")
    assert(SimplePdfTextExtractor.extract(pdf("UniGB-UCS2-V", "4F60597D"))
      == "你好\n")
    // UTF16 variant carries surrogate pairs
    assert(SimplePdfTextExtractor.extract(pdf("UniJIS-UTF16-H", "D83DDE00"))
      == "😀\n")
    // digit-bearing stems are current Adobe-Japan1 producer output
    assert(SimplePdfTextExtractor.extract(pdf("UniJIS2004-UTF16-H", "30533093306B3061306F"))
      == "こんにちは\n")
  }

  test("NATIONAL-encoding predefined CMaps decode via the JDK charsets (90ms-RKSJ / GBK-EUC / ETen-B5 / KSCms-UHC) (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // same fixture shape as the Uni* test, but the show-string bytes
    // are the NATIONAL encoding's — the legacy CJK-producer shape
    // (pre-Acrobat-5 era and plenty of current cheap generators).
    // Source bytes decoded with the JDK charset skip src->CID->Unicode,
    // which is text-identical on the national repertoire.
    def pdf(enc: String, bytes: Array[Byte]): Array[Byte] = {
      val hexText = bytes.map(b => f"${b & 0xFF}%02X").mkString
      val content = s"BT /F1 12 Tf <$hexText> Tj ET"
      (s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R
         |  /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj
         |4 0 obj << /Type /Font /Subtype /Type0 /BaseFont /CJK
         |  /Encoding /$enc /DescendantFonts [6 0 R] >> endobj
         |5 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |trailer << /Size 7 /Root 1 0 R >>
         |%%EOF""").stripMargin.getBytes("ISO-8859-1")
    }
    assert(SimplePdfTextExtractor.extract(
      pdf("90ms-RKSJ-H", "こんにちは".getBytes("windows-31j"))) == "こんにちは\n")
    assert(SimplePdfTextExtractor.extract(
      pdf("GBK-EUC-H", "你好世界".getBytes("GBK"))) == "你好世界\n")
    assert(SimplePdfTextExtractor.extract(
      pdf("ETen-B5-V", "你好".getBytes("Big5"))) == "你好\n")
    assert(SimplePdfTextExtractor.extract(
      pdf("KSCms-UHC-H", "안녕하세요".getBytes("MS949"))) == "안녕하세요\n")
    // mixed single/double-byte runs ride the charset's own state machine
    assert(SimplePdfTextExtractor.extract(
      pdf("90ms-RKSJ-H", "abcこんにちはxyz".getBytes("windows-31j"))) == "abcこんにちはxyz\n")
    // Identity-H stays out: raw CIDs carry no text mapping — the codes
    // keep the raw fallback (garbage in, garbage out, never a throw)
    val idH = SimplePdfTextExtractor.extract(
      pdf("Identity-H", Array(0x01.toByte, 0x02.toByte)))
    assert(idH != null) // no throw is the contract
  }

  test("ENCRYPTED PDFs with an empty user password decrypt: RC4-40, RC4-128, AES-128 (A2)") {
    import graft.sources.SimplePdfTextExtractor
    assert(SimplePdfTextExtractor.extract(encryptedPdf("rc4-40")) == "Sealed text layer\n")
    assert(SimplePdfTextExtractor.extract(encryptedPdf("rc4-128")) == "Sealed text layer\n")
    assert(SimplePdfTextExtractor.extract(encryptedPdf("aes")) == "Sealed text layer\n")
  }

  test("ENCRYPTED AES-256 PDFs (V5, R5 legacy and R6 ISO) decrypt via the /UE-unwrapped file key (A2)") {
    import graft.sources.SimplePdfTextExtractor
    assert(SimplePdfTextExtractor.extract(encryptedPdf("aes256r5")) == "Sealed text layer\n")
    assert(SimplePdfTextExtractor.extract(encryptedPdf("aes256r6")) == "Sealed text layer\n")
    // wrong (non-empty) user password: the 2.A hash stops matching
    assert(SimplePdfTextExtractor.extract(encryptedPdf("aes256r6", corruptU = true)) == "")
  }

  test("ENCRYPTED PDFs with a REAL user password decrypt when the caller supplies it: RC4-128 + AES-256 R6 (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val withPw = SimplePdfTextExtractor.withPassword("hunter2")
    for (mode <- Seq("rc4-128", "aes256r6")) {
      val locked = encryptedPdf(mode, userPwd = Some("hunter2"))
      // no password: /U verification fails for the empty candidate ->
      // the no-text route, the pre-existing degrade — never a throw
      assert(SimplePdfTextExtractor.extract(locked) == "", mode)
      // WRONG password: both candidates (wrong, empty) fail -> no text
      assert(SimplePdfTextExtractor.withPassword("wrong-password")
        .extract(locked) == "", mode)
      // right password: algorithm 2 (V<5) / 2.A-2.B (V5) verify and
      // the full decrypt-then-defilter pipeline recovers the text
      assert(withPw.extract(locked) == "Sealed text layer\n", mode)
    }
    // a password supplied for an EMPTY-password document is harmless:
    // the wrong candidate fails, the empty fallback opens it (viewer
    // semantics — prompting never breaks unprotected docs)
    assert(withPw.extract(encryptedPdf("aes")) == "Sealed text layer\n")
    // ...and for a plain unencrypted document it is simply unused
    assert(withPw.extract(goldenPdf("BT (Plain text) Tj ET",
      filtered = false)) == "Plain text\n")
  }

  test("OWNER password opens user-locked documents: algorithm 7 (V<5) + the 2.A owner half (V5) (A2)") {
    import graft.sources.SimplePdfTextExtractor
    val asOwner = SimplePdfTextExtractor.withPassword("owner-secret")
    // every mode, locked under user password "hunter2" the caller does
    // NOT know: the owner password must open it viewer-style — user
    // route fails, algorithm 7 peels /O back to the padded user
    // password (V<5) / the 2.A owner half unwraps /OE (V5)
    for (mode <- Seq("rc4-40", "rc4-128", "aes", "aes256r5", "aes256r6")) {
      val locked = encryptedPdf(mode, userPwd = Some("hunter2"))
      assert(SimplePdfTextExtractor.extract(locked) == "", mode)
      assert(asOwner.extract(locked) == "Sealed text layer\n", mode)
    }
    // a wrong owner password fails both routes -> no-text degrade
    assert(SimplePdfTextExtractor.withPassword("not-the-owner")
      .extract(encryptedPdf("rc4-128", userPwd = Some("hunter2"))) == "")
    assert(SimplePdfTextExtractor.withPassword("not-the-owner")
      .extract(encryptedPdf("aes256r6", userPwd = Some("hunter2"))) == "")
  }

  test("adversarial encrypted fixtures degrade to no text, never throw (A2)") {
    import graft.sources.SimplePdfTextExtractor
    def mangle(pdf: Array[Byte], re: String, replacement: String): Array[Byte] = {
      val s = new String(pdf, "ISO-8859-1")
      val out = re.r.replaceAllIn(s, replacement)
      assert(out != s, s"fixture surgery '$re' must hit")
      out.getBytes("ISO-8859-1")
    }
    // 1. truncated /UE: too short to unwrap a 32-byte file key —
    //    fileKeyV5 must reject, extraction degrades to no text
    val truncUe = mangle(encryptedPdf("aes256r6"),
      "/UE <[0-9A-Fa-f]+>", "/UE <00112233445566778899>")
    assert(SimplePdfTextExtractor.extract(truncUe) == "")
    // 2. R6 wrong VALIDATION salt: /U = hash(32) || vsalt(8) || ksalt(8);
    //    flipping a vsalt nibble (hex chars 64..79) breaks the 2.B hash
    //    equation without touching the stored hash
    val r6 = encryptedPdf("aes256r6")
    val s6 = new String(r6, "ISO-8859-1")
    val uHex = "/U <([0-9A-Fa-f]+)>".r.findFirstMatchIn(s6).get.group(1)
    assert(uHex.length == 96)
    val flipped = uHex.substring(0, 64) +
      (if (uHex.charAt(64) == '0') '1' else '0') + uHex.substring(65)
    val badSalt = mangle(r6, java.util.regex.Pattern.quote(s"/U <$uHex>"),
      java.util.regex.Matcher.quoteReplacement(s"/U <$flipped>"))
    assert(SimplePdfTextExtractor.extract(badSalt) == "")
    // 3. dict declares /AESV2 but the payload bytes were RC4'd (writer
    //    bug): AES decrypt yields garbage or rejects; inflate then
    //    fails — no text, no exception
    assert(SimplePdfTextExtractor.extract(encryptedPdf("aesv2-rc4")) == "")
    // 4. the same corruptions must also ride the OCR-fallback route
    //    without throwing (the ingest path's contract)
    import graft.sources.{FallbackExtractor, NoopOcrExtractor}
    val routed = new FallbackExtractor(SimplePdfTextExtractor, NoopOcrExtractor)
    assert(routed.extract(truncUe) == "" && routed.extract(badSalt) == "" &&
      routed.extract(encryptedPdf("aesv2-rc4")) == "")
  }

  test("stream-payload /Encrypt decoy after the real trailer cannot override the pointer (A2)") {
    import graft.sources.SimplePdfTextExtractor
    // incremental-update-style bytes appended AFTER the real trailer,
    // whose stream payload happens to contain `/Encrypt 9 0 R`: with a
    // whole-file last-match-wins scan the decoy would override the true
    // trailer pointer (object 9 does not exist, so decryption would
    // silently degrade to no text layer); the anchored scan must keep
    // resolving the trailer dict's /Encrypt 6 0 R
    val base = encryptedPdf("rc4-40")
    val decoyBody = "xQ91 zz /Encrypt 9 0 R qT trailing payload noise bytes"
    val decoy = s"\n7 0 obj << /Length ${decoyBody.length} >>\nstream\n" +
      decoyBody + "\nendstream\nendobj\n"
    assert(SimplePdfTextExtractor.extract(base ++ decoy.getBytes("ISO-8859-1"))
      == "Sealed text layer\n")
    // a decoy `startxref` whose offset lands on payload bytes with a
    // nearby `<<` but NO object header is equally inert (the anchored
    // xref-stream region requires `N G obj` right at the offset)
    val noise = "garbage << /Encrypt 9 0 R >> tail"
    val withNoise = base ++ s"\n8 0 obj << /Length ${noise.length} >>\nstream\n$noise\nendstream\nendobj\n".getBytes("ISO-8859-1")
    val off = new String(withNoise, "ISO-8859-1").indexOf("garbage <<")
    val decoyXref = withNoise ++ s"\nstartxref\n$off\n%%EOF".getBytes("ISO-8859-1")
    assert(SimplePdfTextExtractor.extract(decoyXref) == "Sealed text layer\n")
  }

  test("ENCRYPTED PDF with a non-empty user password skips cleanly to the OCR route (A3)") {
    import graft.sources.{FallbackExtractor, NoopOcrExtractor, SimplePdfTextExtractor, Utf8TextExtractor}
    // corrupted /U == wrong (non-empty) user password: no key verifies,
    // the flate payload stays ciphertext, inflate rejects it -> no text
    val locked = encryptedPdf("aes", corruptU = true)
    assert(SimplePdfTextExtractor.extract(locked) == "")
    // and the fallback router sends it down the same path as scanned
    // docs (Noop OCR -> ""), never throwing
    val routed = new FallbackExtractor(SimplePdfTextExtractor, NoopOcrExtractor)
      .extract(locked)
    assert(routed == "")
  }

  test("PDF literal/hex show-strings: escape round-trip recovers arbitrary bytes (property)") {
    import graft.sources.SimplePdfTextExtractor
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the string parsers eat untrusted crawled bytes; round-trip every
    // byte value through a spec-conforming escaping writer (octal
    // escapes for controls, \\ \( \) for specials, raw Latin-1
    // otherwise) and through hex encoding with interleaved whitespace
    def samples[T](gen: Gen[T], n: Int): Seq[T] =
      (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(0xBEEFL + i)))
    val byteStr = Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toChar).mkString)
    samples(byteStr, 60).foreach { raw0 =>
      val raw = "x" + raw0 // never BOM-tagged -> Latin-1 identity decode
      val lit = raw.flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c if c < ' ' => f"\\${c.toInt}%03o"
        case c => c.toString
      }
      val hex = raw.map(c => f"${c.toInt}%02X").mkString(" ")
      val pdf = goldenPdf(s"BT ($lit) Tj <$hex> Tj ET", filtered = false)
      val got = SimplePdfTextExtractor.extract(pdf)
      assert(got == raw + raw + "\n",
        s"round-trip diverged for ${raw.map(_.toInt).mkString(",")}")
    }
  }

  test("PERMISSIVE json keeps corrupt rows in _corrupt_record; FAILFAST throws") {
    val dir = Files.createTempDirectory("graft_json")
    Files.write(dir.resolve("a.json"), java.util.Arrays.asList(
      """{"id": 1, "v": 1.5}""",
      """{"id": 2, "v": 2.5}""",
      """{"id": oops not json""",
      """{"id": 3, "v": 3.5}"""))
    val schema = "id LONG, v DOUBLE, _corrupt_record STRING"
    val df = spark.read.schema(schema).json(dir.toString).cache()
    assert(df.count() == 4)
    assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(df.filter($"id".isNotNull).count() == 3)
    df.unpersist()

    intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG, v DOUBLE")
        .option("mode", "FAILFAST").json(dir.toString).collect()
    }
  }

  // ---- WARC container (sources/Warc.scala) ----

  private def warcFixture(gz: Boolean): Array[Byte] = {
    import graft.sources.Warc
    val info = (Seq("WARC-Type" -> "warcinfo",
      "Content-Type" -> "application/warc-fields"),
      "software: test\r\n".getBytes("UTF-8"))
    val req = (Seq("WARC-Type" -> "request",
      "WARC-Target-URI" -> "http://x/1",
      "Content-Type" -> "application/http; msgtype=request"),
      "GET /1 HTTP/1.1\r\n\r\n".getBytes("UTF-8"))
    val resp1 = Warc.httpResponseRecord("http://x/1", "hello world".getBytes("UTF-8"))
    val resp2 = Warc.httpResponseRecord("http://x/2",
      "second épayload".getBytes("UTF-8"))
    Warc.archive(Seq(info, req, resp1, resp2), gzipPerRecord = gz)
  }

  test("WARC roundtrip: plain and per-record-gzip shards parse identically") {
    import graft.sources.Warc
    for (gz <- Seq(false, true)) {
      val recs = Warc.records(warcFixture(gz)).toSeq
      assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response", "response"))
      assert(recs(2).targetUri == "http://x/1")
      assert(recs.forall(_.recordId.nonEmpty)) // defaulted deterministically
      assert(recs.forall(_.date.nonEmpty))
      assert(new String(Warc.httpBody(recs(2).block), "UTF-8") == "hello world")
      assert(new String(Warc.httpBody(recs(3).block), "UTF-8") == "second épayload")
      // httpBody peels only RESPONSE envelopes ("HTTP/..."); a request
      // block ("GET ...") passes through whole
      assert(new String(Warc.httpBody(recs(1).block), "UTF-8") ==
        "GET /1 HTTP/1.1\r\n\r\n")
    }
  }

  test("WARC truncation: a cut shard yields its complete prefix, never throws") {
    import graft.sources.Warc
    val full = warcFixture(gz = false)
    val fullRecs = Warc.records(full).toSeq
    // cut mid-way through the last record's block
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 8)
    val recs = Warc.records(cut).toSeq
    assert(recs.length == fullRecs.length - 1)
    assert(recs.map(_.targetUri) == fullRecs.dropRight(1).map(_.targetUri))
    // gzip variant: truncated tail member inflates to a prefix; parse
    // still ends cleanly with the complete records
    val gzFull = warcFixture(gz = true)
    // cut into the last member's DEFLATE data (10 bytes would only lose
    // the 8-byte trailer after full inflation)
    val gzCut = java.util.Arrays.copyOfRange(gzFull, 0, gzFull.length - 80)
    val gzRecs = Warc.records(gzCut).toSeq
    assert(gzRecs.length < fullRecs.length && gzRecs.nonEmpty)
    assert(gzRecs.map(_.warcType) == fullRecs.take(gzRecs.length).map(_.warcType))
  }

  test("WARC header names are case-insensitive; garbage between records stops cleanly") {
    import graft.sources.Warc
    val body = "abc".getBytes("UTF-8")
    val manual = ("WARC/1.1\r\nwarc-type: RESPONSE\r\nWARC-TARGET-URI: http://y\r\n" +
      s"content-length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++ body ++
      "\r\n\r\nnot a warc version line".getBytes("UTF-8")
    val recs = Warc.records(manual).toSeq
    assert(recs.length == 1)
    assert(recs.head.warcType == "RESPONSE") // value case preserved
    assert(recs.head.targetUri == "http://y")
    assert(new String(recs.head.block, "UTF-8") == "abc")
  }

  test("httpBody: non-HTTP blocks pass through; headers-without-end is bare payload") {
    import graft.sources.Warc
    val bare = "just bytes".getBytes("UTF-8")
    assert(Warc.httpBody(bare).sameElements(bare))
    val unterminated = "HTTP/1.1 200 OK\r\nContent-Type: text/plain".getBytes("UTF-8")
    assert(Warc.httpBody(unterminated).sameElements(unterminated))
  }

  // ---- HTML -> text (sources/Html.scala) ----

  test("Html.links: three quoting forms, entity decode, decoys skipped, relative resolution, garbage-safe") {
    import graft.sources.Html
    val h = """<html><body>
      |<a href="https://a.com/p?x=1&amp;y=2">d</a>
      |<a href='https://b.com/q'>s</a>
      |<a href=https://c.com/r>u</a>
      |<A HREF="https://d.com/UP">case</A>
      |<a href="#frag">f</a><a href="javascript:void(0)">j</a>
      |<a href="mailto:x@y.z">m</a><a href="data:text/plain,hi">dd</a>
      |<a name="anchor-only">n</a>
      |<a href="/abs/path?k=v">rel1</a>
      |<a href="sub/page.html">rel2</a>
      |<a href="//e.com/proto">rel3</a>
      |</body></html>""".stripMargin
    val got = Html.links(h, "https://base.org/dir/index.html")
    assert(got == Seq(
      "https://a.com/p?x=1&y=2",        // &amp; decoded
      "https://b.com/q",
      "https://c.com/r",
      "https://d.com/UP",
      "https://base.org/abs/path?k=v",  // root-relative
      "https://base.org/dir/sub/page.html", // path-relative
      "https://e.com/proto"))           // scheme-relative
    // no base: relative links drop, absolute survive
    assert(Html.links("<a href=\"/x\">r</a><a href=\"https://ok.io/\">o</a>")
      == Seq("https://ok.io/"))
    // truncated tag, malformed URI, null: never throw
    assert(Html.links("<a href=\"https://t.co/x\"") == Seq.empty)
    assert(Html.links("<a href=\"ht tp://bad\">x</a>", "https://b.se/") == Seq.empty)
    assert(Html.links(null) == Seq.empty)
    // href in a non-anchor tag is ignored; xhref never matches
    assert(Html.links("<link href=\"https://css.io/a\"/><a xhref=https://no.pe>z</a>")
      == Seq.empty)
  }

  test("Html.toText: tags strip, block tags break lines, inline tags do not") {
    import graft.sources.Html
    assert(Html.toText("<p>one</p><p>two</p>") == "one\ntwo")
    assert(Html.toText("a<b>bold</b>c <i>i</i>") == "aboldc i")
    assert(Html.toText("<ul><li>x</li><li>y</li></ul>") == "x\ny")
    assert(Html.toText("<br/>line1<br>line2") == "line1\nline2")
  }

  test("Html.toText: script/style drop with content, incl. close-tag decoys inside") {
    import graft.sources.Html
    assert(Html.toText(
      "<script>if (a < b) { s = '</div>'; }</script>after") == "after")
    assert(Html.toText("<style>p { color: red }</style>text") == "text")
    // unterminated script drops the rest (documented)
    assert(Html.toText("before<script>var x = 1;") == "before")
    // a SELF-CLOSED or CLOSING script tag is not a content-skipping open
    assert(Html.toText("a</script>b") == "ab")
  }

  test("Html.toText: comments, doctype, quoted '>' in attributes, literal '<'") {
    import graft.sources.Html
    assert(Html.toText("<!DOCTYPE html>x<!-- note -->y") == "xy")
    assert(Html.toText("a<!-- unterminated") == "a")
    assert(Html.toText("""<p data-x="a>b">inside</p>""") == "inside")
    assert(Html.toText("3 < 5 and 7 <	9") == "3 < 5 and 7 < 9")
    // a tag that never closes truncates there
    assert(Html.toText("keep<div class=") == "keep")
  }

  test("Html.toText: entity decode — named, numeric, malformed-literal, nbsp") {
    import graft.sources.Html
    assert(Html.toText("&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos;") ==
      "<tag> & \"q\" 'a'")
    assert(Html.toText("&#65;&#x42;&#x63;") == "ABc")
    assert(Html.toText("a&nbsp;b") == "a b")
    assert(Html.toText("AT&T &unknown; &#xZZ; &#999999999;") ==
      "AT&T &unknown; &#xZZ; &#999999999;")
    // escaped markup does NOT become markup
    assert(Html.toText("&lt;script&gt;alert(1)&lt;/script&gt;") ==
      "<script>alert(1)</script>")
  }

  test("Html.toText: whitespace collapses in text; only block tags break lines") {
    import graft.sources.Html
    assert(Html.toText("a\n\n  b\tc") == "a b c")
    assert(Html.toText("  <p>  padded   text  </p>  ") == "padded text")
    assert(Html.toText("") == "")
    assert(Html.toText(null) == "")
    assert(Html.toText("<div></div><p>   </p>") == "") // empty lines drop
  }

  test("WARC + HTML end-to-end: response payloads extract through Ingest.readWarcRecords") {
    import graft.sources.{Html, Warc}
    val dir = Files.createTempDirectory("graft_warc")
    val pages = Seq(
      ("http://s/a", "<html><head><title>A</title></head><body><p>alpha &amp; beta</p></body></html>"),
      ("http://s/b", "<html><body><h1>B</h1><p>gamma</p></body></html>"))
    val recs = pages.map { case (u, h) =>
      Warc.httpResponseRecord(u, h.getBytes("UTF-8"))
    }
    Files.write(dir.resolve("s-0.warc.gz"), Warc.archive(recs, gzipPerRecord = true))
    val got = graft.operators.Ingest.readWarcRecords(spark, dir.toString)
      .filter($"warc_type" === "response")
      .collect()
      .map(r => (r.getAs[String]("target_uri"),
        Html.toText(new String(Warc.httpBody(r.getAs[Array[Byte]]("content")), "UTF-8"))))
      .sortBy(_._1).toSeq
    assert(got == Seq(("http://s/a", "A\nalpha & beta"), ("http://s/b", "B\ngamma")))
  }

  // ---- webdataset export (Ingest.writeTarShards) ----

  test("writeTarShards: size-budgeted shards round-trip through readTarMembers") {
    import graft.operators.Ingest
    val dir = Files.createTempDirectory("graft_tarout").toString + "/shards"
    val rows = (0 until 40).map(i => (f"doc-$i%03d.txt",
      (s"payload $i " * (i % 5 + 1)).getBytes("UTF-8")))
    val df = rows.toDF("member", "content").repartition(3)
    val summary = Ingest.writeTarShards(df, "member", "content", dir,
      maxShardBytes = 200)
    val sums = summary.as[(String, Long, Long)].collect()
    assert(sums.map(_._2).sum == 40, "every member lands in some shard")
    // size budget honored except single-oversize-member shards
    sums.foreach { case (name, members, bytes) =>
      assert(bytes <= 200 || members == 1, s"$name: $members members, $bytes bytes")
    }
    // round trip: every member back, bytes identical
    val back = Ingest.readTarMembers(spark, dir)
      .select($"member", $"content").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap
    assert(back.size == 40)
    rows.foreach { case (m, b) => assert(back(m) == new String(b, "UTF-8"), m) }
    // an oversize member (> budget) still writes, alone in its shard
    val dir2 = Files.createTempDirectory("graft_tarout2").toString + "/shards"
    val big = Seq(("big.bin", Array.fill[Byte](500)(7)), ("small.bin", Array[Byte](1)))
    Ingest.writeTarShards(big.toDF("member", "content").coalesce(1),
      "member", "content", dir2, maxShardBytes = 200)
    val back2 = Ingest.readTarMembers(spark, dir2).select($"member").as[String]
      .collect().sorted
    assert(back2.toSeq == Seq("big.bin", "small.bin"))
  }

  // ---- magic-byte sniffing (sources/Magic.scala) ----

  test("Magic.sniff: real generator outputs classify correctly") {
    import graft.sources.{Magic, Tar, Warc}
    import graft.operators.Multimodal
    assert(Magic.sniff(Multimodal.syntheticPng(8, 8, 1, 2, 3)) == "png")
    assert(Magic.sniff(Multimodal.syntheticWav(8000, 1, 16, 7L)) == "wav")
    assert(Magic.sniff(Tar.archive(Seq(("a.txt", "hi".getBytes("UTF-8"))))) == "tar")
    assert(Magic.sniff(Warc.archive(Seq(
      Warc.httpResponseRecord("http://x/1", "b".getBytes("UTF-8"))))) == "warc")
    val gz = { val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write("text".getBytes("UTF-8")); g.close(); o.toByteArray }
    assert(Magic.sniff(gz) == "gzip")
    assert(Magic.sniff("%PDF-1.4\n1 0 obj".getBytes("UTF-8")) == "pdf")
    assert(Magic.sniff("  \n<!DOCTYPE HTML><html>".getBytes("UTF-8")) == "html")
    assert(Magic.sniff("<HtMl><body>x</body>".getBytes("UTF-8")) == "html")
    assert(Magic.sniff("<?xml version=\"1.0\"?><r/>".getBytes("UTF-8")) == "xml")
    assert(Magic.sniff("plain utf-8 text with ümlauts".getBytes("UTF-8")) == "text")
  }

  test("Magic.sniff: edge shapes — empty, NUL text, invalid UTF-8, truncation probe") {
    import graft.sources.Magic
    assert(Magic.sniff(Array.emptyByteArray) == "empty")
    assert(Magic.sniff(null) == "empty")
    assert(Magic.sniff("has\u0000nul".getBytes("UTF-8")) == "binary")
    assert(Magic.sniff(Array[Byte](0xFF.toByte, 0xFE.toByte, 0x00, 0x41)) == "binary")
    // >8 KB text cut mid-multibyte at the probe boundary is still text
    val big = ("ä" * 5000).getBytes("UTF-8") // 10000 bytes, probe cuts at 8192
    assert(Magic.sniff(big) == "text")
    // RIFF but not WAVE
    val riff = "RIFF\u0004\u0000\u0000\u0000AVI LIST".getBytes("ISO-8859-1")
    assert(Magic.sniff(riff) == "riff")
    assert(Magic.sniff("GIF89a\u0001\u0000".getBytes("ISO-8859-1")) == "gif")
    assert(Magic.sniff(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)) == "jpeg")
  }

  // ---- robots.txt (sources/Robots.scala) ----

  test("Robots: longest-match precedence, allow-tie, wildcards, end anchor") {
    import graft.sources.Robots.allowed
    val txt =
      """User-agent: graftbot
        |Disallow: /private/
        |Allow: /private/ok/
        |Disallow: /tmp*.bak
        |Allow: /exact$
        |Disallow: /exact
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(allowed(txt, "graftbot", "/public/x"))
    assert(!allowed(txt, "graftbot", "/private/x"))
    assert(allowed(txt, "graftbot", "/private/ok/x"), "longer allow beats disallow")
    assert(!allowed(txt, "graftbot", "/tmp/deep/file.bak"), "* spans segments")
    assert(allowed(txt, "graftbot", "/tmp/file.bak2") == false, "prefix after * matches")
    assert(allowed(txt, "graftbot", "/exact"), "$-anchored allow, tie length+1 wins")
    assert(!allowed(txt, "graftbot", "/exact/sub"), "anchor does not match longer path")
    // unknown agent falls to the * group
    assert(!allowed(txt, "otherbot", "/public/x"))
    // most specific agent token wins: graftbot beats graft
    val two = "User-agent: graft\nDisallow: /a\nUser-agent: graftbot\nDisallow: /b\n"
    assert(allowed(two, "graftbot/1.0", "/a") && !allowed(two, "graftbot/1.0", "/b"))
  }

  test("Robots: comments, case, empty-disallow idiom, missing file, agent runs") {
    import graft.sources.Robots.allowed
    assert(allowed("", "anybot", "/anything"), "no robots.txt = allowed")
    assert(allowed(null, "anybot", "/x"))
    assert(allowed("User-agent: *\nDisallow:\n", "b", "/x"), "empty disallow allows all")
    val cased = "USER-AGENT: GraftBot # our crawler\nDISALLOW: /x # keep out\n"
    assert(!allowed(cased, "graftbot", "/x") && allowed(cased, "graftbot", "/y"))
    // consecutive user-agent lines share a group; a blank line alone
    // does not end the group
    val shared = "User-agent: a\nUser-agent: b\n\nDisallow: /x\n"
    assert(!allowed(shared, "a", "/x") && !allowed(shared, "b", "/x"))
    // rules before any user-agent line are ignored, not crashed on
    assert(allowed("Disallow: /x\n", "a", "/x"))
  }

  // ---- URL canonicalization (sources/Url.scala) ----

  test("Url.normalize: case, default ports, fragments, dot segments, escapes") {
    import graft.sources.Url
    assert(Url.normalize("HTTP://ExAmple.COM:80/a/../b#frag") == "http://example.com/b")
    assert(Url.normalize("https://h.io:443/x") == "https://h.io/x")
    assert(Url.normalize("https://h.io:8443/x") == "https://h.io:8443/x")
    assert(Url.normalize("http://h.io") == "http://h.io/")
    assert(Url.normalize("http://h.io/a/./b/./c") == "http://h.io/a/b/c")
    assert(Url.normalize("http://h.io/a/b/../../c/d/..") == "http://h.io/c/")
    // leading .. cannot climb above root
    assert(Url.normalize("http://h.io/../a") == "http://h.io/a")
    // unreserved escapes decode; reserved keep with UPPER hex
    assert(Url.normalize("http://h.io/%64oc%2fs") == "http://h.io/doc%2Fs")
    assert(Url.normalize("http://h.io/p?a=%41&b=%2f") == "http://h.io/p?a=A&b=%2F")
    // empty query's dangling '?' drops; query order preserved
    assert(Url.normalize("http://h.io/p?") == "http://h.io/p")
    assert(Url.normalize("http://h.io/p?b=2&a=1") == "http://h.io/p?b=2&a=1")
  }

  test("Url.normalize: junk passes through; IPv6/userinfo/weird ports survive") {
    import graft.sources.Url
    assert(Url.normalize("not a url") == "not a url")
    assert(Url.normalize("  mailto:x@y.z  ") == "mailto:x@y.z")
    assert(Url.normalize("://nohost") == "://nohost")
    assert(Url.normalize(null) == "")
    assert(Url.normalize("http://user:p@H.IO/x") == "http://user:p@h.io/x")
    assert(Url.normalize("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
    assert(Url.normalize("http://h.io:notaport/x") == "http://h.io:notaport/x")
    assert(Url.host("HTTP://User@Sub.Ex.COM:8080/p?q") == "sub.ex.com")
    assert(Url.host("http://[2001:DB8::1]/x") == "[2001:db8::1]")
    assert(Url.host("garbage") == "")
  }

  test("Url.normalize is idempotent and keys URL-dedup correctly") {
    import graft.sources.Url
    val variants = Seq(
      "HTTP://Example.com:80/a/b/../c",
      "http://example.com/a/./c",
      "http://example.com/a/c#section",
      "http://example.com/a/%63")
    val keys = variants.map(Url.normalize).distinct
    assert(keys == Seq("http://example.com/a/c"), keys.toString)
    val all = variants ++ Seq("http://h.io/p?a=%41", "not a url")
    assert(all.map(Url.normalize).map(Url.normalize) == all.map(Url.normalize))
  }

  test("CSV short/bad rows: PERMISSIVE pads with nulls, no rows lost") {
    val dir = Files.createTempDirectory("graft_csv")
    // short rows are padded, bad cells are nulled — rows are never
    // silently dropped under the default mode
    Files.write(dir.resolve("a.csv"), java.util.Arrays.asList(
      "1,alpha,1.5", "2,beta", "3,gamma,not_a_number", "4,delta,3.5"))
    val schema = "id LONG, tag STRING, v DOUBLE"
    val permissive = spark.read.schema(schema).csv(dir.toString)
    assert(permissive.count() == 4)
    assert(permissive.filter($"v".isNull).count() == 2)
    assert(permissive.filter($"id".isNotNull).count() == 4)
  }
  test("mp4 probe: writer-half fixtures round-trip; truncation and garbage are safe; unknown boxes skip") {
    import graft.sources.Mp4
    val b = Mp4.syntheticMp4(durationMs = 5500, timescale = 1000,
      width = 320, height = 240, videoSamples = 42, audio = true)
    val m = Mp4.probe(b)
    assert(m.ok && m.brand == "isom")
    assert(m.durationMs == 5500 && m.nTracks == 2)
    assert(m.hasVideo && m.hasAudio)
    assert(m.width == 320 && m.height == 240)
    assert(m.nSamples == 42 + 84) // stsz sums across tracks
    // non-divisible timescale floors the millisecond duration
    val t9 = Mp4.probe(Mp4.syntheticMp4(1001, 90000, 64, 48, 1, audio = false))
    assert(t9.ok && t9.durationMs == 90090L * 1000L / 90000L)
    assert(t9.nTracks == 1 && t9.hasVideo && !t9.hasAudio)
    // truncation at every prefix length: never throws, never ok
    (0 until b.length by 7).foreach { n =>
      val t = Mp4.probe(java.util.Arrays.copyOf(b, n))
      assert(!t.ok || n == b.length, s"truncated prefix $n reported ok")
    }
    // garbage is rejected, not thrown
    assert(!Mp4.probe(Array.fill[Byte](64)(0x41)).ok)
    assert(!Mp4.probe(null).ok)
    // unknown top-level boxes skip by size (forward compatibility)
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    val m2 = Mp4.probe(free ++ b)
    assert(m2.ok && m2.durationMs == 5500 && m2.nTracks == 2)
    // size==0 (extends to EOF) on the LAST box parses
    val zeroTail = b.clone()
    // moov is the second top-level box; find its offset = ftyp size
    val ftypSize = ((b(0) & 0xFF) << 24) | ((b(1) & 0xFF) << 16) |
      ((b(2) & 0xFF) << 8) | (b(3) & 0xFF)
    zeroTail(ftypSize) = 0; zeroTail(ftypSize + 1) = 0
    zeroTail(ftypSize + 2) = 0; zeroTail(ftypSize + 3) = 0
    val m3 = Mp4.probe(zeroTail)
    assert(m3.ok && m3.nTracks == 2, s"size-0 tail box failed: ${m3.err}")
  }
}
