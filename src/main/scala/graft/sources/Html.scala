package graft.sources

/** Dep-free HTML -> text extraction — the WET step of a crawl
  * pipeline: WARC response payloads ([[Warc.httpBody]]) are HTML, and
  * every text operator downstream (chunking, dedup, quality filters,
  * decontamination) wants the rendered text, not markup. The
  * reference's only extractor is PDF (`streamlit_app.py:60-71`); web
  * corpora need this one. Pure function, usable inside the same
  * ingest UDF slot as the PDF extractor.
  *
  * Exactly-specified semantics (deterministic, oracle-replayable —
  * browser-flavored, not a browser):
  *   - `<!-- ... -->` comments drop (unterminated: rest of input drops);
  *   - `<script>`/`<style>` elements drop WITH their content (to the
  *     first case-insensitive close tag; unterminated: to end);
  *   - tags drop; BLOCK-level tags (p, div, br, h1-h6, li, tr, td, th,
  *     table, title, blockquote, pre, header, footer, nav, section,
  *     article, aside, main, form, ul, ol, dl, dt, dd, hr, head, body,
  *     html, figure, figcaption, option, select, textarea) emit a line
  *     break; inline tags (b, i, a, span, em, ...) emit nothing;
  *   - a `<` not opening a tag (next char not a letter, `/`, `!` or
  *     `?`) is literal text; a tag with no closing `>` (respecting
  *     quoted attribute values) truncates there;
  *   - entities decode: the XML five + `&nbsp;` (to a PLAIN space —
  *     documented divergence from the non-breaking rendering) and
  *     numeric `&#NNN;` / `&#xHH;`; unknown or malformed stay literal;
  *   - whitespace: runs of space/tab/CR/LF in TEXT collapse to one
  *     space (raw newlines in source are markup whitespace, only block
  *     tags break lines); each output line is trimmed; empty lines
  *     drop. Output lines join with `\n`.
  */
object Html {
  private val Block: Set[String] = Set(
    "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "tr", "td", "th", "table", "thead", "tbody", "tfoot",
    "title", "head", "body", "html", "header", "footer", "nav", "section",
    "article", "aside", "main", "blockquote", "pre", "form", "figure",
    "figcaption", "dl", "dt", "dd", "option", "select", "textarea")

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode one entity starting at `i` (which points at '&').
    * Returns (decoded, nextIndex) or null when not a valid entity. */
  private def entity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 12) return null // bounded: real entities are short
    val body = s.substring(i + 1, semi)
    if (body.startsWith("#")) {
      val cp =
        try {
          if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
            Integer.parseInt(body.substring(2), 16)
          else Integer.parseInt(body.substring(1), 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0 && cp <= 0x10FFFF && Character.isValidCodePoint(cp) &&
          !(cp >= 0xD800 && cp <= 0xDFFF))
        (new String(Character.toChars(cp)), semi + 1)
      else null
    } else Named.get(body).map((_, semi + 1)).orNull
  }

  /** Tag name after `<` or `</`, lower-cased; empty when malformed. */
  private def tagName(s: String, start: Int): String = {
    var i = start
    val b = new java.lang.StringBuilder(8)
    while (i < s.length && b.length < 16 &&
        (Character.isLetterOrDigit(s.charAt(i)))) {
      b.append(Character.toLowerCase(s.charAt(i))); i += 1
    }
    b.toString
  }

  /** End index (exclusive of '>') of the tag starting at `i` ('<'),
    * honoring quoted attribute values; -1 when unterminated. */
  private def tagEnd(s: String, i: Int): Int = {
    var p = i + 1
    var quote: Char = 0
    while (p < s.length) {
      val c = s.charAt(p)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return p
      p += 1
    }
    -1
  }

  /** Decode the HTML entities of an attribute value (href carries
    * `&amp;` for every literal `&`). Non-entities pass through. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val e = entity(s, i)
        if (e == null) { out.append('&'); i += 1 }
        else { out.append(e._1); i = e._2 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** The `href` targets of `<a>` anchors, in document order — the
    * outlink extraction of a crawl pipeline (feeds [[Url.normalize]]
    * and the frontier/host-graph stages). Handles the three HTML
    * attribute quoting forms (double, single, unquoted), decodes
    * entities (`&amp;` in query strings), skips `javascript:` /
    * `mailto:` / bare-fragment pseudo-links, and resolves relative
    * targets against `baseUrl` via RFC 3986 (`java.net.URI`) —
    * unresolvable garbage is dropped, never thrown. Single pass over
    * the bytes, zero dependencies: safe to run as a projection over
    * 10^10 crawled pages. */
  def links(html: String, baseUrl: String = ""): Seq[String] = {
    if (html == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) i = n
      else if (!Character.isLetter(html.charAt(lt + 1))) i = lt + 1
      else {
        val name = tagName(html, lt + 1)
        val end = tagEnd(html, lt)
        if (end < 0) i = n // truncated tag: drop the tail
        else {
          if (name == "a") {
            // scan attributes inside [lt+2, end) for href=...
            var p = lt + 1 + name.length
            var href: String = null
            while (href == null && p < end) {
              // attribute name start: a letter preceded by ws or quote end
              // the char BEFORE 'href' must be an attribute-name
              // boundary — whitespace or a closing quote — not merely
              // non-alphanumeric: 'data-href="..."' has '-' before
              // href and is a DIFFERENT attribute, not the anchor
              if (html.regionMatches(true, p, "href", 0, 4) && p > 0 && {
                    val b = html.charAt(p - 1)
                    Character.isWhitespace(b) || b == '"' || b == '\''
                  }) {
                var q = p + 4
                while (q < end && Character.isWhitespace(html.charAt(q))) q += 1
                if (q < end && html.charAt(q) == '=') {
                  q += 1
                  while (q < end && Character.isWhitespace(html.charAt(q))) q += 1
                  if (q < end) {
                    val c = html.charAt(q)
                    if (c == '"' || c == '\'') {
                      val close = html.indexOf(c, q + 1)
                      if (close >= 0 && close <= end)
                        href = html.substring(q + 1, close)
                    } else {
                      var e = q
                      while (e < end && !Character.isWhitespace(html.charAt(e)))
                        e += 1
                      href = html.substring(q, e)
                    }
                  }
                }
              }
              p += 1
            }
            if (href != null) {
              val raw = decodeEntities(href.trim)
              val low = raw.toLowerCase
              if (raw.nonEmpty && !raw.startsWith("#") &&
                  !low.startsWith("javascript:") && !low.startsWith("mailto:") &&
                  !low.startsWith("data:")) {
                val resolved =
                  if (low.startsWith("http://") || low.startsWith("https://"))
                    raw
                  else if (baseUrl.isEmpty) null
                  else
                    try new java.net.URI(baseUrl).resolve(raw).toString
                    catch { case _: Exception => null }
                if (resolved != null && {
                  val rl = resolved.toLowerCase
                  rl.startsWith("http://") || rl.startsWith("https://")
                }) out += resolved
              }
            }
          }
          i = end + 1
        }
      }
    }
    out.toSeq
  }

  def toText(html: String): String = {
    if (html == null) return ""
    val out = new java.lang.StringBuilder(html.length / 2)
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (i + 1 < n && {
          val d = html.charAt(i + 1)
          Character.isLetter(d) || d == '/' || d == '!' || d == '?'
        }) {
          val nameStart = if (html.charAt(i + 1) == '/') i + 2 else i + 1
          val name = tagName(html, nameStart)
          val end = tagEnd(html, i)
          if (end < 0) i = n // truncated tag: drop the tail
          else {
            val closing = html.charAt(i + 1) == '/'
            val selfClosed = html.charAt(end - 1) == '/'
            if (!closing && !selfClosed && (name == "script" || name == "style")) {
              // drop element content to the matching close tag
              var p = end + 1
              var stop = -1
              val want = "</" + name
              while (stop < 0 && p + want.length <= n) {
                if (html.regionMatches(true, p, want, 0, want.length)) stop = p
                p += 1
              }
              i = if (stop < 0) n else {
                val e = tagEnd(html, stop)
                if (e < 0) n else e + 1
              }
            } else {
              if (Block.contains(name)) out.append('\n')
              i = end + 1
            }
          }
        } else { out.append('<'); i += 1 }
      } else if (c == '&') {
        val e = entity(html, i)
        if (e == null) { out.append('&'); i += 1 }
        else { out.append(e._1); i = e._2 }
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
        out.append(' '); i += 1
      } else { out.append(c); i += 1 }
    }
    // line normalization: collapse spaces, trim, drop empties
    val lines = out.toString.split('\n')
    val sb = new java.lang.StringBuilder(out.length)
    var first = true
    lines.foreach { line =>
      val norm = line.replaceAll(" {2,}", " ").trim
      if (norm.nonEmpty) {
        if (!first) sb.append('\n')
        sb.append(norm)
        first = false
      }
    }
    sb.toString
  }
}
