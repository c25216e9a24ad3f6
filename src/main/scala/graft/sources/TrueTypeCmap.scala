package graft.sources

/** Minimal TrueType/OpenType `cmap` reader — just enough to give the
  * PDF text extractor a glyph-id -> Unicode map for Identity-H/V CID
  * fonts that ship NO /ToUnicode CMap (reference behavior:
  * `streamlit_app.py:62-63` delegates to PyMuPDF, which falls back to
  * the embedded font program's own character map in exactly this
  * case). Under `/CIDToGIDMap /Identity` the CID in the content stream
  * IS the glyph id, so inverting the font's char->glyph cmap recovers
  * the text a reader would copy out.
  *
  * Supports subtable formats 4 (BMP segment mapping — the universal
  * format) and 12 (segmented coverage — supplementary planes); that
  * pair covers effectively every real embedded font. All subtables
  * parse and merge (format-12 entries win on overlap — they are the
  * fuller repertoire); the inversion keeps the SMALLEST code point per
  * glyph so the result is deterministic regardless of table order.
  * Every read is bounds-checked: a truncated or garbage font program
  * yields an empty map, never a throw — the header-parse discipline of
  * [[Mp4]]/WAV/PNG applied to sfnt. */
object TrueTypeCmap {

  /** Glyph id -> Unicode code point, or empty on anything malformed. */
  def gidToUnicode(font: Array[Byte]): Map[Int, Int] = {
    val charToGid = charToGlyph(font)
    val out = scala.collection.mutable.HashMap.empty[Int, Int]
    charToGid.foreach { case (ch, gid) =>
      val cur = out.get(gid)
      if (cur.forall(ch < _)) out(gid) = ch
    }
    out.toMap
  }

  /** The merged char -> glyph map of every format-4/12 subtable. */
  private[sources] def charToGlyph(font: Array[Byte]): Map[Int, Int] = {
    if (font == null) return Map.empty
    def u16(at: Int): Int =
      if (at < 0 || at + 2 > font.length) -1
      else ((font(at) & 0xff) << 8) | (font(at + 1) & 0xff)
    def u32(at: Int): Long =
      if (at < 0 || at + 4 > font.length) -1L
      else ((font(at) & 0xffL) << 24) | ((font(at + 1) & 0xffL) << 16) |
        ((font(at + 2) & 0xffL) << 8) | (font(at + 3) & 0xffL)
    // sfnt version: 0x00010000 (TrueType), 'OTTO' (CFF), 'true' (Apple)
    val ver = u32(0)
    if (ver != 0x00010000L && ver != 0x4f54544fL && ver != 0x74727565L)
      return Map.empty
    val numTables = u16(4)
    if (numTables <= 0 || numTables > 512) return Map.empty
    var cmapOff = -1L
    var i = 0
    while (i < numTables && cmapOff < 0) {
      val rec = 12 + 16 * i
      if (u32(rec) == 0x636d6170L) cmapOff = u32(rec + 8) // 'cmap'
      i += 1
    }
    if (cmapOff < 0 || cmapOff > font.length) return Map.empty
    val base = cmapOff.toInt
    val nSub = u16(base + 2)
    if (nSub <= 0 || nSub > 64) return Map.empty
    val acc = scala.collection.mutable.HashMap.empty[Int, Int]
    // parse format 4 first, then 12 (fuller repertoire overwrites)
    val subs = (0 until nSub).flatMap { k =>
      val off = u32(base + 4 + 8 * k + 4)
      if (off < 0 || base + off >= font.length) None
      else Some(base + off.toInt)
    }.distinct.sortBy(o => u16(o)) // format 4 sorts before 12
    subs.foreach { at =>
      u16(at) match {
        case 4 => parseFormat4(u16, at, acc)
        case 12 => parseFormat12(u32, at, acc)
        case _ => ()
      }
    }
    acc.toMap
  }

  private val MaxEntries = 1 << 20 // garbage-table enumeration cap

  private def parseFormat4(u16: Int => Int, at: Int,
      acc: scala.collection.mutable.HashMap[Int, Int]): Unit = {
    val segX2 = u16(at + 6)
    if (segX2 <= 0 || segX2 % 2 != 0) return
    val segs = segX2 / 2
    val endAt = at + 14
    val startAt = endAt + segX2 + 2 // +2: reservedPad
    val deltaAt = startAt + segX2
    val rangeAt = deltaAt + segX2
    // Total-iteration budget: a crafted 32k-seg table whose glyph ids
    // are all 0 adds nothing (so MaxEntries never trips) yet would spin
    // segs * 64Ki ~ 2e9 iterations; a legit full-BMP font needs ~65k.
    var budget = 1 << 22
    var i = 0
    while (i < segs && budget > 0) {
      val end = u16(endAt + 2 * i)
      val start = u16(startAt + 2 * i)
      val delta = u16(deltaAt + 2 * i)
      val rangeOff = u16(rangeAt + 2 * i)
      if (end < 0 || start < 0 || delta < 0 || rangeOff < 0) return
      if (start <= end && !(start == 0xffff && end == 0xffff)) {
        var c = start
        while (c <= end && acc.size < MaxEntries && budget > 0) {
          budget -= 1
          val gid =
            if (rangeOff == 0) (c + delta) & 0xffff
            else {
              val a = rangeAt + 2 * i + rangeOff + 2 * (c - start)
              val g = u16(a)
              if (g <= 0) 0 else (g + delta) & 0xffff
            }
          if (gid > 0 && c != 0xffff) acc(c) = gid
          c += 1
        }
      }
      i += 1
    }
  }

  private def parseFormat12(u32: Int => Long, at: Int,
      acc: scala.collection.mutable.HashMap[Int, Int]): Unit = {
    val nGroups = u32(at + 12)
    if (nGroups <= 0 || nGroups > 100000) return
    var g = 0L
    while (g < nGroups) {
      val rec = at + 16 + 12 * g.toInt
      val start = u32(rec)
      val end = u32(rec + 4)
      val gid0 = u32(rec + 8)
      if (start < 0 || end < start || gid0 < 0) return
      // Iterate only the Unicode-valid slice: a group whose start is
      // beyond U+10FFFF contributes nothing, and a group whose end is
      // near 0xFFFFFFFF must not spin ~4.3e9 no-op iterations (no
      // entry ever lands, so the MaxEntries cap alone can't stop it —
      // a crafted/corrupt coverage table could hang extraction).
      if (start <= 0x10ffffL) {
        val hi = math.min(end, 0x10ffffL)
        var c = start
        while (c <= hi && acc.size < MaxEntries) {
          acc(c.toInt) = ((gid0 + (c - start)) & 0xffff).toInt
          c += 1
        }
      }
      g += 1
    }
  }
}
