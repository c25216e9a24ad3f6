package graft.sources

import java.nio.charset.StandardCharsets

/** Dep-free USTAR (POSIX tar) archive parse + write — the webdataset
  * shard container: multimodal training corpora ship as directories of
  * shard-sized `.tar` files whose members are (sample-key.ext ->
  * bytes), because a tar shard turns billions of tiny image/audio
  * files into large sequential reads. The reference ingests one
  * uploaded file at a time (`streamlit_app.py:127`); at 100 TB the
  * same ingest runs over sharded archives, so the engine reads them
  * natively ([[graft.operators.Ingest.readTarMembers]]).
  *
  * Scope: plain (uncompressed) USTAR/GNU archives, regular-file
  * members (typeflag '0' or NUL). Long member names are supported
  * through both conventions: a GNU 'L' member whose data is the next
  * member's name, and a PAX 'x' extended header whose `path` record
  * overrides the next member's name. Other typeflags (dirs, links,
  * PAX 'g' globals) are skipped member-wise, not tripped over. The
  * writer exists for tests and roundtrip gates and emits a GNU 'L'
  * prefix member for names over 100 bytes, so write->read roundtrips
  * preserve long names.
  *
  * Callers materialize one whole shard as a single `Array[Byte]`
  * ([[graft.operators.Ingest.readTarMembers]] via binaryFile), so a
  * shard must stay under the JVM's ~2 GB array ceiling — fine for
  * webdataset practice (shards are sized 100 MB-1 GB precisely so a
  * worker can hold one), but repacking is required for larger shards.
  */
object Tar {
  private val Block = 512

  private def octal(bytes: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val c = bytes(i)
      if (c >= '0' && c <= '7') v = (v << 3) + (c - '0')
      else if (v > 0 || (c != ' ' && c != 0)) return v // stop at terminator
      i += 1
    }
    v
  }

  private def cstr(bytes: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && bytes(end) != 0) end += 1
    new String(bytes, off, end - off, StandardCharsets.UTF_8)
  }

  /** PAX extended header data: newline-separated "len key=value\n"
    * records, each `len` counting the whole record including itself.
    * Returns the `path` record's value, if present. */
  private def paxPath(data: Array[Byte]): Option[String] = {
    var off = 0
    while (off < data.length) {
      var sp = off
      while (sp < data.length && data(sp) != ' ') sp += 1
      val len =
        try new String(data, off, sp - off, StandardCharsets.US_ASCII).toInt
        catch { case _: NumberFormatException => return None }
      if (len <= 0 || off + len > data.length) return None
      // record body is "key=value\n" between the space and the trailing \n;
      // a record too short to hold even that (e.g. bytes "2 ") would give
      // a negative body length — malformed content ends iteration, never
      // throws (ADVICE r10)
      if (off + len - sp - 2 < 0) return None
      val body = new String(data, sp + 1, off + len - sp - 2, StandardCharsets.UTF_8)
      val eq = body.indexOf('=')
      if (eq > 0 && body.substring(0, eq) == "path") return Some(body.substring(eq + 1))
      off += len
    }
    None
  }

  /** Iterate (memberName, bytes) for every regular-file member. A
    * header block of all zeros ends the archive (two are conventional;
    * one suffices here). Malformed trailing garbage ends iteration
    * rather than throwing — a truncated shard yields its complete
    * members. GNU 'L' long-name members and PAX 'x' `path` records
    * override the following member's name. */
  def members(archive: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var off = 0
      private var pendingName: String = null // from a GNU 'L' / PAX 'x' member
      private var nextEntry: (String, Array[Byte]) = null
      private def advance(): Unit = {
        nextEntry = null
        while (nextEntry == null && off + Block <= archive.length) {
          var allZero = true
          var i = off
          while (allZero && i < off + Block) { if (archive(i) != 0) allZero = false; i += 1 }
          if (allZero) { off = archive.length; return } // end-of-archive marker
          val name = cstr(archive, off, 100)
          val size = octal(archive, off + 124, 12)
          val typeflag = archive(off + 156)
          val dataStart = off + Block
          if (name.isEmpty || size < 0 || dataStart + size > archive.length) {
            off = archive.length // malformed: stop cleanly
          } else {
            val padded = ((size + Block - 1) / Block) * Block
            def data(): Array[Byte] =
              java.util.Arrays.copyOfRange(archive, dataStart, (dataStart + size).toInt)
            if (typeflag == '0'.toByte || typeflag == 0.toByte) {
              val effective = if (pendingName != null) pendingName else name
              pendingName = null
              nextEntry = (effective, data())
            } else if (typeflag == 'L'.toByte) {
              // GNU longname: data is the next member's name, NUL-terminated
              val d = data()
              var end = d.length
              while (end > 0 && d(end - 1) == 0) end -= 1
              pendingName = new String(d, 0, end, StandardCharsets.UTF_8)
            } else if (typeflag == 'x'.toByte) {
              paxPath(data()).foreach(pendingName = _)
            } // other typeflags (dirs, links, PAX 'g' globals): skip
            off = dataStart + padded.toInt
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        val e = nextEntry; advance(); e
      }
    }

  /** Write a USTAR archive of regular-file members (test/gate inverse
    * of [[members]]). Names over 100 bytes get a GNU 'L' prefix member
    * carrying the full name (the `tar` longname convention). */
  def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeMember(name: String, data: Array[Byte], typeflag: Byte): Unit = {
      val hdr = new Array[Byte](Block)
      val nameBytes = name.getBytes(StandardCharsets.UTF_8)
      require(nameBytes.length <= 100, s"member name too long: $name")
      System.arraycopy(nameBytes, 0, hdr, 0, nameBytes.length)
      def putOctal(off: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes(StandardCharsets.US_ASCII), 0, hdr, off, len - 1)
      }
      putOctal(100, 8, 420) // mode 0644
      putOctal(108, 8, 0) // uid
      putOctal(116, 8, 0) // gid
      putOctal(124, 12, data.length.toLong)
      putOctal(136, 12, 0L) // mtime: deterministic archives
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte) // chksum spaces
      hdr(156) = typeflag
      System.arraycopy("ustar\u000000".getBytes(StandardCharsets.US_ASCII), 0, hdr, 257, 8)
      var sum = 0L
      hdr.foreach(b => sum += (b & 0xFF))
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPad.getBytes(StandardCharsets.US_ASCII), 0, hdr, 148, 6)
      hdr(154) = 0; hdr(155) = ' '
      out.write(hdr)
      out.write(data)
      val pad = (Block - (data.length % Block)) % Block
      out.write(new Array[Byte](pad))
    }
    entries.foreach { case (name, data) =>
      val nameBytes = name.getBytes(StandardCharsets.UTF_8)
      if (nameBytes.length > 100) {
        // GNU longname convention: an 'L' member carries the full name
        // (+ NUL) as data; the real header gets a truncated placeholder
        // that longname-aware readers ignore
        writeMember("././@LongLink", nameBytes :+ 0.toByte, 'L'.toByte)
        // ASCII-sanitized so the 100-byte cut can't split a multibyte char
        val placeholder = new String(nameBytes.take(100).map(b =>
          if (b >= 0x20 && b <= 0x7e) b else '_'.toByte), StandardCharsets.US_ASCII)
        writeMember(placeholder, data, '0'.toByte)
      } else writeMember(name, data, '0'.toByte)
    }
    out.write(new Array[Byte](2 * Block)) // end-of-archive
    out.toByteArray
  }
}
