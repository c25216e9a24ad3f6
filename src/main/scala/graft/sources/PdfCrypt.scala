package graft.sources

/** PDF standard security handler primitives (PDF 32000-1 §7.6.2-7.6.3),
  * dep-free: MD5 via `java.security.MessageDigest`, AES-CBC via the
  * JDK's `javax.crypto`, RC4 hand-rolled (12 lines; also sidesteps any
  * JCE provider/policy variance for the legacy cipher).
  *
  * Scope ([[SimplePdfTextExtractor]]'s encrypted-document support):
  * documents whose USER password the caller can supply — including
  * the empty password, i.e. the owner-locked/"protected" PDFs
  * crawled corpora are full of, which every viewer opens without
  * prompting — under revisions R2/R3/R4 with RC4-40..128 (/V1, /V2,
  * /V4+/V2) or AES-128-CBC (/V4+/AESV2) stream encryption, AND V5
  * AES-256 (R5 legacy Adobe single-SHA-256, R6 ISO 32000-2 with the
  * algorithm-2.B iterated hash) — what Acrobat X+ writes. The
  * reference opens these transparently via PyMuPDF
  * (`/root/reference/streamlit_app.py:62`). A supplied password is
  * authenticated viewer-style: as the USER password first
  * (algorithm 2/6, or 2.A for V5), then as the OWNER password
  * (algorithm 7 peels /O back to the padded user password for V<5;
  * the 2.A owner half unwraps /OE for V5). A wrong (or missing)
  * password fails verification and the document keeps its
  * no-text-layer fallback route — never a throw; non-Standard
  * handlers are out of scope.
  *
  * The algorithm-3/4/5 WRITER halves ([[computeO]]/[[computeU]]/
  * [[encryptAes]]) exist so golden encrypted fixtures can be built
  * in-repo (SourcesSpec) — they are the same math the verifier runs.
  */
private[graft] object PdfCrypt {

  /** §7.6.3.3 the 32-byte password padding string. */
  private[graft] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4/ARCFOUR keystream cipher (encrypt == decrypt). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var n = 0
    while (n < data.length) {
      i = (i + 1) & 0xFF
      j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      out(n) = (data(n) ^ s((s(i) + s(j)) & 0xFF)).toByte
      n += 1
    }
    out
  }

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** §7.6.3.3 step (a): the user password padded/truncated to exactly
    * 32 bytes with [[Pad]] — the empty password is Pad itself. */
  private[graft] def padPwd(pwd: Array[Byte]): Array[Byte] =
    (pwd ++ Pad).take(32)

  /** Algorithm 2: the file encryption key for user password `pwd`
    * (empty array = the empty user password). `keyLen` in bytes (5 for
    * 40-bit R2, up to 16). */
  private[graft] def fileKey(pwd: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, keyLen: Int,
      encryptMetadata: Boolean): Array[Byte] = {
    val extra =
      if (r >= 4 && !encryptMetadata) le32(-1) else Array.emptyByteArray
    var key = md5(padPwd(pwd), o.take(32), le32(p), id0, extra).take(keyLen)
    if (r >= 3) for (_ <- 0 until 50) key = md5(key).take(keyLen)
    key
  }

  /** Algorithm 4 (R2) / 5 (R>=3): the /U entry proving the user
    * password against `key`. The password itself never appears here —
    * /U always encrypts the FIXED padding string (R2) or MD5(Pad, id0)
    * (R>=3); the password enters only through `key` (algorithm 2), so
    * this entry verifies whichever password derived the key. For R>=3
    * only the first 16 bytes are defined; the writer half pads with
    * zeros. */
  private[graft] def computeU(key: Array[Byte], id0: Array[Byte],
      r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var x = rc4(key, md5(Pad, id0))
      for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
      x ++ new Array[Byte](16)
    }

  /** Algorithm 6: does the document's /U entry verify the user
    * password that derived `key`? */
  private[graft] def verifyUser(key: Array[Byte], u: Array[Byte],
      id0: Array[Byte], r: Int): Boolean = {
    val expect = computeU(key, id0, r)
    val n = if (r == 2) 32 else 16 // R>=3: trailing 16 bytes arbitrary
    u.length >= n && java.util.Arrays.equals(expect.take(n), u.take(n))
  }

  /** Algorithm 3 (writer half): the /O entry for (`ownerPwd`,
    * `userPwd`) — RC4 of the padded USER password under the
    * owner-password key. */
  private[graft] def computeO(ownerPwd: Array[Byte], r: Int, keyLen: Int,
      userPwd: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val padded = padPwd(ownerPwd)
    var h = md5(padded)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val okey = h.take(keyLen)
    var o = rc4(okey, padPwd(userPwd))
    if (r >= 3) for (i <- 1 to 19) o = rc4(okey.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithm 7: authenticate the OWNER password — recover the
    * padded USER password by peeling /O's RC4 layers under the
    * owner-password key, then run algorithms 2+6 with it. Some(key)
    * iff `ownerPwd` is the document's owner password. (The recovered
    * 32 bytes ARE the padded user password, and [[padPwd]] is a
    * fixpoint on 32-byte inputs, so [[fileKey]] consumes it as-is.) */
  private[graft] def fileKeyFromOwner(ownerPwd: Array[Byte],
      o: Array[Byte], u: Array[Byte], p: Int, id0: Array[Byte], r: Int,
      keyLen: Int, encryptMetadata: Boolean): Option[Array[Byte]] = {
    var h = md5(padPwd(ownerPwd))
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val okey = h.take(keyLen)
    var userPad = o.take(32)
    if (r == 2) userPad = rc4(okey, userPad)
    else for (i <- 19 to 0 by -1)
      userPad = rc4(okey.map(b => (b ^ i).toByte), userPad)
    val key = fileKey(userPad, o, p, id0, r, keyLen, encryptMetadata)
    if (verifyUser(key, u, id0, r)) Some(key) else None
  }

  /** Algorithm 1: per-object key — MD5(fileKey || objNum LE24 ||
    * gen LE16 || "sAlT" when AES), truncated to min(len+5, 16). */
  private[graft] def objectKey(fileKey: Array[Byte], objNum: Long,
      gen: Long, aes: Boolean): Array[Byte] = {
    val ext = Array(objNum.toByte, (objNum >> 8).toByte, (objNum >> 16).toByte,
      gen.toByte, (gen >> 8).toByte)
    val salt =
      if (aes) Array(0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte)
      else Array.emptyByteArray
    md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
  }

  // ---------- AES-256 (V5: R5 legacy Adobe / R6 ISO 32000-2) ----------

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbc(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
      encrypt: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B (ISO 32000-2 §7.6.4.3.4, R6): the iterated
    * SHA-256/384/512 + AES-CBC password hash. `udata` is empty for the
    * user-password route (it carries /U only on the owner route). */
  private[graft] def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha(256, pwd, salt, udata)
    var e = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e(e.length - 1) & 0xFF) > i - 32) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) { System.arraycopy(block, 0, k1, j * block.length, block.length); j += 1 }
      e = aesCbc(k.take(16), k.slice(16, 32), k1, encrypt = true)
      val mod = e.take(16).map(_ & 0xFF).sum % 3
      k = sha(if (mod == 0) 256 else if (mod == 1) 384 else 512, e)
      i += 1
    }
    k.take(32)
  }

  /** V5 user-password bytes: UTF-8, truncated to 127 bytes (ISO
    * 32000-2 §7.6.4.3.2; full SASLprep normalization out of scope —
    * ASCII passwords, the overwhelming case, are unaffected). */
  private[graft] def v5Pwd(pwd: Array[Byte]): Array[Byte] = pwd.take(127)

  /** Algorithm 2.A, user-password half: verify /U's hash against
    * `pwd` (empty array = the empty user password) and unwrap the
    * 32-byte file key from /UE. `u` = hash(32) || validationSalt(8) ||
    * keySalt(8); R5 hashes with one SHA-256, R6 with [[hash2B]]. None
    * when the password is wrong (hash mismatch) or the entries are
    * malformed. */
  private[graft] def fileKeyV5(pwd: Array[Byte], u: Array[Byte],
      ue: Array[Byte], r: Int): Option[Array[Byte]] = {
    if (u.length < 48 || ue.length < 32) return None
    val pw = v5Pwd(pwd)
    val hashPart = u.take(32)
    val vsalt = u.slice(32, 40)
    val ksalt = u.slice(40, 48)
    val computed =
      if (r == 5) sha(256, pw, vsalt) else hash2B(pw, vsalt, Array.emptyByteArray)
    if (!java.util.Arrays.equals(computed, hashPart)) return None
    val intermediate =
      if (r == 5) sha(256, pw, ksalt) else hash2B(pw, ksalt, Array.emptyByteArray)
    try Some(aesCbc(intermediate, new Array[Byte](16), ue.take(32), encrypt = false))
    catch { case _: java.security.GeneralSecurityException => None }
  }

  /** Algorithm 2.A, owner-password half: /O = hash(32) ||
    * validationSalt(8) || keySalt(8) hashed over (ownerPwd, salt,
    * U[0..48]) — the owner route carries the full 48-byte /U as
    * `udata` — and the file key unwraps from /OE. */
  private[graft] def fileKeyV5Owner(ownerPwd: Array[Byte],
      o: Array[Byte], u: Array[Byte], oe: Array[Byte],
      r: Int): Option[Array[Byte]] = {
    if (o.length < 48 || u.length < 48 || oe.length < 32) return None
    val pw = v5Pwd(ownerPwd)
    val u48 = u.take(48)
    val hashPart = o.take(32)
    val vsalt = o.slice(32, 40)
    val ksalt = o.slice(40, 48)
    val computed =
      if (r == 5) sha(256, pw, vsalt, u48) else hash2B(pw, vsalt, u48)
    if (!java.util.Arrays.equals(computed, hashPart)) return None
    val intermediate =
      if (r == 5) sha(256, pw, ksalt, u48) else hash2B(pw, ksalt, u48)
    try Some(aesCbc(intermediate, new Array[Byte](16), oe.take(32), encrypt = false))
    catch { case _: java.security.GeneralSecurityException => None }
  }

  /** Writer half of the V5 owner route (fixtures): the /O and /OE
    * entries proving `fileKey` under `ownerPwd`, bound to an existing
    * /U. */
  private[graft] def computeOV5(fileKey: Array[Byte], vsalt: Array[Byte],
      ksalt: Array[Byte], r: Int, ownerPwd: Array[Byte],
      u: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val pw = v5Pwd(ownerPwd)
    val u48 = u.take(48)
    val hash =
      if (r == 5) sha(256, pw, vsalt, u48) else hash2B(pw, vsalt, u48)
    val intermediate =
      if (r == 5) sha(256, pw, ksalt, u48) else hash2B(pw, ksalt, u48)
    val oe = aesCbc(intermediate, new Array[Byte](16), fileKey, encrypt = true)
    (hash ++ vsalt ++ ksalt, oe)
  }

  /** Writer half of V5 (fixtures): the /U and /UE entries proving
    * `fileKey` under user password `pwd` (empty = empty password). */
  private[graft] def computeUV5(fileKey: Array[Byte], vsalt: Array[Byte],
      ksalt: Array[Byte], r: Int,
      pwd: Array[Byte] = Array.emptyByteArray): (Array[Byte], Array[Byte]) = {
    val pw = v5Pwd(pwd)
    val hash =
      if (r == 5) sha(256, pw, vsalt) else hash2B(pw, vsalt, Array.emptyByteArray)
    val intermediate =
      if (r == 5) sha(256, pw, ksalt) else hash2B(pw, ksalt, Array.emptyByteArray)
    val ue = aesCbc(intermediate, new Array[Byte](16), fileKey, encrypt = true)
    (hash ++ vsalt ++ ksalt, ue)
  }

  /** AES-128-CBC stream decryption (/AESV2): the stored payload's
    * first 16 bytes are the IV; PKCS#5 padding stripped when
    * well-formed (kept when not — lenient, like real readers). None
    * when the payload is structurally impossible (short / non-block
    * length) or the JCE rejects it. */
  private[graft] def decryptAes(objKey: Array[Byte],
      data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return None
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
        new javax.crypto.spec.IvParameterSpec(data, 0, 16))
      val plain = c.doFinal(data, 16, data.length - 16)
      val pad = plain(plain.length - 1) & 0xFF
      if (pad >= 1 && pad <= 16 && pad <= plain.length)
        Some(java.util.Arrays.copyOf(plain, plain.length - pad))
      else Some(plain)
    } catch { case _: java.security.GeneralSecurityException => None }
  }

  /** AES-128-CBC encryption (fixture/writer half): IV prepended, PKCS#5
    * padded — the inverse of [[decryptAes]]. */
  private[graft] def encryptAes(objKey: Array[Byte], iv: Array[Byte],
      plain: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(plain)
  }
}
