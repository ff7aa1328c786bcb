package graft.kernel

/** PDF standard security handler (ISO 32000-1 §7.6.3) — the decrypt
  * path for the encrypted slice of a crawl's PDF payloads. Nearly every
  * encrypted PDF in the wild is "permissions-only" encryption: the
  * USER password is EMPTY (any reader can open it; the crypto only
  * gates print/copy permissions), so the file key derives from the
  * padding constant alone and extraction is fully automatic. That is
  * the only case this handler opens; a genuinely password-protected
  * document fails loudly (`Pdf.ParseError`) instead of emitting
  * garbage text (C5 isolation turns that into an `ok=false` row).
  *
  * Supported: `/Filter /Standard`, V 1/2 (RC4, 40–128 bit) and V 4
  * with `/CFM /V2` (RC4) or `/CFM /AESV2` (AES-128-CBC), R 2–4 — the
  * shapes Acrobat 4–8 wrote and the overwhelming majority of the
  * encrypted crawl. V 5 (AES-256) is handled at R 5 (the interim Adobe
  * ExtensionLevel 3 scheme) and R 6 (ISO 32000-2 §7.6.4: Algorithm 2.A
  * open, the 2.B iterated SHA-2/AES hash, /UE-wrapped file key, /Perms
  * integrity check; CFM /AESV3 — the FILE key is used directly, no
  * per-object derivation).
  * RC4 is implemented from scratch (the JDK ships no ARCFOUR provider
  * by default); MD5 and AES-CBC come from the JDK's public
  * `MessageDigest`/`Cipher` APIs. RC4 is pinned to its published test
  * vectors in PdfKernelSpec.
  *
  * Reference scope: the reference app delegates PDF handling to an
  * external API (`app/services/ocr_service.py`) which accepts encrypted
  * PDFs; this supplies the same capability from scratch.
  */
object PdfCrypt {
  import Pdf._

  /** §7.6.3.3 padding constant — 32 bytes appended to every password. */
  val PadBytes: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val m = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(m.update)
    m.digest()
  }

  /** RC4 (KSA + PRGA), from scratch. Symmetric: encrypts == decrypts. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** AES-128-CBC with the PDF layout: ciphertext is IV ‖ blocks, PKCS#7
    * padded (§7.6.2). JDK public Cipher API.
    */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || data.length % 16 != 0)
      throw new ParseError(s"AESV2 payload length ${data.length} not IV+blocks")
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOf(data, 16)))
    try c.doFinal(data, 16, data.length - 16)
    catch { case e: java.security.GeneralSecurityException =>
      throw new ParseError(s"AESV2 decrypt: ${e.getMessage}") }
  }

  /** Writer-side twin of [[aesDecrypt]] (fixtures use a deterministic
    * per-object IV so encrypted bytes are reproducible).
    */
  def aesEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  def sha256(parts: Array[Byte]*): Array[Byte] = {
    val m = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(m.update)
    m.digest()
  }

  /** AES-CBC with NO padding (the R6 key-wrap primitive: /UE, /OE and
    * the 2.B inner encryption are exact-multiple blocks).
    */
  def aesCbcNoPad(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
                  encrypt: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
           else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** ISO 32000-2 Algorithm 2.B — the R6 password hash: iterated
    * SHA-256/384/512 interleaved with AES-128-CBC, data-dependent
    * digest choice and stopping rule. `udata` is empty for user-entry
    * hashes and the 48-byte /U string for owner-entry hashes.
    */
  def hash2B(password: Array[Byte], salt: Array[Byte],
             udata: Array[Byte]): Array[Byte] = {
    var k = sha256(password, salt, udata)
    var round = 0
    var e: Array[Byte] = null
    var done = false
    while (!done) {
      val unit = password ++ k ++ udata
      val k1 = new Array[Byte](unit.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(unit, 0, k1, i * unit.length, unit.length); i += 1
      }
      e = aesCbcNoPad(java.util.Arrays.copyOf(k, 16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1, encrypt = true)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      val alg = sum % 3 match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      round += 1
      if (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) done = true
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** R5/R6 user-entry material for a writer (or an open check):
    * `(U, UE)` for a given 32-byte file key and empty-or-given user
    * password, with caller-chosen 8-byte validation/key salts.
    */
  def userEntryV5(r: Int, userPw: Array[Byte], vSalt: Array[Byte],
                  kSalt: Array[Byte], fileKey: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(vSalt.length == 8 && kSalt.length == 8 && fileKey.length == 32)
    val uHash =
      if (r == 6) hash2B(userPw, vSalt, Array.empty)
      else sha256(userPw, vSalt)
    val inter =
      if (r == 6) hash2B(userPw, kSalt, Array.empty)
      else sha256(userPw, kSalt)
    val ue = aesCbcNoPad(inter, new Array[Byte](16), fileKey, encrypt = true)
    (uHash ++ vSalt ++ kSalt, ue)
  }

  /** R6 /Perms value (writer side): P, encrypt-metadata flag and the
    * 'adb' magic under AES-ECB with the file key (§7.6.4.4.9).
    */
  def permsV5(fileKey: Array[Byte], p: Int, encryptMetadata: Boolean): Array[Byte] = {
    val blk = new Array[Byte](16)
    System.arraycopy(le32(p), 0, blk, 0, 4)
    blk(4) = 0xff.toByte; blk(5) = 0xff.toByte; blk(6) = 0xff.toByte; blk(7) = 0xff.toByte
    blk(8) = if (encryptMetadata) 'T'.toByte else 'F'.toByte
    blk(9) = 'a'.toByte; blk(10) = 'd'.toByte; blk(11) = 'b'.toByte
    // bytes 12..15: arbitrary per spec; fixed for deterministic fixtures
    blk(12) = 'g'; blk(13) = 'r'; blk(14) = 'f'; blk(15) = 't'
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    c.doFinal(blk)
  }

  /** Algorithm 2: file encryption key from a (padded) user password. */
  def fileKey(userPw: Array[Byte], oEntry: Array[Byte], p: Int,
              id0: Array[Byte], r: Int, lengthBits: Int,
              encryptMetadata: Boolean = true): Array[Byte] = {
    val padded = java.util.Arrays.copyOf(userPw ++ PadBytes, 32)
    val tail =
      if (r >= 4 && !encryptMetadata) le32(-1) else Array.empty[Byte]
    var key = md5(padded, oEntry, le32(p), id0, tail)
    val n = if (r == 2) 5 else lengthBits / 8
    if (r >= 3) {
      var it = 0
      while (it < 50) { key = md5(java.util.Arrays.copyOf(key, n)); it += 1 }
    }
    java.util.Arrays.copyOf(key, n)
  }

  /** Algorithm 3: the /O entry (writer side — fixtures). */
  def ownerEntry(ownerPw: Array[Byte], userPw: Array[Byte], r: Int,
                 lengthBits: Int): Array[Byte] = {
    var h = md5(java.util.Arrays.copyOf(ownerPw ++ PadBytes, 32))
    if (r >= 3) { var it = 0; while (it < 50) { h = md5(h); it += 1 } }
    val n = if (r == 2) 5 else lengthBits / 8
    val key = java.util.Arrays.copyOf(h, n)
    var v = java.util.Arrays.copyOf(userPw ++ PadBytes, 32)
    v = rc4(key, v)
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        v = rc4(key.map(b => (b ^ i).toByte), v)
        i += 1
      }
    }
    v
  }

  /** Algorithms 4/5: the /U entry for a given file key — the writer's
    * value AND the reader's open-password check (compare all 32 bytes
    * for R 2, the first 16 for R ≥ 3).
    */
  def userEntry(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, PadBytes)
    else {
      var v = rc4(key, md5(PadBytes, id0))
      var i = 1
      while (i <= 19) {
        v = rc4(key.map(b => (b ^ i).toByte), v)
        i += 1
      }
      v ++ new Array[Byte](16) // 32-byte entry; bytes 16..31 are arbitrary
    }

  final case class Encryption(key: Array[Byte], aes: Boolean, encObj: Int,
                              v5: Boolean = false)

  /** §7.6.2 per-object key: MD5(file key ‖ objnum[0..2] ‖ gen[0..1]
    * ‖ "sAlT" when AES), truncated to min(keyLen+5, 16). At V 5 the
    * FILE key is used directly (§7.6.4: no per-object derivation).
    */
  def objectKey(e: Encryption, num: Int, gen: Int): Array[Byte] = {
    if (e.v5) return e.key
    val salt =
      if (e.aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
    val ext = md5(e.key,
      Array(num.toByte, (num >>> 8).toByte, (num >>> 16).toByte,
        gen.toByte, (gen >>> 8).toByte),
      salt)
    java.util.Arrays.copyOf(ext, math.min(e.key.length + 5, 16))
  }

  def decryptBytes(e: Encryption, num: Int, gen: Int,
                   data: Array[Byte]): Array[Byte] = {
    val k = objectKey(e, num, gen)
    if (e.aes) aesDecrypt(k, data) else rc4(k, data)
  }

  def encryptBytes(e: Encryption, num: Int, gen: Int,
                   data: Array[Byte]): Array[Byte] = {
    val k = objectKey(e, num, gen)
    if (e.aes) aesEncrypt(k, md5(le32(num)).take(16), data) else rc4(k, data)
  }

  private def bytesOf(o: PObj, what: String): Array[Byte] = o match {
    case PStr(b) => b
    case other   => throw new ParseError(s"/Encrypt $what not a string: $other")
  }

  /** Locate the /Encrypt dictionary (keyword trailer, or an xref
    * stream's dict for 1.5-layout files), validate the handler, derive
    * the file key from the EMPTY user password and verify it against
    * /U. None when the document is not encrypted; ParseError when it is
    * encrypted but unsupported or genuinely password-protected.
    */
  def findEncryption(doc: PdfDoc): Option[Encryption] = {
    val src: Option[Map[String, PObj]] =
      if (doc.trailer.m.contains("Encrypt")) Some(doc.trailer.m)
      else doc.objects.values.collectFirst {
        case PStream(d, _)
          if d.m.contains("Encrypt") &&
            doc.resolve(d.m.getOrElse("Type", PNull)) == PName("XRef") => d.m
      }
    src.flatMap { t =>
      val encObj = t("Encrypt") match { case PRef(n) => n; case _ => -1 }
      val enc = doc.dictOf(t("Encrypt")).m
      if (enc.isEmpty) throw new ParseError("/Encrypt is not a dictionary")
      if (doc.resolve(enc.getOrElse("Filter", PNull)) != PName("Standard"))
        throw new ParseError("unsupported security handler (not /Standard)")
      val v = numOf(doc, enc, "V", 0)
      val r = numOf(doc, enc, "R", 2)
      if (v == 5 && (r == 5 || r == 6)) Some(openV5(doc, enc, encObj, r))
      else {
        if (v < 1 || v > 4 || r < 2 || r > 4)
          throw new ParseError(s"unsupported encryption V=$v R=$r")
        val aes = v == 4 && {
          val cf = doc.dictOf(enc.getOrElse("CF", PNull)).m
          val std = doc.dictOf(cf.getOrElse("StdCF", PNull)).m
          doc.resolve(std.getOrElse("CFM", PNull)) match {
            case PName("AESV2") => true
            case PName("V2")    => false
            case other => throw new ParseError(s"unsupported crypt filter $other")
          }
        }
        val o = bytesOf(doc.resolve(enc.getOrElse("O", PNull)), "O")
        val u = bytesOf(doc.resolve(enc.getOrElse("U", PNull)), "U")
        val p = doc.resolve(enc.getOrElse("P", PNum(-1))) match {
          case PNum(d) => d.toLong.toInt // P may arrive as unsigned 2^32-k
          case _       => -1
        }
        val lengthBits = if (v == 1) 40 else numOf(doc, enc, "Length", 40)
        val encMeta = doc.resolve(enc.getOrElse("EncryptMetadata", PBool(true))) match {
          case PBool(b) => b; case _ => true
        }
        val id0 = doc.resolve(t.getOrElse("ID", PNull)) match {
          case PArr(items) if items.nonEmpty =>
            doc.resolve(items.head) match { case PStr(b) => b; case _ => Array.empty[Byte] }
          case _ => Array.empty[Byte]
        }
        val key = fileKey(Array.empty, o, p, id0, r, lengthBits, encMeta)
        val want = userEntry(key, id0, r)
        val ok =
          if (r == 2) java.util.Arrays.equals(want, u)
          else u.length >= 16 &&
            java.util.Arrays.equals(want.take(16), u.take(16))
        if (!ok)
          throw new ParseError("encrypted with a non-empty user password")
        Some(Encryption(key, aes, encObj))
      }
    }
  }

  /** Algorithm 2.A (ISO 32000-2 §7.6.4.3.3) for the EMPTY user
    * password: validate against /U's hash, unwrap the file key from
    * /UE, and verify /Perms integrity when present. CFM must be AESV3
    * when a crypt-filter dictionary is given.
    */
  private def openV5(doc: PdfDoc, enc: Map[String, PObj], encObj: Int,
                     r: Int): Encryption = {
    val cf = doc.dictOf(enc.getOrElse("CF", PNull)).m
    if (cf.nonEmpty) {
      val std = doc.dictOf(cf.getOrElse("StdCF", PNull)).m
      doc.resolve(std.getOrElse("CFM", PNull)) match {
        case PName("AESV3") | PNull => ()
        case other => throw new ParseError(s"unsupported V5 crypt filter $other")
      }
    }
    val u = bytesOf(doc.resolve(enc.getOrElse("U", PNull)), "U")
    val ue = bytesOf(doc.resolve(enc.getOrElse("UE", PNull)), "UE")
    if (u.length < 48 || ue.length != 32)
      throw new ParseError(s"V5 /U len ${u.length} or /UE len ${ue.length} malformed")
    val uHash = java.util.Arrays.copyOf(u, 32)
    val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
    val pw = Array.empty[Byte]
    val want =
      if (r == 6) hash2B(pw, vSalt, Array.empty) else sha256(pw, vSalt)
    if (!java.util.Arrays.equals(want, uHash))
      throw new ParseError("encrypted with a non-empty user password")
    val inter =
      if (r == 6) hash2B(pw, kSalt, Array.empty) else sha256(pw, kSalt)
    val fileKey = aesCbcNoPad(inter, new Array[Byte](16), ue, encrypt = false)
    // /Perms integrity (R6): decrypt with the file key, check the magic
    doc.resolve(enc.getOrElse("Perms", PNull)) match {
      case PStr(perms) if perms.length == 16 =>
        val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
        val blk = c.doFinal(perms)
        if (!(blk(9) == 'a'.toByte && blk(10) == 'd'.toByte && blk(11) == 'b'.toByte))
          throw new ParseError("/Perms integrity check failed (wrong file key?)")
      case _ => () // absent: tolerated (some R5 writers omit it)
    }
    Encryption(fileKey, aes = true, encObj, v5 = true)
  }

  private def numOf(doc: PdfDoc, m: Map[String, PObj], k: String, dflt: Int): Int =
    doc.resolve(m.getOrElse(k, PNull)) match {
      case PNum(d) => d.toInt
      case _       => dflt
    }

  /** Replacement objects with every string and stream body decrypted
    * under its per-object key. Skipped (spec §7.6.2): the /Encrypt
    * dictionary's own object, and xref streams (never encrypted — the
    * reader must parse them before it HAS the key). Generation numbers
    * are taken as 0, matching the parser's object model (crawl PDFs
    * with nonzero generations are vanishingly rare and fail closed:
    * the decrypted stream won't inflate and C5 isolates the row).
    */
  def decryptObjects(doc: PdfDoc, e: Encryption): Map[Int, PObj] = {
    def walk(num: Int, o: PObj): PObj = o match {
      case PStr(b)      => PStr(decryptBytes(e, num, 0, b))
      case PArr(items)  => PArr(items.map(walk(num, _)))
      case PDict(m)     => PDict(m.map { case (k2, v2) => k2 -> walk(num, v2) })
      case PStream(d, raw) =>
        PStream(walk(num, d).asInstanceOf[PDict], decryptBytes(e, num, 0, raw))
      case other => other
    }
    doc.objects.flatMap {
      case (num, _) if num == e.encObj => None
      case (num, st @ PStream(d, _))
        if doc.resolve(d.m.getOrElse("Type", PNull)) == PName("XRef") =>
        Some(num -> st)
      case (num, o) => Some(num -> walk(num, o))
    }
  }
}
