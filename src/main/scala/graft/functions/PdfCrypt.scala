package graft.functions

/** ISO 32000-1 §7.6.3 standard security handler, EMPTY-USER-PASSWORD
  * decryption — the owner-password-only protection a large fraction of
  * real-world "encrypted" PDFs actually use (the file is openable by any
  * reader; only permissions are asserted). [[PdfText]]/[[PdfInfo]] call
  * [[decryptorFor]] when the `/Encrypt` token is present: if the
  * standard handler validates the EMPTY user password against `/U`, the
  * returned [[Decryptor]] decrypts stream bodies and Info strings with
  * the per-object key; anything else (a real user password, a
  * non-Standard filter, V5/AES-256, an /Identity crypt filter) returns
  * null and the kernels keep their NULL-for-encrypted behavior.
  *
  * Supported: V1 (RC4-40), V2 (RC4, /Length up to 128), V4 with a
  * /CFM /AESV2 or /V2 crypt filter, R 2/3/4 — and V5 (AES-256, /CFM
  * /AESV3) with R5 (the deprecated Adobe ExtensionLevel-3 single
  * SHA-256) and R6 (ISO 32000-2 Algorithm 2.B: the iterated
  * SHA-256/384/512 + AES-128-CBC hardening loop), where the empty user
  * password validates against U[0:32] over the validation salt
  * U[32:40], the intermediate key hashes over the key salt U[40:48],
  * and the 32-byte FILE key decrypts from /UE (AES-256-CBC, zero IV);
  * V5 data uses the file key DIRECTLY — no per-object derivation — with
  * the same IV-prefix + PKCS#5 framing. All pure JDK (MessageDigest
  * MD5/SHA-2, a 15-line RC4, AES via javax.crypto). Key
  * derivation is Algorithm 2 (MD5 over the 32-byte pad + /O + /P as
  * little-endian int32 + ID[0], the R≥4 EncryptMetadata=false FFFFFFFF
  * suffix, 50 MD5 iterations for R≥3); the empty user password verifies
  * via Algorithm 6 (R2: RC4(key, pad) == U; R≥3: the 19-pass XOR-key
  * RC4 chain over MD5(pad ‖ ID[0]), first 16 bytes compared). Per-object
  * keys are Algorithm 1 (MD5(key ‖ obj₃ ‖ gen₂ [‖ sAlT for AES]),
  * truncated to min(len+5, 16)); AES payloads carry a 16-byte IV prefix
  * and PKCS#5 padding (validated — a bad pad is null, never a throw).
  *
  * Parsing reuses [[PdfText]]'s raw-byte discipline: the LAST `/Encrypt`
  * reference wins (incremental updates), the dict resolves through the
  * last `N G obj` header, /O and /U accept literal or hex strings,
  * /ID's first element supplies ID[0] (absent → empty, per the spec's
  * "if the document has no ID" allowance). Never throws on adversarial
  * bytes — every malformation is a null.
  */
private[functions] object PdfCrypt {
  import PdfText._

  /** §7.6.3.3 Algorithm 2's 32-byte padding string. */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 (the spec's "RC4" cipher): KSA + PRGA, allocation-light. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
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

  def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  /** ISO 32000-2 Algorithm 2.B (R6 password hardening): iterate
    * SHA-256/384/512 selected by the AES-encrypted block's byte sum
    * mod 3, ≥ 64 rounds, until the last cipher byte ≤ round − 32.
    * `udata` is empty for user-password hashes. Pure JDK. */
  def alg2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha256(password, salt, udata)
    var e: Array[Byte] = null
    var i = 0
    var done = false
    while (!done) {
      val one = new Array[Byte](password.length + k.length + udata.length)
      System.arraycopy(password, 0, one, 0, password.length)
      System.arraycopy(k, 0, one, password.length, k.length)
      System.arraycopy(udata, 0, one, password.length + k.length, udata.length)
      val k1 = new Array[Byte](one.length * 64)
      var r = 0
      while (r < 64) { System.arraycopy(one, 0, k1, r * one.length, one.length); r += 1 }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      e = c.doFinal(k1)
      var sum = 0
      var t = 0
      while (t < 16) { sum += e(t) & 0xff; t += 1 }
      val alg = (sum % 3) match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      i += 1
      done = i >= 64 && (e(e.length - 1) & 0xff) <= i - 32
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** Per-object decryption under a validated file key. `v5` uses the
    * file key DIRECTLY (AES-256; V5 abolishes per-object keys). */
  final class Decryptor(val fileKey: Array[Byte], val aes: Boolean,
      val v5: Boolean = false) {

    private def objKey(num: Int, gen: Int): Array[Byte] = {
      val tail =
        if (aes)
          Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte,
            gen.toByte, (gen >> 8).toByte, 0x73, 0x41, 0x6c, 0x54)
        else
          Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte,
            gen.toByte, (gen >> 8).toByte)
      val h = md5(fileKey, tail)
      java.util.Arrays.copyOf(h, math.min(fileKey.length + 5, 16))
    }

    /** Decrypted bytes of a stream body / string value belonging to
      * object (num, gen) — null when the AES framing is malformed. */
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val k = if (v5) fileKey else objKey(num, gen)
      if (!aes) rc4(k, data)
      else {
        // 16-byte IV prefix + CBC blocks + PKCS#5 padding
        if (data.length < 32 || data.length % 16 != 0) return null
        try {
          val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(k, "AES"),
            new javax.crypto.spec.IvParameterSpec(data, 0, 16))
          val out = c.doFinal(data, 16, data.length - 16)
          val pad = out(out.length - 1) & 0xff
          if (pad < 1 || pad > 16 || pad > out.length) null
          else java.util.Arrays.copyOf(out, out.length - pad)
        } catch { case _: java.security.GeneralSecurityException => null }
      }
    }
  }

  /** The /P permissions value at i0 as a SIGNED 32-bit int, or null.
    * Producers write it both signed (-3904) and as the unsigned 32-bit
    * decimal (4294963392) — up to 10 digits, folded through two's
    * complement, exactly how a conforming reader treats the bit mask
    * (PdfText.parseUInt caps at 8 digits, too short for either form). */
  private def parsePermissions(b: Array[Byte], i0: Int, end: Int): Integer = {
    var i = i0
    val neg = i < end && b(i) == '-'
    if (neg) i += 1
    var v = 0L
    var digits = 0
    while (i < end && digits <= 10 && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0')
      i += 1
      digits += 1
    }
    if (digits == 0 || digits > 10 || v > 0xffffffffL) return null
    Integer.valueOf(if (neg) (-v).toInt else v.toInt)
  }

  /** String value (literal or hex) at `v`, as raw bytes — or null. */
  private def stringBytes(b: Array[Byte], v: Int, end: Int): Array[Byte] = {
    if (v >= end) return null
    val buf = new scala.collection.mutable.ArrayBuffer[String](1)
    if (b(v) == '(') literalString(b, v, buf, end, 1 << 16)
    else if (b(v) == '<' && (v + 1 >= end || b(v + 1) != '<'))
      hexString(b, v, buf, end, 1 << 16)
    else return null
    val s = buf.head
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < out.length) { out(i) = s.charAt(i).toByte; i += 1 }
    out
  }

  /** ID[0] of the LAST `/ID` entry, or empty when absent (the spec's
    * no-ID allowance feeds zero bytes into Algorithm 2). */
  private def firstId(b: Array[Byte]): Array[Byte] = {
    val pat = "/ID".getBytes
    val n = b.length
    var found: Array[Byte] = null
    var at = indexOf(b, pat, 0)
    while (at >= 0) {
      var i = at + pat.length
      if (i < n && (isWs(b(i)) || isDelim(b(i)))) {
        while (i < n && isWs(b(i))) i += 1
        if (i < n && b(i) == '[') {
          i += 1
          while (i < n && isWs(b(i))) i += 1
          val s = stringBytes(b, i, n)
          if (s != null) found = s
        }
      }
      at = indexOf(b, pat, at + 1)
    }
    if (found == null) Array.emptyByteArray else found
  }

  /** The LAST `/Encrypt N G R` reference's dict start (`<<`), or -1. */
  private def encryptDictStart(b: Array[Byte]): Int = {
    val pat = "/Encrypt".getBytes
    val n = b.length
    var num = -1
    var gen = -1
    var direct = -1
    var at = indexOf(b, pat, 0)
    while (at >= 0) {
      var i = at + pat.length
      if (i < n && (isWs(b(i)) || isDelim(b(i)))) {
        while (i < n && isWs(b(i))) i += 1
        if (i + 1 < n && b(i) == '<' && b(i + 1) == '<') {
          direct = i; num = -1 // direct dict in the trailer
        } else {
          val (nn, i2) = parseUInt(b, i, n)
          if (nn >= 0) {
            var j = i2
            while (j < n && isWs(b(j))) j += 1
            val (gg, j2) = parseUInt(b, j, n)
            if (gg >= 0) {
              var r = j2
              while (r < n && isWs(b(r))) r += 1
              if (r < n && b(r) == 'R' &&
                (r + 1 >= n || isWs(b(r + 1)) || isDelim(b(r + 1)))) {
                num = nn; gen = gg; direct = -1
              }
            }
          }
        }
      }
      at = indexOf(b, pat, at + 1)
    }
    if (direct >= 0) return direct
    if (num < 0) return -1
    val objAt = PdfInfo.lastObjStart(b, num, gen)
    if (objAt < 0) return -1
    var k = objAt
    while (k < n && isWs(b(k))) k += 1
    if (k + 2 <= n && b(k) == '<' && b(k + 1) == '<') k else -1
  }

  /** Validated empty-user-password [[Decryptor]] for `b`, or null —
    * null preserves the kernels' NULL-for-encrypted behavior for
    * everything this handler does not cover. */
  def decryptorFor(b: Array[Byte]): Decryptor = {
    val d0 = encryptDictStart(b)
    if (d0 < 0) return null
    val dEnd = skipDict(b, d0)
    if (dEnd < 0) return null
    val body1 = dEnd - 2
    var filterStd = false
    var v = 0
    var r = 0
    var p: Integer = null
    var lengthBits = 40
    var o: Array[Byte] = null
    var u: Array[Byte] = null
    var ue: Array[Byte] = null
    var encryptMetadata = true
    var cfm: String = null
    var identity = false
    walkDictKeys(b, d0 + 2, body1) { (key, at) =>
      key match {
        case "Filter" =>
          if (at < body1 && b(at) == '/') filterStd = nameAt(b, at, body1) == "Standard"
        case "V" => v = math.max(0, parseUInt(b, at, body1)._1)
        case "R" => r = math.max(0, parseUInt(b, at, body1)._1)
        case "P" => p = parsePermissions(b, at, body1)
        case "Length" =>
          val l = parseUInt(b, at, body1)._1
          if (l > 0) lengthBits = l
        case "O" => o = stringBytes(b, at, body1)
        case "U" => u = stringBytes(b, at, body1)
        case "UE" => ue = stringBytes(b, at, body1)
        case "EncryptMetadata" =>
          if (at + 5 <= body1 && regionMatches(b, at, "false".getBytes))
            encryptMetadata = false
        case "CF" =>
          // crypt-filter dict: the /CFM name decides the cipher; any
          // /Identity leaves parts unencrypted — out of scope
          if (at + 1 < body1 && b(at) == '<' && b(at + 1) == '<') {
            val ce = skipDict(b, at)
            if (ce > 0) {
              val cfPat = "/CFM".getBytes
              var ca = indexOf(b, cfPat, at)
              while (ca >= 0 && ca < ce) {
                var ci = ca + cfPat.length
                if (ci < ce && (isWs(b(ci)) || isDelim(b(ci)))) {
                  while (ci < ce && isWs(b(ci))) ci += 1
                  if (ci < ce && b(ci) == '/') cfm = nameAt(b, ci, ce)
                }
                ca = indexOf(b, cfPat, ca + 1)
              }
            }
          }
        case "StmF" | "StrF" =>
          if (at < body1 && b(at) == '/' && nameAt(b, at, body1) == "Identity")
            identity = true
        case _ => ()
      }
    }
    if (!filterStd || o == null || u == null || p == null) return null
    if (o.length < 32 || u.length < 16) return null
    if (identity) return null
    if (v == 5) {
      // AES-256 (AESV3): R6 per ISO 32000-2 §7.6.4, R5 the deprecated
      // Adobe ExtensionLevel-3 form. U = hash(32) ‖ validationSalt(8) ‖
      // keySalt(8); the EMPTY user password validates when
      // hash(pwd, validationSalt) == U[0:32]; the 32-byte file key
      // decrypts from /UE under hash(pwd, keySalt), AES-256-CBC, zero IV.
      if (r != 5 && r != 6) return null
      if (cfm != "AESV3") return null
      if (u.length < 48 || ue == null || ue.length < 32) return null
      val vs = java.util.Arrays.copyOfRange(u, 32, 40)
      val ks = java.util.Arrays.copyOfRange(u, 40, 48)
      val empty = Array.emptyByteArray
      val hash = if (r == 5) sha256(vs) else alg2B(empty, vs, empty)
      if (!java.util.Arrays.equals(hash, java.util.Arrays.copyOfRange(u, 0, 32)))
        return null // a real user password, or not Standard-shaped
      val ik = if (r == 5) sha256(ks) else alg2B(empty, ks, empty)
      try {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(ik, "AES"),
          new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
        val fk = c.doFinal(java.util.Arrays.copyOf(ue, 32))
        return new Decryptor(fk, aes = true, v5 = true)
      } catch {
        case _: java.security.GeneralSecurityException => return null
      }
    }
    val aes = v == 4 && cfm == "AESV2"
    val okV = v == 1 || v == 2 || (v == 4 && (aes || cfm == "V2"))
    if (!okV || r < 2 || r > 4) return null
    val keyLen =
      if (r == 2 || v == 1) 5
      else math.max(5, math.min(16, lengthBits / 8))
    val id0 = firstId(b)
    val o32 = java.util.Arrays.copyOf(o, 32)
    val pi = p.intValue()
    val pLe = Array[Byte](pi.toByte, (pi >> 8).toByte, (pi >> 16).toByte, (pi >> 24).toByte)
    val metaSuffix =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
      else Array.emptyByteArray
    var key = java.util.Arrays.copyOf(md5(Pad, o32, pLe, id0, metaSuffix), keyLen)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = java.util.Arrays.copyOf(md5(key), keyLen); i += 1 }
    }
    // Algorithm 6: does the EMPTY user password reproduce /U?
    val valid =
      if (r == 2) {
        val enc = rc4(key, Pad)
        java.util.Arrays.equals(enc, java.util.Arrays.copyOf(u, 32))
      } else {
        var enc = rc4(key, md5(Pad, id0))
        var i = 1
        while (i <= 19) {
          val ki = new Array[Byte](key.length)
          var t = 0
          while (t < key.length) { ki(t) = (key(t) ^ i).toByte; t += 1 }
          enc = rc4(ki, enc)
          i += 1
        }
        java.util.Arrays.equals(enc, java.util.Arrays.copyOfRange(u, 0, 16))
      }
    if (!valid) null else new Decryptor(key, aes)
  }
}
