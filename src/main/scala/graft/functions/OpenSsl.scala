package graft.functions

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.OpenSSL surface (reference `ecllibrary/std/OpenSSL.ecl`: Digest /
  * Ciphers / PublicKey over `plugins/sslservices`). The reference proxies
  * OpenSSL EVP; this module re-expresses the same contracts on JDK
  * primitives — digests map to Spark's codegen'd built-ins wherever one
  * exists (md5/sha1/sha2 family; only SHA-3 needs a UDF), password
  * ciphers implement the PUBLIC EVP_BytesToKey derivation (verified
  * against `openssl enc` vectors in OpenSslSpec), and seal/unseal is the
  * standard hybrid envelope (per-recipient RSA-OAEP-wrapped content key +
  * AES-GCM payload — OpenSSL.ecl:221 RSASeal's multi-recipient shape).
  */
object OpenSsl {

  // ---- Digest (OpenSSL.ecl:22) -------------------------------------------

  /** Digest.AvailableAlgorithms analog: the names [[digestHex]] accepts. */
  val DigestAlgorithms: Seq[String] = Seq(
    "md5", "sha1", "sha224", "sha256", "sha384", "sha512",
    "sha3-224", "sha3-256", "sha3-384", "sha3-512")

  /** Digest.Hash by openssl algorithm name → lowercase hex. Every SHA-2
    * family name lowers to a codegen'd Spark built-in; SHA-3 falls back to
    * a MessageDigest UDF (no Catalyst native exists).
    */
  def digestHex(c: Column, algorithm: String): Column =
    algorithm.toLowerCase match {
      case "md5"    => md5(c.cast("binary"))
      case "sha1"   => sha1(c.cast("binary"))
      case "sha224" => sha2(c.cast("binary"), 224)
      case "sha256" => sha2(c.cast("binary"), 256)
      case "sha384" => sha2(c.cast("binary"), 384)
      case "sha512" => sha2(c.cast("binary"), 512)
      case sha3 if sha3.startsWith("sha3-") =>
        val jdkName = "SHA3-" + sha3.stripPrefix("sha3-")
        val f = udf { (bytes: Array[Byte]) =>
          if (bytes == null) null
          else java.security.MessageDigest.getInstance(jdkName)
            .digest(bytes).map("%02x".format(_)).mkString
        }
        f(c.cast("binary"))
      case other =>
        throw new IllegalArgumentException(s"unsupported digest: $other")
    }

  // ---- Ciphers (OpenSSL.ecl:56) ------------------------------------------

  /** cipher name → (keyBytes, ivBytes). CBC suites; GCM takes a 12-byte
    * nonce (IVSize contract, OpenSSL.ecl:91).
    */
  private val Suites: Map[String, (Int, Int)] = Map(
    "aes-128-cbc" -> (16, 16), "aes-192-cbc" -> (24, 16),
    "aes-256-cbc" -> (32, 16),
    "aes-128-gcm" -> (16, 12), "aes-256-gcm" -> (32, 12))

  /** Ciphers.AvailableAlgorithms analog. */
  val CipherAlgorithms: Seq[String] = Suites.keys.toSeq.sorted

  /** Ciphers.IVSize (OpenSSL.ecl:91). */
  def ivSize(algorithm: String): Int = suite(algorithm)._2

  /** Ciphers.SaltSize (OpenSSL.ecl:110 — fixed 8). */
  val SaltSize: Int = 8

  private def suite(name: String): (Int, Int) =
    Suites.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unsupported cipher: $name"))

  /** OpenSSL's EVP_BytesToKey with MD5, count=1 (the `openssl enc -md md5`
    * derivation — a PUBLIC algorithm: D_1 = MD5(pass||salt),
    * D_n = MD5(D_{n-1}||pass||salt), key||iv = D_1||D_2||…).
    */
  def evpBytesToKey(pass: Array[Byte], salt: Array[Byte],
      keyLen: Int, ivLen: Int): (Array[Byte], Array[Byte]) = {
    require(salt.isEmpty || salt.length == SaltSize,
      s"salt must be empty or $SaltSize bytes")
    val md = java.security.MessageDigest.getInstance("MD5")
    var block = Array.emptyByteArray
    val out = new java.io.ByteArrayOutputStream()
    while (out.size < keyLen + ivLen) {
      md.reset(); md.update(block); md.update(pass); md.update(salt)
      block = md.digest(); out.write(block, 0, block.length)
    }
    val all = out.toByteArray
    (all.slice(0, keyLen), all.slice(keyLen, keyLen + ivLen))
  }

  private def jdkTransform(name: String): String =
    if (name.endsWith("gcm")) "AES/GCM/NoPadding" else "AES/CBC/PKCS5Padding"

  private def initCipher(mode: Int, name: String, key: Array[Byte],
      iv: Array[Byte]): Cipher = {
    val c = Cipher.getInstance(jdkTransform(name))
    val k = new SecretKeySpec(key, "AES")
    if (name.endsWith("gcm"))
      c.init(mode, k, new GCMParameterSpec(128, iv))
    else c.init(mode, k, new IvParameterSpec(iv))
    c
  }

  /** Ciphers.Encrypt (OpenSSL.ecl:147): passphrase + salt derive key/iv
    * via [[evpBytesToKey]] (pass `iv` to override the derived one, as the
    * reference allows). Output is RAW ciphertext bytes — bit-identical to
    * `openssl enc -<name> -md md5 -pass pass:… -S <salt>` (vectors pinned
    * in OpenSslSpec). Key derivation happens ONCE on the driver; the
    * per-row UDF only runs the block cipher.
    *
    * One (key, iv) pair serves EVERY row of the column, which is exactly
    * the CBC `openssl enc` contract — but for the GCM suites nonce reuse
    * across distinct plaintexts forfeits authenticity AND confidentiality,
    * so GCM is REJECTED here: use [[cipherEncryptGcm]] with a per-row iv
    * column, or [[rsaSeal]] (fresh key+nonce per envelope).
    */
  def cipherEncrypt(plain: Column, algorithm: String, passphrase: String,
      saltHex: String, ivHex: String = ""): Column = {
    require(!algorithm.endsWith("gcm"),
      s"$algorithm with one shared iv across a column reuses the GCM nonce; " +
        "use cipherEncryptGcm(plain, ivCol, ...) or rsaSeal")
    val (key, iv) = deriveKeyIv(algorithm, passphrase, saltHex, ivHex)
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else initCipher(Cipher.ENCRYPT_MODE, algorithm, key, iv).doFinal(bytes)
    }
    f(plain.cast("binary"))
  }

  /** GCM suites over a column require a DISTINCT 12-byte nonce per row —
    * supplied as a binary column (a row id, counter, or random bytes;
    * uniqueness per (passphrase, salt) is the caller's contract, as with
    * any AEAD API). Key derivation is EVP_BytesToKey as [[cipherEncrypt]];
    * the derived iv is ignored in favor of `iv`.
    */
  def cipherEncryptGcm(plain: Column, iv: Column, algorithm: String,
      passphrase: String, saltHex: String): Column = {
    require(algorithm.endsWith("gcm"), s"$algorithm is not a GCM suite")
    val (key, _) = deriveKeyIv(algorithm, passphrase, saltHex, "")
    val f = udf { (bytes: Array[Byte], ivb: Array[Byte]) =>
      if (bytes == null || ivb == null) null
      else initCipher(Cipher.ENCRYPT_MODE, algorithm, key, ivb).doFinal(bytes)
    }
    f(plain.cast("binary"), iv)
  }

  /** Decrypt counterpart of [[cipherEncryptGcm]] (per-row iv column);
    * authentication failure is data (null), not an exception.
    */
  def cipherDecryptGcm(cipher: Column, iv: Column, algorithm: String,
      passphrase: String, saltHex: String): Column = {
    require(algorithm.endsWith("gcm"), s"$algorithm is not a GCM suite")
    val (key, _) = deriveKeyIv(algorithm, passphrase, saltHex, "")
    val f = udf { (bytes: Array[Byte], ivb: Array[Byte]) =>
      if (bytes == null || ivb == null) null
      else try new String(
        initCipher(Cipher.DECRYPT_MODE, algorithm, key, ivb).doFinal(bytes),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: Exception => null }
    }
    f(cipher, iv)
  }

  /** Ciphers.Decrypt (OpenSSL.ecl:182) → UTF-8 string; wrong key/salt is
    * data (null), not an exception — the Pki.decrypt contract.
    */
  def cipherDecrypt(cipher: Column, algorithm: String, passphrase: String,
      saltHex: String, ivHex: String = ""): Column = {
    val (key, iv) = deriveKeyIv(algorithm, passphrase, saltHex, ivHex)
    val f = udf { (bytes: Array[Byte]) =>
      try new String(
        initCipher(Cipher.DECRYPT_MODE, algorithm, key, iv).doFinal(bytes),
        java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: Exception => null }
    }
    f(cipher)
  }

  private def deriveKeyIv(algorithm: String, passphrase: String,
      saltHex: String, ivHex: String): (Array[Byte], Array[Byte]) = {
    val (kl, il) = suite(algorithm)
    val salt = hexBytes(saltHex)
    val (key, derivedIv) = evpBytesToKey(
      passphrase.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      salt, kl, il)
    val iv = if (ivHex.nonEmpty) hexBytes(ivHex) else derivedIv
    require(iv.length == il, s"$algorithm needs a $il-byte iv")
    (key, iv)
  }

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- PublicKey hybrid seal (OpenSSL.ecl:221 RSASeal/RSAUnseal) ---------

  private val SealMagic = "GSL1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** RSASeal: encrypt once under a fresh AES-256-GCM content key, wrap the
    * key for EVERY recipient public key with RSA-OAEP(SHA-256) — N
    * recipients cost N·256 bytes of header, not N copies of the payload
    * (the reference's multi-recipient seal contract). Envelope:
    * "GSL1" | u8 nRec | nRec × (u16 len, wrapped key) | 12B iv | GCM body.
    */
  def rsaSeal(plain: Array[Byte], recipientPems: Seq[String],
      rnd: java.security.SecureRandom = new java.security.SecureRandom)
      : Array[Byte] = {
    require(recipientPems.nonEmpty && recipientPems.size < 256,
      "1..255 recipients")
    val key = new Array[Byte](32); rnd.nextBytes(key)
    val iv = new Array[Byte](12); rnd.nextBytes(iv)
    val body = initCipher(Cipher.ENCRYPT_MODE, "aes-256-gcm", key, iv)
      .doFinal(plain)
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.write(SealMagic); d.writeByte(recipientPems.size)
    recipientPems.foreach { pem =>
      val c = Cipher.getInstance("RSA/ECB/OAEPWithSHA-256AndMGF1Padding")
      c.init(Cipher.ENCRYPT_MODE, Pki.parsePublicKey(pem))
      val wrapped = c.doFinal(key)
      d.writeShort(wrapped.length); d.write(wrapped)
    }
    d.write(iv); d.write(body); d.flush()
    out.toByteArray
  }

  /** RSAUnseal: try every wrapped key slot under this private key; None if
    * the key opens no slot or the envelope is malformed/tampered (GCM tag
    * authenticates the body).
    */
  def rsaUnseal(envelope: Array[Byte], privatePem: String)
      : Option[Array[Byte]] = {
    try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(envelope))
      val magic = new Array[Byte](4); in.readFully(magic)
      if (!java.util.Arrays.equals(magic, SealMagic)) return None
      val nRec = in.readUnsignedByte()
      val wrapped = (0 until nRec).map { _ =>
        val w = new Array[Byte](in.readUnsignedShort()); in.readFully(w); w
      }
      val iv = new Array[Byte](12); in.readFully(iv)
      val body = new Array[Byte](in.available()); in.readFully(body)
      val priv = Pki.parsePrivateKey(privatePem)
      wrapped.view.flatMap { w =>
        try {
          val c = Cipher.getInstance("RSA/ECB/OAEPWithSHA-256AndMGF1Padding")
          c.init(Cipher.DECRYPT_MODE, priv)
          val key = c.doFinal(w)
          Some(initCipher(Cipher.DECRYPT_MODE, "aes-256-gcm", key, iv)
            .doFinal(body))
        } catch { case _: Exception => None }
      }.headOption
    } catch { case _: Exception => None }
  }

  /** Column wrapper: seal each row's bytes to the recipients. */
  def rsaSealCol(plain: Column, recipientPems: Seq[String]): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else rsaSeal(bytes, recipientPems)
    }
    f(plain.cast("binary"))
  }

  /** Column wrapper: unseal → UTF-8 string, null when this key can't. */
  def rsaUnsealCol(envelope: Column, privatePem: String): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else rsaUnseal(bytes, privatePem)
        .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
        .orNull
    }
    f(envelope)
  }
}
