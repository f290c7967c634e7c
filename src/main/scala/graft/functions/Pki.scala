package graft.functions

import java.security.{KeyFactory, KeyPairGenerator, PrivateKey, PublicKey, Signature}
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}
import java.util.Base64
import javax.crypto.Cipher

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.Crypto public-key surface (reference `ecllibrary/std/Crypto.ecl`:
  * `PublicKeyEncryption` :125 and `PKEncryption` :181 — Encrypt / Decrypt /
  * Sign / VerifySignature over PEM key buffers; plugin
  * `plugins/cryptolib/cryptolib.cpp` drives OpenSSL EVP_PKEY). JDK
  * `java.security` RSA covers the whole contract with no new dependency:
  *
  *  - Sign / VerifySignature: SHA256withRSA — RSASSA-PKCS#1 v1.5, which is
  *    DETERMINISTIC (same key + message → same signature), so signing is
  *    oracle-gateable against openssl-produced literal vectors (q152).
  *  - Encrypt / Decrypt: RSA/ECB/OAEPWithSHA-256AndMGF1Padding. OAEP is
  *    randomized by design (semantic security), so encryption is gated by
  *    roundtrip + wrong-key specs, not value oracles.
  *
  * Keys travel as PEM strings (exactly the reference's key-buffer variant;
  * its key-filename variant is one `Files.readString` away). Parsed keys
  * are cached per PEM so executor-side UDF calls pay the ASN.1 parse once
  * per JVM, not per row.
  */
object Pki {

  private def pemBody(pem: String, kind: String): Array[Byte] = {
    val compact = pem.linesIterator
      .filterNot(l => l.contains("-----") || l.isBlank)
      .mkString
    require(pem.contains(s"BEGIN $kind"),
      s"expected a PEM '$kind' block (got: ${pem.take(40)}...)")
    Base64.getMimeDecoder.decode(compact)
  }

  // per-JVM parsed-key caches (PEM string → key); executor-safe
  private val privCache = new java.util.concurrent.ConcurrentHashMap[String, PrivateKey]()
  private val pubCache = new java.util.concurrent.ConcurrentHashMap[String, PublicKey]()

  /** Parse a PKCS#8 "BEGIN PRIVATE KEY" PEM. */
  def parsePrivateKey(pem: String): PrivateKey =
    privCache.computeIfAbsent(pem, p => KeyFactory.getInstance("RSA")
      .generatePrivate(new PKCS8EncodedKeySpec(pemBody(p, "PRIVATE KEY"))))

  /** Parse an X.509 SubjectPublicKeyInfo "BEGIN PUBLIC KEY" PEM. */
  def parsePublicKey(pem: String): PublicKey =
    pubCache.computeIfAbsent(pem, p => KeyFactory.getInstance("RSA")
      .generatePublic(new X509EncodedKeySpec(pemBody(p, "PUBLIC KEY"))))

  /** Fresh RSA keypair as (publicPem, privatePem) — the spec/test helper
    * (key GENERATION is inherently random; fixture keys gate the oracle).
    */
  def generateKeyPairPem(bits: Int = 2048): (String, String) = {
    val gen = KeyPairGenerator.getInstance("RSA")
    gen.initialize(bits)
    val kp = gen.generateKeyPair()
    def pem(kind: String, der: Array[Byte]) =
      s"-----BEGIN $kind-----\n" +
        Base64.getMimeEncoder(64, "\n".getBytes).encodeToString(der) +
        s"\n-----END $kind-----\n"
    (pem("PUBLIC KEY", kp.getPublic.getEncoded),
      pem("PRIVATE KEY", kp.getPrivate.getEncoded))
  }

  /** Crypto.PublicKeyEncryption.Sign: RSASSA-PKCS#1 v1.5 / SHA-256
    * signature (binary) of the column's bytes. Deterministic.
    */
  def sign(data: Column, privateKeyPem: String): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      val s = Signature.getInstance("SHA256withRSA")
      s.initSign(parsePrivateKey(privateKeyPem))
      s.update(if (bytes == null) Array.emptyByteArray else bytes)
      s.sign()
    }
    f(data.cast("binary"))
  }

  /** [[sign]] as lowercase hex (the oracle-friendly shape). */
  def signHex(data: Column, privateKeyPem: String): Column =
    lower(hex(sign(data, privateKeyPem)))

  /** Crypto.PublicKeyEncryption.VerifySignature: true iff `sig` is a valid
    * SHA256withRSA signature of `data` under the public key.
    */
  def verifySignature(sig: Column, data: Column,
      publicKeyPem: String): Column = {
    val f = udf { (sigBytes: Array[Byte], bytes: Array[Byte]) =>
      try {
        val s = Signature.getInstance("SHA256withRSA")
        s.initVerify(parsePublicKey(publicKeyPem))
        s.update(if (bytes == null) Array.emptyByteArray else bytes)
        s.verify(sigBytes)
      } catch { case _: Exception => false } // malformed sig = not valid
    }
    f(sig, data.cast("binary"))
  }

  /** Crypto.PublicKeyEncryption.Encrypt: RSA-OAEP(SHA-256) ciphertext of
    * the column's bytes. Plaintext must fit one RSA block (190 bytes at
    * 2048 bits) — same contract as the reference's pk-encrypt; wrap a
    * symmetric key ([[Crypto.aesEncrypt]]) for bulk data.
    */
  def encrypt(plain: Column, publicKeyPem: String): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      val c = Cipher.getInstance("RSA/ECB/OAEPWithSHA-256AndMGF1Padding")
      c.init(Cipher.ENCRYPT_MODE, parsePublicKey(publicKeyPem))
      c.doFinal(if (bytes == null) Array.emptyByteArray else bytes)
    }
    f(plain.cast("binary"))
  }

  /** Crypto.PublicKeyEncryption.Decrypt → UTF-8 string (null if the
    * ciphertext doesn't decrypt under this key — wrong key is data).
    */
  def decrypt(cipher: Column, privateKeyPem: String): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      try {
        val c = Cipher.getInstance("RSA/ECB/OAEPWithSHA-256AndMGF1Padding")
        c.init(Cipher.DECRYPT_MODE, parsePrivateKey(privateKeyPem))
        new String(c.doFinal(bytes), java.nio.charset.StandardCharsets.UTF_8)
      } catch { case _: Exception => null }
    }
    f(cipher)
  }
}
