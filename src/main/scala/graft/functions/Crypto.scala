package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Std.Crypto surface (reference `ecllibrary/std/crypto/Hashing.ecl`,
  * `SymmetricEncryption.ecl`; plugin `plugins/cryptolib/cryptolib.cpp` —
  * OpenSSL EVP digests + ciphers). Spark ships codegen'd built-ins for every
  * digest the reference's Hashing module exports (md5/sha1/sha2 family) and
  * for AES, so the whole module is thin Column composition — no UDFs, stays
  * inside whole-stage codegen.
  *
  * Digests return lowercase hex like the reference's `ECL_HASH` outputs;
  * AES helpers pass through Spark's `aes_encrypt`/`aes_decrypt` (GCM
  * default) — key sizes 16/24/32 bytes select AES-128/192/256, mirroring
  * the reference's aes-128/192/256 cipher suite selection.
  */
object Crypto {

  /** Hashing.MD5 — hex digest of the UTF-8 bytes. */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** Hashing.SHA1 — hex digest. */
  def sha1Hex(c: Column): Column = sha1(c.cast("binary"))

  /** Hashing.SHA224/256/384/512 via the SHA-2 family. */
  def sha2Hex(c: Column, bits: Int): Column = {
    require(Set(224, 256, 384, 512)(bits), s"unsupported SHA-2 width $bits")
    sha2(c.cast("binary"), bits)
  }

  /** SymmetricEncryption.Encrypt (aes-*-gcm): binary ciphertext. */
  def aesEncrypt(plain: Column, key: Column): Column =
    aes_encrypt(plain.cast("binary"), key.cast("binary"))

  /** SymmetricEncryption.Decrypt back to a UTF-8 string. */
  def aesDecrypt(cipher: Column, key: Column): Column =
    aes_decrypt(cipher, key.cast("binary")).cast("string")

  /** CRC32 of the UTF-8 bytes (reference `rtlCrc32` usage in output
    * checksums) — BIGINT like Spark's native crc32.
    */
  def crc32Of(c: Column): Column = crc32(c.cast("binary"))
}
