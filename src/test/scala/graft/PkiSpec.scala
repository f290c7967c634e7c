package graft

import graft.functions.Pki
import graft.queries.PkiFixture
import org.apache.spark.sql.functions._

/** Std.Crypto public-key surface (Crypto.ecl PublicKeyEncryption /
  * PKEncryption): sign→verify, encrypt→decrypt, wrong-key and tamper
  * failure modes. The VALUE-level signature gate (vs openssl vectors) is
  * q152; these specs cover the randomized (OAEP) and negative paths no
  * static oracle can.
  */
class PkiSpec extends SparkSpec {
  import spark.implicits._

  private val msgs = Seq((1L, "alpha"), (2L, ""), (3L, "Ḽơᶉëᶆ"))
    .toDF("id", "msg")

  test("sign → verify roundtrip; tampered data and foreign keys fail") {
    val (otherPub, otherPriv) = Pki.generateKeyPairPem()
    val got = msgs.select(col("id"),
        Pki.verifySignature(Pki.sign(col("msg"), PkiFixture.PrivatePem),
          col("msg"), PkiFixture.PublicPem).as("ok"),
        Pki.verifySignature(Pki.sign(col("msg"), PkiFixture.PrivatePem),
          concat(col("msg"), lit("!")), PkiFixture.PublicPem).as("tampered"),
        Pki.verifySignature(Pki.sign(col("msg"), otherPriv),
          col("msg"), PkiFixture.PublicPem).as("foreign"),
        Pki.verifySignature(Pki.sign(col("msg"), otherPriv),
          col("msg"), otherPub).as("foreignOk"))
      .collect()
    assert(got.forall(_.getBoolean(1)))
    assert(got.forall(!_.getBoolean(2)))
    assert(got.forall(!_.getBoolean(3)))
    assert(got.forall(_.getBoolean(4)))
    // garbage signature bytes are rejected, not an exception
    val junk = msgs.select(Pki.verifySignature(lit(Array[Byte](1, 2, 3)),
      col("msg"), PkiFixture.PublicPem).as("v")).collect()
    assert(junk.forall(!_.getBoolean(0)))
  }

  test("signatures are deterministic (PKCS#1 v1.5) and key-cached") {
    val a = msgs.select(Pki.signHex(col("msg"), PkiFixture.PrivatePem))
      .as[String].collect()
    val b = msgs.select(Pki.signHex(col("msg"), PkiFixture.PrivatePem))
      .as[String].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_.length == 512)) // 2048-bit key → 256-byte signature
  }

  test("encrypt → decrypt roundtrip; wrong key decrypts to null") {
    val (_, otherPriv) = Pki.generateKeyPairPem()
    val got = msgs.select(col("msg"),
        Pki.decrypt(Pki.encrypt(col("msg"), PkiFixture.PublicPem),
          PkiFixture.PrivatePem).as("rt"),
        Pki.decrypt(Pki.encrypt(col("msg"), PkiFixture.PublicPem),
          otherPriv).as("wrong"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(0))
      assert(r.isNullAt(2))
    }
    // OAEP is randomized: two encryptions of one plaintext differ
    val c = msgs.filter($"id" === 1).select(
        Pki.encrypt(col("msg"), PkiFixture.PublicPem).as("c1"),
        Pki.encrypt(col("msg"), PkiFixture.PublicPem).as("c2"))
      .collect().head
    assert(!java.util.Arrays.equals(
      c.getAs[Array[Byte]](0), c.getAs[Array[Byte]](1)))
  }
}
