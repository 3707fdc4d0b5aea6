package graft.sources

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.keytools.KmsClient

/** In-process KMS client for parquet modular encryption (reference:
  * /root/reference/datafusion/sqllogictest/test_files/encrypted_parquet.slt
  * — the reference encrypts/decrypts parquet with named master keys; Spark's
  * equivalent surface is parquet-mr's `PropertiesDrivenCryptoFactory` +
  * a pluggable `KmsClient`).
  *
  * This client derives each master key deterministically from its key id
  * (SHA-256 of a fixed prefix + id, truncated to AES-128) and wraps parquet's
  * per-file data-encryption keys with AES-GCM under a random IV. That makes
  * it self-contained — no external service, same keys in every JVM — which
  * is exactly what the correctness gate needs: the DATA path (AES-GCM module
  * encryption, encrypted footers, per-column keys, key wrapping/unwrapping,
  * the "PARE" magic) is the real parquet-mr machinery end to end; ONLY the
  * master-key custody is demo-grade. A production deployment swaps this one
  * class for a client of the org's KMS (the interface is three methods) and
  * nothing else changes — key custody is deliberately parquet's pluggable
  * boundary.
  */
class GraftKmsClient extends KmsClient {

  override def initialize(configuration: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = {
    // Loud by design (ADVICE r7): if this class is ever wired against real
    // data the deterministic demo custody must be visible in driver logs.
    org.slf4j.LoggerFactory.getLogger(classOf[GraftKmsClient]).warn(
      "GraftKmsClient uses deterministic demo master keys derived from the " +
        "key id — suitable for tests only, NOT for production data. Swap in " +
        "a real KMS-backed KmsClient for any non-demo deployment.")
  }

  private def masterKey(keyId: String): SecretKeySpec = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(s"graft-demo-master-$keyId".getBytes("UTF-8"))
    new SecretKeySpec(java.util.Arrays.copyOf(digest, 16), "AES")
  }

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String = {
    val iv = new Array[Byte](12)
    new java.security.SecureRandom().nextBytes(iv)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, masterKey(masterKeyIdentifier),
      new GCMParameterSpec(128, iv))
    val ct = cipher.doFinal(keyBytes)
    java.util.Base64.getEncoder.encodeToString(iv ++ ct)
  }

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] = {
    val raw = java.util.Base64.getDecoder.decode(wrappedKey)
    val (iv, ct) = raw.splitAt(12)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, masterKey(masterKeyIdentifier),
      new GCMParameterSpec(128, iv))
    cipher.doFinal(ct)
  }
}
