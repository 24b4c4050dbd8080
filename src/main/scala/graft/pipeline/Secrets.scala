package graft.pipeline

import java.security.SecureRandom

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** AES-256-GCM secrets encryption — the reference's encryption service
  * (glassflow-api/internal/encryption/encryption.go: 32-byte key, GCM,
  * random nonce prefixed to the ciphertext). Used by the durable pipeline
  * store so connection credentials never sit on disk in plaintext. */
final class Secrets(key: Array[Byte]) {
  require(key.length == 32, s"encryption key must be 32 bytes, got ${key.length}")

  private val spec = new SecretKeySpec(key, "AES")
  private val rnd = new SecureRandom()
  private val NonceBytes = 12
  private val TagBits = 128

  def encrypt(plaintext: Array[Byte]): Array[Byte] = {
    val nonce = new Array[Byte](NonceBytes)
    rnd.nextBytes(nonce)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, spec, new GCMParameterSpec(TagBits, nonce))
    nonce ++ c.doFinal(plaintext)
  }

  /** Throws on tampered/truncated ciphertext or a wrong key (GCM auth). */
  def decrypt(ciphertext: Array[Byte]): Array[Byte] = {
    require(ciphertext.length > NonceBytes, "ciphertext too short")
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, spec,
      new GCMParameterSpec(TagBits, ciphertext, 0, NonceBytes))
    c.doFinal(ciphertext, NonceBytes, ciphertext.length - NonceBytes)
  }

  def encryptString(s: String): String =
    java.util.Base64.getEncoder.encodeToString(encrypt(s.getBytes("UTF-8")))

  def decryptString(s: String): String =
    new String(decrypt(java.util.Base64.getDecoder.decode(s)), "UTF-8")
}
