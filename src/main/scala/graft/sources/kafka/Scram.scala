package graft.sources.kafka

import java.nio.charset.StandardCharsets

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM primitives per RFC 5802 (SCRAM-SHA-256 profile: RFC 7677) —
  * shared by the [[WireClient]] client leg and the test broker's server
  * leg so both sides are pinned to the same math, and unit-testable
  * against the RFC 7677 §3 example exchange (user "user", password
  * "pencil"). Kafka's SASL/SCRAM support (KIP-84) is exactly this
  * algorithm; reference config surface:
  * glassflow-api/internal/kafka/consumer.go:141-210 (SCRAM-256/512 legs).
  */
object Scram {

  private def hmacAlg(alg: String) = alg match {
    case "SHA-256" => "HmacSHA256"
    case "SHA-512" => "HmacSHA512"
    case other => throw new IllegalArgumentException(s"unsupported SCRAM hash $other")
  }

  private def pbkdf2Alg(alg: String) = alg match {
    case "SHA-256" => "PBKDF2WithHmacSHA256"
    case "SHA-512" => "PBKDF2WithHmacSHA512"
    case other => throw new IllegalArgumentException(s"unsupported SCRAM hash $other")
  }

  private def keyLenBits(alg: String) = if (alg == "SHA-512") 512 else 256

  def hmac(alg: String, key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance(hmacAlg(alg))
    mac.init(new SecretKeySpec(key, hmacAlg(alg)))
    mac.doFinal(msg)
  }

  def hash(alg: String, msg: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance(alg).digest(msg)

  /** Hi(password, salt, i) — PBKDF2 with HMAC-hash, RFC 5802 §2.2. */
  def saltedPassword(alg: String, password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val f = javax.crypto.SecretKeyFactory.getInstance(pbkdf2Alg(alg))
    f.generateSecret(new PBEKeySpec(password.toCharArray, salt, iterations,
      keyLenBits(alg))).getEncoded
  }

  def clientKey(alg: String, saltedPwd: Array[Byte]): Array[Byte] =
    hmac(alg, saltedPwd, "Client Key".getBytes(StandardCharsets.UTF_8))

  def storedKey(alg: String, clientKey: Array[Byte]): Array[Byte] = hash(alg, clientKey)

  def serverKey(alg: String, saltedPwd: Array[Byte]): Array[Byte] =
    hmac(alg, saltedPwd, "Server Key".getBytes(StandardCharsets.UTF_8))

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"SCRAM xor operands differ in length (${a.length} vs ${b.length})")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  /** ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage). */
  def clientProof(alg: String, saltedPwd: Array[Byte], authMessage: String): Array[Byte] = {
    val ck = clientKey(alg, saltedPwd)
    val sig = hmac(alg, storedKey(alg, ck), authMessage.getBytes(StandardCharsets.UTF_8))
    xor(ck, sig)
  }

  /** ServerSignature = HMAC(ServerKey, AuthMessage) — what the server's
    * final message must carry for the client to trust it. */
  def serverSignature(alg: String, saltedPwd: Array[Byte], authMessage: String): Array[Byte] =
    hmac(alg, serverKey(alg, saltedPwd),
      authMessage.getBytes(StandardCharsets.UTF_8))

  /** Server-side proof check: recover ClientKey = proof XOR
    * HMAC(StoredKey, AuthMessage), then H(ClientKey) must equal StoredKey.
    * The server never needs the password itself — only StoredKey. */
  def verifyClientProof(alg: String, storedK: Array[Byte], authMessage: String,
                        proof: Array[Byte]): Boolean = {
    val sig = hmac(alg, storedK, authMessage.getBytes(StandardCharsets.UTF_8))
    // The proof is peer-controlled: a wrong-length one is simply a failed
    // authentication, never an ArrayIndexOutOfBounds from xor.
    if (proof == null || proof.length != sig.length) return false
    val ck = xor(proof, sig)
    java.security.MessageDigest.isEqual(hash(alg, ck), storedK)
  }

  /** RFC 5802 §5.1: ',' and '=' in usernames escape as =2C / =3D. */
  def saslName(user: String): String =
    user.replace("=", "=3D").replace(",", "=2C")

  def unescapeSaslName(n: String): String =
    n.replace("=2C", ",").replace("=3D", "=")

  /** Parse "k=v,k=v" SCRAM message attrs (values may contain '='). */
  def parseAttrs(msg: String): Map[String, String] =
    msg.split(',').iterator.filter(_.length >= 2).map { kv =>
      kv.substring(0, 1) -> kv.substring(2)
    }.toMap

  def freshNonce(): String = {
    val rnd = new java.security.SecureRandom()
    val b = new Array[Byte](18)
    rnd.nextBytes(b)
    // printable, no ',' per RFC 5802 nonce grammar
    java.util.Base64.getEncoder.encodeToString(b).replace("+", "-").replace("/", "_")
  }
}
