package graft.sources.kafka

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Scram]] to the RFC 7677 §3 example exchange — the published
  * SCRAM-SHA-256 test vector (user "user", password "pencil") — so the
  * client leg (WireClient) and the test broker's server leg are both
  * anchored to the spec, not merely to each other. */
class ScramSpec extends AnyFunSuite {

  // RFC 7677 §3 fixed exchange
  private val user = "user"
  private val password = "pencil"
  private val clientNonce = "rOprNGfwEbeRWgbNEkqO"
  private val serverNonce = "rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
  private val saltB64 = "W22ZaJ0SNY7soEsUEjb6gQ=="
  private val iterations = 4096
  private val clientFirstBare = s"n=$user,r=$clientNonce"
  private val serverFirst = s"r=$serverNonce,s=$saltB64,i=$iterations"
  private val clientFinalNoProof = s"c=biws,r=$serverNonce"
  private val authMessage = s"$clientFirstBare,$serverFirst,$clientFinalNoProof"
  private val expectedProofB64 = "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
  private val expectedServerSigB64 = "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

  private def salt = Base64.getDecoder.decode(saltB64)

  test("RFC 7677 §3 vector: ClientProof") {
    val sp = Scram.saltedPassword("SHA-256", password, salt, iterations)
    val proof = Scram.clientProof("SHA-256", sp, authMessage)
    assert(Base64.getEncoder.encodeToString(proof) == expectedProofB64)
  }

  test("RFC 7677 §3 vector: ServerSignature") {
    val sp = Scram.saltedPassword("SHA-256", password, salt, iterations)
    val sig = Scram.serverSignature("SHA-256", sp, authMessage)
    assert(Base64.getEncoder.encodeToString(sig) == expectedServerSigB64)
  }

  test("RFC 7677 §3 vector: server-side proof verification") {
    val sp = Scram.saltedPassword("SHA-256", password, salt, iterations)
    val storedK = Scram.storedKey("SHA-256", Scram.clientKey("SHA-256", sp))
    val proof = Base64.getDecoder.decode(expectedProofB64)
    assert(Scram.verifyClientProof("SHA-256", storedK, authMessage, proof))
  }

  test("wrong password fails proof verification") {
    val spRight = Scram.saltedPassword("SHA-256", password, salt, iterations)
    val storedK = Scram.storedKey("SHA-256", Scram.clientKey("SHA-256", spRight))
    val spWrong = Scram.saltedPassword("SHA-256", "pencil2", salt, iterations)
    val badProof = Scram.clientProof("SHA-256", spWrong, authMessage)
    assert(!Scram.verifyClientProof("SHA-256", storedK, authMessage, badProof))
  }

  test("peer-controlled wrong-length proof is a clean auth failure, not an exception") {
    val sp = Scram.saltedPassword("SHA-256", password, salt, iterations)
    val storedK = Scram.storedKey("SHA-256", Scram.clientKey("SHA-256", sp))
    assert(!Scram.verifyClientProof("SHA-256", storedK, authMessage, Array[Byte](1, 2, 3)))
    assert(!Scram.verifyClientProof("SHA-256", storedK, authMessage, new Array[Byte](64)))
    assert(!Scram.verifyClientProof("SHA-256", storedK, authMessage, null))
  }

  test("SHA-512 full round trip: proof verifies, signatures agree, and differs from SHA-256") {
    for (alg <- Seq("SHA-256", "SHA-512")) {
      val sp = Scram.saltedPassword(alg, password, salt, iterations)
      val storedK = Scram.storedKey(alg, Scram.clientKey(alg, sp))
      val proof = Scram.clientProof(alg, sp, authMessage)
      assert(Scram.verifyClientProof(alg, storedK, authMessage, proof), alg)
      assert(proof.length == (if (alg == "SHA-512") 64 else 32), alg)
    }
    // cross-alg: a SHA-512 proof must NOT verify against SHA-256 state
    val sp512 = Scram.saltedPassword("SHA-512", password, salt, iterations)
    val storedK256 = Scram.storedKey("SHA-256",
      Scram.clientKey("SHA-256", Scram.saltedPassword("SHA-256", password, salt, iterations)))
    val proof512 = Scram.clientProof("SHA-512", sp512, authMessage)
    assert(!Scram.verifyClientProof("SHA-256", storedK256, authMessage, proof512))
  }

  test("saslName escaping round-trips RFC 5802 §5.1 metacharacters") {
    val tricky = "a=b,c=d"
    assert(Scram.saslName(tricky) == "a=3Db=2Cc=3Dd")
    assert(Scram.unescapeSaslName(Scram.saslName(tricky)) == tricky)
  }

  test("parseAttrs keeps '=' inside values (base64 padding)") {
    val attrs = Scram.parseAttrs(s"r=$clientNonce,s=$saltB64,i=4096")
    assert(attrs("s") == saltB64)
    assert(attrs("i") == "4096")
  }

  test("xor refuses mismatched operand lengths") {
    assertThrows[IllegalArgumentException](
      Scram.xor(Array[Byte](1, 2), Array[Byte](1, 2, 3)))
    val a = "abcd".getBytes(StandardCharsets.UTF_8)
    assert(java.util.Arrays.equals(Scram.xor(Scram.xor(a, a), a), a))
  }
}
