package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's ClickHouse error-classification table 1:1
  * (glassflow-api/internal/sink/errors/classification.go:43-105,
  * classification_test.go) — every code the reference enumerates must
  * classify identically here, both by raw code and through the wrapped
  * throwable chain the JDBC/foreachBatch path actually surfaces. */
class ErrorClassifierSpec extends AnyFunSuite {
  import ErrorClassifier._

  /** classification.go retryableCodes — the reference's exact list. */
  private val referenceRetryable = Seq(
    159 -> "TimeoutExceeded", 202 -> "TooManySimultaneousQueries",
    203 -> "NoFreeConnection", 209 -> "SocketTimeout",
    210 -> "NetworkError", 241 -> "MemoryLimitExceeded",
    242 -> "TableIsReadOnly", 243 -> "NotEnoughSpace",
    244 -> "UnexpectedZookeeperError", 254 -> "NoActiveReplicas",
    265 -> "NoAvailableReplica", 285 -> "TooLessLiveReplicas",
    286 -> "UnsatisfiedQuorumForPreviousWrite", 279 -> "AllConnectionTriesFailed",
    297 -> "ShardHasNoConnections", 289 -> "ReplicaIsNotInQuorum",
    290 -> "LimitExceeded", 364 -> "ReceivedErrorTooManyRequests",
    384 -> "PartIsTemporarilyLocked", 198 -> "DNSError",
    201 -> "QuotaExpired", 236 -> "Aborted",
    999 -> "KeeperException", 1000 -> "PocoException")

  /** classification.go permanentCodes — the reference's exact list. */
  private val referencePermanent = Seq(
    6 -> "CannotParseText", 7 -> "IncorrectNumberOfColumns",
    16 -> "NoSuchColumnInTable", 18 -> "CannotInsertElementIntoConstantColumn",
    20 -> "NumberOfColumnsDoesntMatch", 25 -> "CannotParseEscapeSequence",
    26 -> "CannotParseQuotedString", 27 -> "CannotParseInputAssertionFailed",
    38 -> "CannotParseDate", 41 -> "CannotParseDatetime",
    43 -> "IllegalTypeOfArgument", 44 -> "IllegalColumn",
    47 -> "UnknownIdentifier", 53 -> "TypeMismatch",
    60 -> "UnknownTable", 72 -> "CannotParseNumber",
    80 -> "IncorrectQuery", 81 -> "UnknownDatabase",
    117 -> "IncorrectData", 192 -> "UnknownUser",
    164 -> "Readonly", 193 -> "WrongPassword",
    194 -> "RequiredPassword", 195 -> "IPAddressNotAllowed",
    291 -> "DatabaseAccessDenied", 321 -> "ValueIsOutOfRangeOfDataType",
    349 -> "CannotInsertNullInOrdinaryColumn", 392 -> "QueryIsProhibited",
    516 -> "AuthenticationFailed")

  /** A CH server error the way JDBC surfaces it: "Code: NNN. DB::Exception…". */
  private def chEx(code: Int): Throwable =
    new java.sql.SQLException(s"Code: $code. DB::Exception: synthetic test error")

  /** foreachBatch wraps executor failures: model the SparkException layer. */
  private def wrapped(t: Throwable): Throwable =
    new RuntimeException("Job aborted due to stage failure", t)

  test("reference retryable table: every code, raw and wrapped") {
    for ((code, name) <- referenceRetryable) {
      assert(classify(code) == Retryable, s"$name/$code by code")
      assert(classify(chEx(code)) == Retryable, s"$name/$code via exception")
      assert(classify(wrapped(chEx(code))) == Retryable, s"$name/$code wrapped")
    }
  }

  test("reference permanent table: every code, raw and wrapped") {
    for ((code, name) <- referencePermanent) {
      assert(classify(code) == Permanent, s"$name/$code by code")
      assert(classify(chEx(code)) == Permanent, s"$name/$code via exception")
      assert(classify(wrapped(chEx(code))) == Permanent, s"$name/$code wrapped")
    }
  }

  test("the two tables are disjoint and unknown codes stay Unknown") {
    assert(retryableCodes.intersect(permanentCodes).isEmpty)
    assert(classify(9999) == Unknown)
    assert(classify(chEx(9999)) == Unknown)
    assert(classify(new RuntimeException("something broke")) == Unknown)
  }

  test("network/IO failures with no CH code are retryable (isNetworkError leg)") {
    // classification.go:151-165: EOF / ECONNREFUSED / ECONNRESET / EPIPE /
    // net timeouts → Retryable. Here they surface as message keywords.
    for (msg <- Seq(
      "Connection refused (Connection refused)",
      "Connection reset by peer",
      "Broken pipe (Write failed)",
      "Read timed out",
      "connect timed out")) {
      assert(classify(new java.io.IOException(msg)) == Retryable, msg)
      assert(classify(wrapped(new java.io.IOException(msg))) == Retryable, s"wrapped: $msg")
    }
    // non-timeout, non-network error text → Unknown (conservative → DLQ)
    assert(classify(new java.io.IOException("disk quota exceeded")) == Unknown)
  }

  test("keyword match is first-line only: stack dumps cannot flip the class") {
    // Spark embeds the task stack trace in the message; frame names like
    // EmbedConnection must not make a permanent data fault look retryable.
    val msg = "data truncation on column x\n\tat o.a.d.impl.jdbc.EmbedConnection.handleException"
    assert(classify(new RuntimeException(msg)) == Unknown)
    // …but a CH code anywhere in the chain still wins over keywords
    val chained = new RuntimeException(msg, chEx(53))
    assert(classify(chained) == Permanent)
  }

  test("deep cause chains resolve (foreachBatch → SparkException → SQLException)") {
    val deep = wrapped(wrapped(wrapped(chEx(242))))
    assert(classify(deep) == Retryable)
    // a cycle-free walk even when the chain is long
    var t: Throwable = chEx(60)
    (0 until 10).foreach(_ => t = wrapped(t))
    assert(classify(t) == Permanent)
  }
}
