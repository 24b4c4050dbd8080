package graft.sink

/** ClickHouse error classification — the reference's sink retry policy
  * (glassflow-api/internal/sink/errors/classification.go:16-160, applied in
  * internal/sink/clickhouse.go:426-481):
  *
  *  - Retryable → rethrow from foreachBatch so Spark retries the batch
  *    (replaces NACK + redeliver-with-delay)
  *  - Permanent → route the rows to the DLQ writer and continue
  *  - Unknown → DLQ + log (conservative: don't wedge the stream)
  */
object ErrorClassifier {

  sealed trait Class
  case object Retryable extends Class
  case object Permanent extends Class
  case object Unknown extends Class

  /** Transient server states: timeouts, overload, memory pressure,
    * readonly/quorum replicas, shutdown — retrying can succeed. */
  val retryableCodes: Set[Int] = Set(
    3,    // UNEXPECTED_END_OF_FILE
    159,  // TIMEOUT_EXCEEDED
    164,  // READONLY
    202,  // TOO_MANY_SIMULTANEOUS_QUERIES
    203,  // NO_FREE_CONNECTION
    209,  // SOCKET_TIMEOUT
    210,  // NETWORK_ERROR
    236,  // ABORTED
    241,  // MEMORY_LIMIT_EXCEEDED
    242,  // TABLE_IS_READ_ONLY
    252,  // TOO_MANY_PARTS
    285,  // TOO_FEW_LIVE_REPLICAS
    319,  // UNKNOWN_STATUS_OF_INSERT
    425,  // SYSTEM_ERROR
    999)  // KEEPER_EXCEPTION

  /** Data/schema faults: retrying the same rows can never succeed. */
  val permanentCodes: Set[Int] = Set(
    6,    // CANNOT_PARSE_TEXT
    16,   // NO_SUCH_COLUMN_IN_TABLE
    20,   // NUMBER_OF_COLUMNS_DOESNT_MATCH
    27,   // CANNOT_PARSE_INPUT_ASSUMED_NL? (malformed input)
    38,   // CANNOT_PARSE_DATE
    41,   // CANNOT_PARSE_DATETIME
    53,   // TYPE_MISMATCH
    60,   // UNKNOWN_TABLE
    62,   // SYNTAX_ERROR
    69,   // ARGUMENT_OUT_OF_BOUND
    72,   // CANNOT_PARSE_NUMBER
    81,   // UNKNOWN_DATABASE
    117,  // INCORRECT_DATA
    130,  // CANNOT_READ_ARRAY_FROM_TEXT
    349,  // CANNOT_INSERT_NULL_IN_ORDINARY_COLUMN
    467,  // CANNOT_PARSE_BOOL
    490)  // CANNOT_PARSE_UUID

  def classify(code: Int): Class =
    if (retryableCodes(code)) Retryable
    else if (permanentCodes(code)) Permanent
    else Unknown

  /** Classify from an exception containing "Code: NNN" (the ClickHouse
    * server error format surfaced through JDBC). The whole cause chain is
    * examined — foreachBatch surfaces executor-side SQLExceptions wrapped
    * in a SparkException — but keyword matching looks only at each
    * exception's FIRST message line: Spark embeds the task's full stack
    * trace in its message, and frame names in that dump
    * (EmbedConnection.handleException, ConnectionChild, ...) would
    * false-match "connection" and misclassify a permanent data fault as
    * retryable. */
  def classify(t: Throwable): Class = {
    val chain = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(16).toSeq
    val msgs = chain.map(e => Option(e.getMessage).getOrElse(""))
    msgs.flatMap("Code:\\s*(\\d+)".r.findFirstMatchIn(_)).headOption
      .map(g => classify(g.group(1).toInt)).getOrElse {
        // network-level failures with no CH code are retryable
        val firstLines = msgs.map(_.linesIterator.nextOption().getOrElse("")
          .toLowerCase)
        if (firstLines.exists(l => l.contains("timeout") ||
          l.contains("connection") || l.contains("connect") ||
          l.contains("broken pipe"))) Retryable
        else Unknown
      }
  }
}
