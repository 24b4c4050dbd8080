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
    * readonly/quorum replicas, shutdown — retrying can succeed. The list
    * replays the reference's retryableCodes table 1:1
    * (classification.go:43-69) plus four conservative extras the reference
    * does not enumerate (3, 252, 319, 425). */
  val retryableCodes: Set[Int] = Set(
    3,    // UNEXPECTED_END_OF_FILE (extra)
    159,  // TIMEOUT_EXCEEDED
    198,  // DNS_ERROR
    201,  // QUOTA_EXPIRED — resets on schedule
    202,  // TOO_MANY_SIMULTANEOUS_QUERIES
    203,  // NO_FREE_CONNECTION
    209,  // SOCKET_TIMEOUT
    210,  // NETWORK_ERROR
    236,  // ABORTED — server-initiated query abort
    241,  // MEMORY_LIMIT_EXCEEDED
    242,  // TABLE_IS_READ_ONLY — replica recovery in progress
    243,  // NOT_ENOUGH_SPACE — disk pressure (may clear)
    244,  // UNEXPECTED_ZOOKEEPER_ERROR
    252,  // TOO_MANY_PARTS (extra)
    254,  // NO_ACTIVE_REPLICAS
    265,  // NO_AVAILABLE_REPLICA
    279,  // ALL_CONNECTION_TRIES_FAILED
    285,  // TOO_LESS_LIVE_REPLICAS
    286,  // UNSATISFIED_QUORUM_FOR_PREVIOUS_WRITE
    289,  // REPLICA_IS_NOT_IN_QUORUM — replication lag
    290,  // LIMIT_EXCEEDED
    297,  // SHARD_HAS_NO_CONNECTIONS
    319,  // UNKNOWN_STATUS_OF_INSERT (extra)
    364,  // RECEIVED_ERROR_TOO_MANY_REQUESTS — HTTP 429
    384,  // PART_IS_TEMPORARILY_LOCKED — merge in progress
    425,  // SYSTEM_ERROR (extra)
    999,  // KEEPER_EXCEPTION
    1000) // POCO_EXCEPTION — network/IO layer

  /** Data/schema/auth faults: retrying the same rows can never succeed.
    * Replays the reference's permanentCodes table 1:1
    * (classification.go:74-105) plus five conservative extras
    * (62, 69, 130, 467, 490). */
  val permanentCodes: Set[Int] = Set(
    6,    // CANNOT_PARSE_TEXT
    7,    // INCORRECT_NUMBER_OF_COLUMNS
    16,   // NO_SUCH_COLUMN_IN_TABLE
    18,   // CANNOT_INSERT_ELEMENT_INTO_CONSTANT_COLUMN
    20,   // NUMBER_OF_COLUMNS_DOESNT_MATCH
    25,   // CANNOT_PARSE_ESCAPE_SEQUENCE
    26,   // CANNOT_PARSE_QUOTED_STRING
    27,   // CANNOT_PARSE_INPUT_ASSERTION_FAILED
    38,   // CANNOT_PARSE_DATE
    41,   // CANNOT_PARSE_DATETIME
    43,   // ILLEGAL_TYPE_OF_ARGUMENT
    44,   // ILLEGAL_COLUMN
    47,   // UNKNOWN_IDENTIFIER
    53,   // TYPE_MISMATCH
    60,   // UNKNOWN_TABLE
    62,   // SYNTAX_ERROR (extra)
    69,   // ARGUMENT_OUT_OF_BOUND (extra)
    72,   // CANNOT_PARSE_NUMBER
    73,   // UNKNOWN_FORMAT (extra)
    80,   // INCORRECT_QUERY
    81,   // UNKNOWN_DATABASE
    117,  // INCORRECT_DATA
    130,  // CANNOT_READ_ARRAY_FROM_TEXT (extra)
    131,  // TOO_LARGE_STRING_SIZE — FixedString overflow (extra)
    164,  // READONLY — readonly mode is a config fault, not a replica blip
    192,  // UNKNOWN_USER
    193,  // WRONG_PASSWORD
    194,  // REQUIRED_PASSWORD
    195,  // IP_ADDRESS_NOT_ALLOWED
    291,  // DATABASE_ACCESS_DENIED
    321,  // VALUE_IS_OUT_OF_RANGE_OF_DATA_TYPE
    349,  // CANNOT_INSERT_NULL_IN_ORDINARY_COLUMN
    376,  // CANNOT_PARSE_UUID (extra)
    392,  // QUERY_IS_PROHIBITED
    467,  // CANNOT_PARSE_BOOL (extra)
    490,  // (extra, conservative)
    516,  // AUTHENTICATION_FAILED
    691)  // UNKNOWN_ELEMENT_OF_ENUM (extra)

  def classify(code: Int): Class =
    if (retryableCodes(code)) Retryable
    else if (permanentCodes(code)) Permanent
    else Unknown

  /** Faults caused by one row's VALUE (parse/convert/range) — the class
    * the reference dead-letters per-row at batch append time
    * (clickhouse.go:536-718) while the rest of the batch proceeds. Table-,
    * schema-, auth- and query-level permanents (60, 16, 516, ...) are NOT
    * here: row-wise replay cannot fix those, the whole batch dead-letters. */
  val rowDataFaultCodes: Set[Int] = Set(
    6, 25, 26, 27, 38, 41, 53, 72, 117, 130, 131, 321, 349, 376, 467, 691,
    407, // DECIMAL_OVERFLOW — a value's digits exceed the column's (p,s)
    441) // CANNOT_PARSE_DOMAIN_VALUE_FROM_STRING — bad IPv4/IPv6 literal

  def isRowDataFault(code: Int): Boolean = rowDataFaultCodes(code)

  /** First "Code: NNN" found along the cause chain, if any. */
  def codeOf(t: Throwable): Option[Int] = {
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
    chain.map(e => Option(e.getMessage).getOrElse(""))
      .flatMap("Code:\\s*(\\d+)".r.findFirstMatchIn(_)).nextOption()
      .map(_.group(1).toInt)
  }

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
    codeOf(t).map(classify).getOrElse {
        // network-level failures with no CH code are retryable
        val firstLines = msgs.map(_.linesIterator.nextOption().getOrElse("")
          .toLowerCase)
        if (firstLines.exists(l => l.contains("timeout") ||
          l.contains("timed out") || // java.net.SocketTimeoutException phrasing
          l.contains("connection") || l.contains("connect") ||
          l.contains("broken pipe"))) Retryable
        else Unknown
      }
  }
}
