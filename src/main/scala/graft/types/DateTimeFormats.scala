package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flexible string→timestamp parsing mirroring the reference sink mapper's
  * accepted-format list (glassflow-api/internal/mapper/utils.go:507-543:
  * RFC3339 variants with/without fractional seconds and offsets, space
  * separated datetimes, date-only, slash dates, and unix second/milli
  * numerics). All parsing is declarative (`try_to_timestamp` chains) so it
  * stays inside codegen and returns NULL (never throws) on unparseable input
  * — the row-level error channel decides whether that null is a DLQ case.
  */
object DateTimeFormats {

  /** Candidate patterns, most common first (short-circuit via coalesce). */
  val patterns: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ssXXX",        // RFC3339 / ISO-8601 with offset or Z
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ssXXX",
    "yyyy-MM-dd HH:mm:ss.SSSXXX",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy",
    "dd-MM-yyyy HH:mm:ss",
    "yyyyMMdd"
  )

  private val zonedPatterns = patterns.filter(_.contains("XXX"))
  private val naivePatterns = patterns.filterNot(_.contains("XXX"))

  /** String column → timestamp, trying each accepted format, then unix
    * seconds (10 digits) and unix milliseconds (13 digits). NULL if none
    * fit. `tz` is the column's declared timezone (DateTime64(p, tz)):
    * offset-free wall-clock strings are interpreted in that zone — offsets,
    * Z, and unix numerics are absolute instants and ignore it (ClickHouse
    * column-tz semantics for naive INSERT strings). A string matches
    * exactly one pattern class, so grouping zoned before naive preserves
    * the accepted-format behavior. */
  def parseString(c: Column, tz: Option[String] = None): Column = {
    val zoned = zonedPatterns.map(p => try_to_timestamp(c, lit(p)))
    val naive = naivePatterns.map { p =>
      val t = try_to_timestamp(c, lit(p))
      tz.fold(t)(z => to_utc_timestamp(t, z))
    }
    val secs = when(c.rlike("^\\d{10}$"), timestamp_seconds(c.try_cast(LongType)))
    val millis = when(c.rlike("^\\d{13}$"), timestamp_millis(c.try_cast(LongType)))
    coalesce(secs +: millis +: (zoned ++ naive): _*)
  }

  /** Any column → timestamp: ints are unix seconds, floats are
    * seconds.nanos, strings go through the accepted-format list
    * (reference mapper/utils.go:545-574). */
  def parseAny(c: Column, dt: DataType, tz: Option[String] = None): Column = dt match {
    case _: TimestampType => c
    case DateType => c.cast(TimestampType)
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
      timestamp_seconds(c)
    case _: DoubleType | _: FloatType | _: DecimalType =>
      timestamp_micros((c.cast(DoubleType) * 1000000L).cast(LongType))
    case _ => parseString(c.cast(StringType), tz)
  }
}
