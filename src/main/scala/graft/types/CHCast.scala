package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import CHType._

/** The (ClickHouse type × engine type) conversion matrix — the declarative
  * re-expression of the reference's ConvertValue
  * (glassflow-api/internal/mapper/types.go:79-225, mapper/utils.go).
  *
  * Semantics preserved:
  *  - strict pairings: Bool needs bool; Int/UInt accept integers only;
  *    Float* accepts numerics; String-family needs string (arrays fall back
  *    to their JSON encoding, types.go:200-222)
  *  - range-checked narrowing (Int8 from 300 is an error, utils.go:29-496)
  *  - DateTime from int seconds / float seconds.nanos / ~20 string formats
  *    (utils.go:507-574)
  *  - Map values coerced to strings; scalars formatted, complex JSON-encoded
  *    (types.go:238-276); NULL Map → empty map (types.go:47-54)
  *  - NULL otherwise passes through (ClickHouse validates; types.go:79-88)
  *
  * A conversion error yields NULL (never a thrown exception) so the row-level
  * DLQ channel can route it — see [[graft.sink.SinkMapper.partitionErrors]]:
  * "error" is detected as source-not-null ∧ result-null. Everything here is
  * built-in expressions, so the whole matrix runs inside codegen.
  */
object CHCast {

  /** Date32's documented range, as epoch days. */
  private[types] val date32LoDays = java.time.LocalDate.of(1900, 1, 1).toEpochDay
  private[types] val date32HiDays = java.time.LocalDate.of(2299, 12, 31).toEpochDay

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isFloating(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }

  /** NULL column of the target's spark type (a typed error marker). */
  private def nul(to: CHType): Column = lit(null).cast(to.sparkType)

  def convert(c: Column, from: DataType, to: CHType): Column = to match {
    case CHLowCardinality(inner) => convert(c, from, inner)
    case CHNullable(inner) => convert(c, from, inner)

    case CHString => from match {
      case StringType => c
      case _: ArrayType | _: MapType | _: StructType => to_json(c) // JSON fallback
      case _ => nul(to)
    }

    case CHFixedString(n) => from match {
      // FixedString(n) is n BYTES, not chars: 'héllo' is 5 chars / 6 UTF-8
      // bytes and must fail a FixedString(5) — octet_length, not length
      case StringType => when(octet_length(c) <= n, c) // too long → error
      case _ => nul(to)
    }

    case CHBool => from match {
      case BooleanType => c
      case _ => nul(to)
    }

    case CHEnum(_, values) => from match {
      case StringType =>
        if (values.isEmpty) c
        else when(c.isin(values.keys.toSeq: _*), c) // non-member → error
      case _ => nul(to)
    }

    case CHUUID => from match {
      case StringType =>
        when(c.rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"), c)
      case _ => nul(to)
    }

    case CHInt(_) =>
      if (isIntegral(from)) c.try_cast(to.sparkType) // try_cast: overflow → null
      else nul(to)

    case CHUInt(64) if from.isInstanceOf[DecimalType] &&
        from.asInstanceOf[DecimalType].scale == 0 =>
      // full-range UInt64 input arrives as Decimal(20,0) (a Long cannot
      // hold 2^64-1); range-check [0, 2^64-1] and keep the decimal width.
      // scale > 0 falls through to the strict branch and errors: real
      // ClickHouse rejects fractional input for UInt64, rounding would
      // silently corrupt
      when(c >= 0 && c <= lit(new java.math.BigDecimal("18446744073709551615")),
        c.cast(DecimalType(20, 0)))

    case CHUInt(bits) =>
      if (!isIntegral(from)) nul(to)
      else {
        val max: Column = bits match {
          case 8 => lit(255L); case 16 => lit(65535L); case 32 => lit(4294967295L)
          case 64 => lit(Long.MaxValue) // long input can't exceed; negativity is the check
        }
        when(c >= 0 && c.cast(LongType) <= max, c.cast(to.sparkType))
      }

    case CHFloat32 =>
      if (isFloating(from) || isIntegral(from)) c.cast(FloatType) else nul(to)
    case CHFloat64 =>
      if (isFloating(from) || isIntegral(from)) c.cast(DoubleType) else nul(to)

    case CHDecimal(p, s) =>
      // numeric → Decimal(p,s); try_cast yields NULL (the error marker) on
      // overflow, exactly like the integer narrowing branch
      if (isFloating(from) || isIntegral(from)) c.try_cast(DecimalType(p, s))
      else nul(to)

    case CHDate | CHDate32 =>
      val d: Column = from match {
        case DateType => c
        case _: TimestampType => to_date(c) // session tz (UTC in this engine)
        // CH parses integers as day ordinals since epoch for Date inserts
        case t if isIntegral(t) => date_from_unix_date(c.cast(IntegerType))
        case StringType => c.try_cast(DateType) // bad format → NULL (error)
        case _ => nul(to)
      }
      // range-check to the column's wire domain (u16 days / i32 bounded):
      // an out-of-range date is an error, not a silent wrap
      val days = datediff(d, to_date(lit("1970-01-01")))
      val (lo, hi) =
        if (to == CHDate) (0L, 65535L) else (date32LoDays, date32HiDays)
      when(days >= lo && days <= hi, d)

    case CHDateTime(tz) =>
      // second precision: truncate fractional seconds; naive strings are
      // wall-clock in the column's tz (applied inside the parse)
      timestamp_seconds(unixSeconds(c, from, tz))
    case CHDateTime64(p, tz) =>
      val ts = DateTimeFormats.parseAny(c, from, tz)
      if (p <= 0) timestamp_seconds(unixSeconds(c, from, tz))
      else {
        // keep only p fractional digits (micros ceiling — Spark's
        // precision); FLOOR, not truncate-toward-zero: a pre-epoch value's
        // sub-precision digits must round down or the stored tick lands a
        // full unit high (matches RowBinaryEncoder's floorDiv)
        val unit = math.pow(10, math.min(p, 6)).toLong
        timestamp_micros(floor(unix_micros(ts).cast(DoubleType) / (1000000L / unit))
          .cast(LongType) * (1000000L / unit))
      }

    case CHIPv4 => from match {
      // dotted quad, each octet 0-255 (leading zeros tolerated, as the
      // server's parse is); malformed → NULL error marker
      case StringType =>
        when(c.rlike("^(25[0-5]|2[0-4][0-9]|[01]?[0-9]{1,2})(\\.(25[0-5]|2[0-4][0-9]|[01]?[0-9]{1,2})){3}$"), c)
      // CH also accepts the raw UInt32 for IPv4 columns
      case t if isIntegral(t) =>
        when(c >= 0L && c <= 4294967295L, concat_ws(".",
          shiftright(c.cast(LongType), 24) % 256, shiftright(c.cast(LongType), 16) % 256,
          shiftright(c.cast(LongType), 8) % 256, c.cast(LongType) % 256))
      case _ => nul(to)
    }

    case CHIPv6 => from match {
      // shape screen only (hex groups / '::' / optional dotted tail) —
      // group-count arithmetic lives in IpCodec at the encode tier, where
      // a miss is a per-row fault the DLQ channel routes
      case StringType =>
        when(c.rlike("^[0-9a-fA-F:]*(:[0-9]{1,3}(\\.[0-9]{1,3}){3})?$") &&
          c.contains(":"), c)
      case _ => nul(to)
    }

    case t @ CHTuple(elems) => from match {
      // positional: CAST(struct AS Tuple) pairs fields by position in
      // ClickHouse; names come from the TARGET type
      case StructType(fields) if fields.length == elems.length =>
        val parts = fields.toSeq.zip(elems).zip(t.elementNames).map {
          case ((f, (_, et)), outName) =>
            convert(c.getField(f.name), f.dataType, et).as(outName)
        }
        when(c.isNotNull, struct(parts: _*))
      case _ => nul(to)
    }

    case CHMap(_, _) => from match {
      case MapType(_, valueType, _) =>
        val strings = transform_values(c, (_, v) => stringifyValue(v, valueType))
        coalesce(strings, map()) // NULL map → {}
      case _ => nul(to)
    }

    case CHArray(inner) => from match {
      case ArrayType(elem, _) => transform(c, e => convert(e, elem, inner))
      case _ => nul(to)
    }
  }

  private def unixSeconds(c: Column, from: DataType, tz: Option[String] = None): Column = from match {
    case _: TimestampType => floor(unix_micros(c) / 1000000.0).cast(LongType)
    case t if isIntegral(t) => c.cast(LongType)
    case t if isFloating(t) => floor(c.cast(DoubleType)).cast(LongType)
    case _ =>
      floor(unix_micros(DateTimeFormats.parseString(c.cast(StringType), tz)) / 1000000.0)
        .cast(LongType)
  }

  /** Map-value coercion: scalars formatted as strings, complex values
    * JSON-encoded (reference types.go:238-276). */
  private def stringifyValue(v: Column, dt: DataType): Column = dt match {
    case StringType => v
    case _: ArrayType | _: MapType | _: StructType => to_json(v)
    case _ => v.cast(StringType)
  }
}
