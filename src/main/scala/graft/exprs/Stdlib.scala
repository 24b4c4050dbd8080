package graft.exprs

import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.DateTimeFormats
import Expr.Lit

/** The engine's scalar function library — the Spark re-expression of the 24
  * Go functions the reference registers into its expr environment
  * (glassflow-api/internal/transformer/json/custom_expr_functions.go, 557 LoC;
  * registration transformation.go:22-47).
  *
  * Everything that can be a built-in Catalyst expression is one (codegen'd,
  * null-safe via try_* variants); only parseQuery / getQueryParam /
  * getNestedParam / parseUserAgent are Scala UDFs (string-cascade logic with
  * no Catalyst equivalent).
  */
object Stdlib {

  import ExprCompiler.{toColumn, typeOf, CompileException}

  def apply(name: String, args: Seq[Expr], schema: StructType): Column = {
    def a(i: Int): Column = toColumn(args(i), schema)
    def litStr(i: Int): String = args(i) match {
      case Lit(s: String) => s
      case other => throw CompileException(s"$name: argument ${i + 1} must be a string literal, got $other")
    }
    name match {
      // --- URL / query-string (custom_expr_functions.go:16-75) ---
      case "parseQuery" => parseQueryUdf(a(0))
      case "getQueryParam" => getQueryParamUdf(a(0), a(1))
      case "getNestedParam" => getNestedParamUdf(a(0), a(1), a(2))
      case "urlDecode" => try_url_decode(a(0))

      // --- telemetry helpers (custom_expr_functions.go:78-152) ---
      case "extractPathType" =>
        when(a(0).contains("/g/collect"), "collect")
          .when(a(0).contains("/_/set_cookie"), "set_cookie")
          .otherwise("unknown")
      case "hasKeyPrefix" =>
        val prefixes = typeOf(args(1), schema) match {
          case Some(_: ArrayType) => a(1)
          case _ => array(args.tail.map(toColumn(_, schema)): _*)
        }
        exists(map_keys(a(0)), k => exists(prefixes, p => startswith(k, p)))
      case "hasAnyKey" =>
        val keys = typeOf(args(1), schema) match {
          case Some(_: ArrayType) => a(1)
          case _ => array(args.tail.map(toColumn(_, schema)): _*)
        }
        arrays_overlap(map_keys(a(0)), keys)

      // --- waterfall: first non-null, non-empty-string value
      //     (custom_expr_functions.go:154-191; args or one list) ---
      case "waterfall" =>
        // try_element_at: an all-null/empty list must yield NULL (expr-lang
        // returns nil), not ANSI INVALID_ARRAY_INDEX on the empty filter result
        if (args.length == 1 && typeOf(args.head, schema).exists(_.isInstanceOf[ArrayType]))
          try_element_at(filter(a(0), x => x.isNotNull && x.cast(StringType) =!= ""), lit(1))
        else
          coalesce(args.map { arg =>
            val c = toColumn(arg, schema)
            if (typeOf(arg, schema).contains(StringType)) nullif(c, lit("")) else c
          }: _*)

      // --- timestamps (custom_expr_functions.go:194-237) ---
      case "parseISO8601" =>
        DateTimeFormats.parseString(a(0).cast(StringType)).cast(LongType)
      case "toDate" =>
        val dt = typeOf(args.head, schema).getOrElse(StringType)
        date_format(DateTimeFormats.parseAny(a(0), dt), "yyyy-MM-dd")

      // --- user agent sniffing (custom_expr_functions.go:239-338) ---
      case "parseUserAgent" => parseUserAgentUdf(a(0), a(1))

      // --- casts with errors→zero-value semantics
      //     (custom_expr_functions.go:362-372,500-539) ---
      case "toString" => a(0).cast(StringType)
      case "toInt" =>
        // integer-string parse first, then floor(parseFloat) — floats always
        // floor (a bare double→long cast would truncate toward zero instead)
        val isFloat = typeOf(args.head, schema).exists {
          case DoubleType | FloatType | _: DecimalType => true
          case _ => false
        }
        if (isFloat) coalesce(floor(a(0)).try_cast(LongType), lit(0L))
        else coalesce(a(0).try_cast(LongType),
          floor(a(0).try_cast(DoubleType)).try_cast(LongType), lit(0L))
      case "toFloat" => coalesce(a(0).try_cast(DoubleType), lit(0.0))

      // --- string ops (custom_expr_functions.go:374-498) ---
      case "containsStr" => a(0).contains(a(1))
      case "hasPrefix" => startswith(a(0), a(1))
      case "hasSuffix" => endswith(a(0), a(1))
      case "upper" => upper(a(0))
      case "lower" => lower(a(0))
      case "trim" => trim(a(0))
      case "split" => split(a(0), Pattern.quote(litStr(1)))
      case "join" => array_join(a(0), litStr(1))
      case "replace" => replace(a(0), a(1), a(2))

      // --- maps (custom_expr_functions.go:541-557) ---
      case "keys" => array_sort(map_keys(a(0)))

      // --- generic helpers usable from expressions ---
      case "coalesce" => coalesce(args.map(toColumn(_, schema)): _*)
      case "len" => typeOf(args.head, schema) match {
        case Some(StringType) => length(a(0))
        case _ => size(a(0))
      }
      case "abs" => abs(a(0))
      case "min" => least(args.map(toColumn(_, schema)): _*)
      case "max" => greatest(args.map(toColumn(_, schema)): _*)

      case other => throw CompileException(s"unknown function: $other")
    }
  }

  /** Static return types for the minimal type checker. */
  def returnType(name: String): Option[DataType] = name match {
    case "parseQuery" => Some(MapType(StringType, ArrayType(StringType)))
    case "getQueryParam" | "getNestedParam" | "urlDecode" | "extractPathType" |
         "toDate" | "parseUserAgent" | "toString" | "upper" | "lower" | "trim" |
         "join" | "replace" => Some(StringType)
    case "hasKeyPrefix" | "hasAnyKey" | "containsStr" | "hasPrefix" | "hasSuffix" =>
      Some(BooleanType)
    case "parseISO8601" | "toInt" | "len" => Some(LongType)
    case "toFloat" => Some(DoubleType)
    case "split" | "keys" => Some(ArrayType(StringType))
    case _ => None
  }

  // ---- UDF implementations (plain JVM logic, no external deps) ----

  private def dec(s: String): String =
    try URLDecoder.decode(s, StandardCharsets.UTF_8) catch { case _: Exception => s }

  private[exprs] def parseQueryString(s: String): Map[String, Seq[String]] = {
    if (s == null) Map.empty
    else {
      val q = { val i = s.indexOf('?'); if (i >= 0) s.substring(i + 1) else s }
      q.split('&').iterator.filter(_.nonEmpty).foldLeft(Map.empty[String, Seq[String]]) {
        (m, kv) =>
          val eq = kv.indexOf('=')
          val (k, v) = if (eq >= 0) (kv.substring(0, eq), kv.substring(eq + 1)) else (kv, "")
          val key = dec(k)
          m.updated(key, m.getOrElse(key, Seq.empty) :+ dec(v))
      }
    }
  }

  private[exprs] def queryParam(s: String, k: String): String =
    parseQueryString(s).get(k).flatMap(_.headOption).getOrElse("")

  private val parseQueryUdf = udf(parseQueryString _)
  private val getQueryParamUdf = udf(queryParam _)
  private val getNestedParamUdf =
    udf((s: String, outer: String, inner: String) => queryParam(queryParam(s, outer), inner))

  /** Substring-cascade UA sniffing (same decision style as the reference's
    * regex-free implementation, custom_expr_functions.go:239-338). */
  private[exprs] def sniffUserAgent(ua0: String, field: String): String = {
    val ua = if (ua0 == null) "" else ua0
    field match {
      case "browser" =>
        if (ua.contains("Edg")) "Edge"
        else if (ua.contains("OPR") || ua.contains("Opera")) "Opera"
        else if (ua.contains("Chrome")) "Chrome"
        else if (ua.contains("Safari")) "Safari"
        else if (ua.contains("Firefox")) "Firefox"
        else if (ua.contains("MSIE") || ua.contains("Trident")) "Internet Explorer"
        else "unknown"
      case "os" =>
        // iPhone/iPad first: their UAs contain "like Mac OS X"
        if (ua.contains("iPhone") || ua.contains("iPad") || ua.contains("iOS")) "iOS"
        else if (ua.contains("Windows")) "Windows"
        else if (ua.contains("Mac OS X") || ua.contains("Macintosh")) "macOS"
        else if (ua.contains("Android")) "Android"
        else if (ua.contains("Linux")) "Linux"
        else "unknown"
      case "device" | "device_type" =>
        val lower = ua.toLowerCase
        if (lower.contains("bot") || lower.contains("spider") || lower.contains("crawler")) "bot"
        else if (ua.contains("iPad") || lower.contains("tablet")) "tablet"
        else if (ua.contains("Mobile") || ua.contains("iPhone") || ua.contains("Android")) "mobile"
        else "desktop"
      case _ => "unknown"
    }
  }

  private val parseUserAgentUdf = udf(sniffUserAgent _)
}
