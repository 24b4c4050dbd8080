package graft.sink

import java.nio.charset.StandardCharsets.UTF_8

import graft.types.{CHType, IpCodec}

/** SELECT support for [[MiniClickHouseServer]] — the fixture side of the
  * read leg ([[graft.sources.clickhouse.ClickHouseReadSource]]). Two
  * pieces:
  *
  *  - a WHERE-clause parser/evaluator over the restricted grammar the
  *    reader's pushdown COMPILES (comparisons, IN, IS [NOT] NULL, LIKE,
  *    AND/OR/NOT, parens) with proper three-valued NULL logic — a
  *    comparison against NULL is UNKNOWN, NOT(UNKNOWN) stays UNKNOWN,
  *    and only TRUE keeps the row, exactly the SQL semantics the real
  *    server applies (so a pushed filter returns the same rows pushed or
  *    not);
  *  - a stored-canonical-values → `FORMAT Native` encoder (the inverse of
  *    the fixture's own decode canonicalization), so a SELECT response is
  *    real wire bytes the production [[graft.types.NativeDecoder]] must
  *    decode — the round-trip test closes client-encode → server-decode →
  *    server-encode → client-decode over every supported type.
  *
  * Grammar restrictions are documented fixture honesty, not shortcuts:
  * an unsupported construct answers a syntax-error Exception (code 62),
  * never a silently-wrong result.
  */
private[sink] object MiniChSelect {
  import MiniClickHouseServer.CHFault

  // ------------------------------------------------------------ WHERE parse

  sealed trait Expr
  final case class Cmp(col: String, op: String, lit: Lit) extends Expr
  final case class InList(col: String, lits: Seq[Lit]) extends Expr
  final case class IsNull(col: String, negated: Boolean) extends Expr
  final case class Like(col: String, pattern: String) extends Expr
  /** `isNaN(col)` — the one function the reader's float-range pushdown
    * compiles (its NaN-keeping OR arm). */
  final case class IsNaN(col: String) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr

  sealed trait Lit
  final case class NumLit(v: BigDecimal) extends Lit
  final case class StrLit(v: String) extends Lit
  final case class BoolLit(v: Boolean) extends Lit
  /** Temporal literals the reader compiles, already in the STORED
    * canonical unit: `fromUnixTimestamp64Micro(n)` → micros since epoch,
    * `toDate32('yyyy-MM-dd')` → days since epoch. */
  final case class TimeLit(micros: Long) extends Lit
  final case class DateLit(days: Long) extends Lit

  def parseWhere(s: String): Expr = {
    val p = new Parser(s)
    val e = p.disjunction()
    p.skipWs()
    if (!p.atEnd) throw CHFault(62, s"Syntax error in WHERE near: ${p.rest.take(40)}")
    e
  }

  private final class Parser(s: String) {
    private var pos = 0
    def atEnd: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    def skipWs(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1

    private def keyword(k: String): Boolean = {
      skipWs()
      val end = pos + k.length
      if (end <= s.length && s.substring(pos, end).equalsIgnoreCase(k) &&
          (end == s.length || !Character.isLetterOrDigit(s(end)))) {
        pos = end; true
      } else false
    }

    def disjunction(): Expr = {
      var e = conjunction()
      while (keyword("OR")) e = Or(e, conjunction())
      e
    }

    private def conjunction(): Expr = {
      var e = atom()
      while (keyword("AND")) e = And(e, atom())
      e
    }

    private def atom(): Expr = {
      skipWs()
      if (keyword("NOT")) return Not(atom())
      if (!atEnd && s(pos) == '(') {
        pos += 1
        val e = disjunction()
        skipWs()
        if (atEnd || s(pos) != ')') throw CHFault(62, "Syntax error: expected )")
        pos += 1
        return e
      }
      val col = identifier()
      skipWs()
      // isNaN(col): an identifier immediately followed by '(' is the one
      // function call the pushdown grammar contains
      if (col.equalsIgnoreCase("isNaN") && !atEnd && s(pos) == '(') {
        pos += 1
        val inner = identifier()
        skipWs()
        if (atEnd || s(pos) != ')') throw CHFault(62, "Syntax error: expected ) after isNaN")
        pos += 1
        return IsNaN(inner)
      }
      if (keyword("IS")) {
        val neg = keyword("NOT")
        if (!keyword("NULL")) throw CHFault(62, "Syntax error: expected NULL")
        return IsNull(col, neg)
      }
      if (keyword("IN")) {
        skipWs()
        if (atEnd || s(pos) != '(') throw CHFault(62, "Syntax error: expected ( after IN")
        pos += 1
        val lits = scala.collection.mutable.ArrayBuffer[Lit](literal())
        skipWs()
        while (!atEnd && s(pos) == ',') { pos += 1; lits += literal(); skipWs() }
        if (atEnd || s(pos) != ')') throw CHFault(62, "Syntax error: expected ) after IN list")
        pos += 1
        return InList(col, lits.toSeq)
      }
      if (keyword("LIKE")) {
        literal() match {
          case StrLit(p) => return Like(col, p)
          case _ => throw CHFault(62, "Syntax error: LIKE needs a string literal")
        }
      }
      val op = operator()
      Cmp(col, op, literal())
    }

    private def identifier(): String = {
      skipWs()
      if (atEnd) throw CHFault(62, "Syntax error: expected identifier")
      if (s(pos) == '`') {
        pos += 1
        val sb = new StringBuilder
        while (pos < s.length && (s(pos) != '`' ||
               (pos + 1 < s.length && s(pos + 1) == '`'))) {
          if (s(pos) == '`') { sb += '`'; pos += 2 } else { sb += s(pos); pos += 1 }
        }
        if (atEnd) throw CHFault(62, "Syntax error: unterminated identifier")
        pos += 1
        sb.toString
      } else {
        val start = pos
        while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
        if (pos == start) throw CHFault(62, s"Syntax error: expected identifier near ${rest.take(20)}")
        s.substring(start, pos)
      }
    }

    private def operator(): String = {
      skipWs()
      val ops = Seq("<=", ">=", "!=", "<>", "=", "<", ">")
      ops.find(o => s.regionMatches(pos, o, 0, o.length)) match {
        case Some(o) => pos += o.length; if (o == "<>") "!=" else o
        case None => throw CHFault(62, s"Syntax error: expected operator near ${rest.take(20)}")
      }
    }

    /** The two temporal constructor functions the reader's pushdown
      * renders; anything else function-shaped stays a syntax error. */
    private def funcLit(): Option[Lit] = {
      skipWs()
      Seq("fromUnixTimestamp64Micro", "toDate32").find(f =>
        s.regionMatches(true, pos, f, 0, f.length) &&
          pos + f.length < s.length && s(pos + f.length) == '(') match {
        case None => None
        case Some(f) =>
          pos += f.length + 1
          val inner = literal()
          skipWs()
          if (atEnd || s(pos) != ')')
            throw CHFault(62, s"Syntax error: expected ) after $f")
          pos += 1
          Some((f, inner) match {
            case ("fromUnixTimestamp64Micro", NumLit(n)) if n.isWhole =>
              TimeLit(n.toLongExact)
            case ("toDate32", StrLit(d)) =>
              DateLit(try java.time.LocalDate.parse(d).toEpochDay
                catch { case _: Exception => throw CHFault(41, s"Cannot parse date: $d") })
            case (fn, l) => throw CHFault(43, s"Illegal argument $l of function $fn")
          })
      }
    }

    private def literal(): Lit = {
      skipWs()
      if (atEnd) throw CHFault(62, "Syntax error: expected literal")
      funcLit() match {
        case Some(l) => return l
        case None => ()
      }
      if (s(pos) == '\'') {
        pos += 1
        val sb = new StringBuilder
        while (pos < s.length && s(pos) != '\'') {
          if (s(pos) == '\\' && pos + 1 < s.length) { sb += s(pos + 1); pos += 2 }
          else { sb += s(pos); pos += 1 }
        }
        if (atEnd) throw CHFault(62, "Syntax error: unterminated string")
        pos += 1
        StrLit(sb.toString)
      } else if (keyword("true")) BoolLit(true)
      else if (keyword("false")) BoolLit(false)
      else {
        val start = pos
        if (pos < s.length && (s(pos) == '-' || s(pos) == '+')) pos += 1
        while (pos < s.length && (s(pos).isDigit || s(pos) == '.' ||
               s(pos) == 'e' || s(pos) == 'E' ||
               ((s(pos) == '-' || s(pos) == '+') &&
                (s(pos - 1) == 'e' || s(pos - 1) == 'E')))) pos += 1
        if (pos == start) throw CHFault(62, s"Syntax error: expected literal near ${rest.take(20)}")
        NumLit(BigDecimal(s.substring(start, pos)))
      }
    }
  }

  // ------------------------------------------------------------- evaluation

  /** Three-valued evaluation: Some(true/false) or None (UNKNOWN — a
    * comparison involving NULL). A row is kept only when Some(true). */
  def eval(e: Expr, row: Map[String, Any]): Option[Boolean] = e match {
    case And(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, row), eval(r, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(x) => eval(x, row).map(!_)
    case IsNull(c, neg) =>
      val isNull = colValue(c, row) == null
      Some(if (neg) !isNull else isNull)
    case IsNaN(c) =>
      colValue(c, row) match {
        case null => None // Nullable propagates: isNaN(NULL) is NULL
        case d: Double => Some(d.isNaN)
        case other => throw CHFault(43,
          s"Illegal argument ${other.getClass.getSimpleName} of function isNaN")
      }
    case InList(c, lits) =>
      val v = colValue(c, row)
      if (v == null) None
      // IEEE: NaN equals nothing, so NaN IN (...) is false, never true
      else if (v.isInstanceOf[Double] && v.asInstanceOf[Double].isNaN) Some(false)
      else Some(lits.exists(l => compare(v, l).contains(0)))
    case Like(c, pat) =>
      colValue(c, row) match {
        case null => None
        case v => Some(likeMatch(String.valueOf(v), pat))
      }
    case Cmp(c, op, lit) =>
      val v = colValue(c, row)
      if (v == null) None
      // IEEE NaN: every ordered comparison and equality is FALSE, only
      // != is TRUE — the real server's float semantics (and exactly the
      // divergence from Spark's NaN-greatest ordering that makes the
      // reader rewrite pushed floaty `>` as `... OR isNaN(col)`)
      else if (v.isInstanceOf[Double] && v.asInstanceOf[Double].isNaN)
        Some(op == "!=")
      else compare(v, lit).map { r =>
        op match {
          case "=" => r == 0
          case "!=" => r != 0
          case "<" => r < 0
          case "<=" => r <= 0
          case ">" => r > 0
          case ">=" => r >= 0
        }
      }
  }

  private def colValue(c: String, row: Map[String, Any]): Any =
    row.getOrElse(c, throw CHFault(47, s"Unknown identifier $c in WHERE"))

  /** Stored canonical value vs literal, numeric when both sides are
    * numeric, lexical for strings; None when the comparison is untyped
    * (e.g. string column vs number — the real server would cast, the
    * fixture refuses loudly). */
  private def compare(v: Any, lit: Lit): Option[Int] = (v, lit) match {
    case (b: Boolean, BoolLit(l)) => Some(java.lang.Boolean.compare(b, l))
    case (b: Boolean, NumLit(l)) => Some(BigDecimal(if (b) 1 else 0).compare(l))
    case (n: BigInt, NumLit(l)) => Some(BigDecimal(n).compare(l))
    case (n: Long, NumLit(l)) => Some(BigDecimal(n).compare(l))
    // infinities order against any finite literal without a BigDecimal
    // detour (which would throw on them); NaN never reaches here (handled
    // in eval with IEEE all-false semantics)
    case (n: Double, NumLit(_)) if n.isInfinite => Some(if (n > 0) 1 else -1)
    case (n: Double, NumLit(l)) => Some(BigDecimal(n).compare(l))
    case (n: BigDecimal, NumLit(l)) => Some(n.compare(l))
    // stored canonical temporals are Longs in the literal's own unit
    // (DateTime/DateTime64 → micros, Date/Date32 → days); the reader only
    // ever pairs a temporal literal with a same-kind column (Spark's
    // analysis aligns filter value type with column type)
    case (n: Long, TimeLit(m)) => Some(java.lang.Long.compare(n, m))
    case (n: Long, DateLit(d)) => Some(java.lang.Long.compare(n, d))
    case (s: String, StrLit(l)) => Some(s.compareTo(l))
    case _ => throw CHFault(53,
      s"Type mismatch comparing ${v.getClass.getSimpleName} with $lit")
  }

  /** SQL LIKE with backslash escapes: % = any run, _ = one char. */
  private[sink] def likeMatch(s: String, pattern: String): Boolean = {
    val rx = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern(i) match {
        case '\\' if i + 1 < pattern.length =>
          rx.append(java.util.regex.Pattern.quote(pattern(i + 1).toString)); i += 2
        case '%' => rx.append(".*"); i += 1
        case '_' => rx.append("."); i += 1
        case c => rx.append(java.util.regex.Pattern.quote(c.toString)); i += 1
      }
    }
    s.matches("(?s)" + rx.toString)
  }

  // ------------------------------------------------------- aggregate SELECTs

  sealed trait Item
  final case class ColItem(name: String) extends Item
  /** One aggregate select-list entry: base function, whether the public
    * `-OrNull` combinator was applied (NULL instead of the type default
    * when no values were received), the argument column, an optional
    * explicit `CAST(... AS type)` target that then FORCES the response
    * column type, and the alias. */
  final case class AggItem(func: String, orNull: Boolean, arg: Option[String],
                           castTo: Option[String], alias: String) extends Item

  /** Parse a SELECT list: plain (possibly backquoted) identifiers and/or
    * aliased single-argument aggregates, optionally -OrNull-combined and
    * optionally CAST-wrapped — `CAST(sumOrNull(`x`) AS Nullable(Int64))
    * AS alias`, the shape the read source compiles. Items split on
    * TOP-LEVEL commas only (a CAST target like Decimal(20, 0) or an Enum
    * type carries commas of its own). */
  def parseSelectList(s: String): Seq[Item] = splitTopLevel(s).map(parseItem)

  private val castAggRx =
    ("""(?is)^CAST\s*\(\s*(count|min|max|sum|avg)(OrNull)?\s*\(\s*""" +
      """(\*|`(?:[^`]|``)*`|[A-Za-z0-9_]*)\s*\)\s+AS\s+(.+?)\s*\)\s+AS\s+(\S+)\s*$""").r
  private val aggRx =
    ("""(?is)^(count|min|max|sum|avg)(OrNull)?\s*\(\s*""" +
      """(\*|`(?:[^`]|``)*`|[A-Za-z0-9_]*)\s*\)\s+AS\s+(\S+)\s*$""").r

  private def parseItem(item: String): Item = item match {
    case castAggRx(func, orNull, arg, tpe, alias) =>
      AggItem(func.toLowerCase, orNull != null, argOf(arg), Some(tpe.trim), unq(alias))
    case aggRx(func, orNull, arg, alias) =>
      AggItem(func.toLowerCase, orNull != null, argOf(arg), None, unq(alias))
    case plain => ColItem(unq(plain))
  }

  private def argOf(arg: String): Option[String] = arg.trim match {
    case "" | "*" => None
    case other => Some(unq(other))
  }

  /** Split on commas not nested in parens, single quotes or backquotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inQ = false
    var inBq = false
    var esc = false
    val cur = new StringBuilder
    s.foreach { c =>
      if (esc) { esc = false; cur += c }
      else c match {
        case '\\' if inQ => esc = true; cur += c
        case '\'' if !inBq => inQ = !inQ; cur += c
        case '`' if !inQ => inBq = !inBq; cur += c
        case '(' if !inQ && !inBq => depth += 1; cur += c
        case ')' if !inQ && !inBq => depth -= 1; cur += c
        case ',' if depth == 0 && !inQ && !inBq =>
          out += cur.toString.trim; cur.clear()
        case other => cur += other
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  /** Evaluate aggregates over the (already WHERE-filtered) rows with the
    * real server's semantics: a PLAIN aggregate over a group that received
    * no values answers the result type's default (0 / '' / nan), an
    * `-OrNull`-combined one answers NULL; count never needs the
    * combinator (0 on empty). Returns the response columns as (name, CH
    * type text) plus the result rows in stored-canonical form, ready for
    * [[encodeNative]].
    *
    * Result types mirror the server's derivation — count → UInt64,
    * min/max → column type with the LowCardinality wrapper stripped
    * (Nullable(LowCardinality(...)) is illegal), sum → Int64 for signed /
    * UInt64 for unsigned / Float64 for floats, avg → Float64, each
    * Nullable-wrapped under -OrNull — EXCEPT where the query carries an
    * explicit `CAST(... AS type)`: then the cast target IS the response
    * type, exactly as on a real server. The READER always casts, so its
    * expectations never depend on the derivation rules. */
  def aggregate(items: Seq[Item], groupBy: Seq[String],
                rows: Seq[Map[String, Any]],
                rawTypes: Map[String, String]): (Seq[(String, String)], Seq[Map[String, Any]]) = {
    def rawOf(c: String): String =
      rawTypes.getOrElse(c, throw CHFault(47, s"Unknown identifier $c"))
    def stripLCOf(t: String): CHType = {
      def lc(x: CHType): CHType = x match {
        case CHType.CHLowCardinality(i) => lc(i)
        case CHType.CHNullable(i) => CHType.CHNullable(lc(i))
        case o => o
      }
      lc(CHType.parse(t))
    }
    def isSignedStored(c: String): Boolean = strip(CHType.parse(rawOf(c))) match {
      case CHType.CHInt(_) => true
      case _ => false
    }
    def isUnsignedStored(c: String): Boolean = strip(CHType.parse(rawOf(c))) match {
      case CHType.CHUInt(_) => true
      case _ => false
    }
    def isIntStored(c: String): Boolean = isSignedStored(c) || isUnsignedStored(c)
    def isFloatStored(c: String): Boolean = strip(CHType.parse(rawOf(c))) match {
      case CHType.CHFloat32 | CHType.CHFloat64 => true
      case _ => false
    }
    def derived(func: String, orNull: Boolean, arg: Option[String]): String = {
      val base = (func, arg) match {
        case ("count", _) => "UInt64"
        case ("min" | "max", Some(c)) => CHType.render(stripLCOf(rawOf(c)))
        case ("sum", Some(c)) if isSignedStored(c) => "Int64"
        case ("sum", Some(c)) if isUnsignedStored(c) => "UInt64"
        case ("sum", Some(c)) if isFloatStored(c) => "Float64"
        case ("avg", Some(c)) if isIntStored(c) || isFloatStored(c) => "Float64"
        case (f, a) => throw CHFault(43, s"Illegal argument $a of aggregate function $f")
      }
      if (orNull && !base.startsWith("Nullable(")) s"Nullable($base)" else base
    }
    val colTypes: Seq[(String, String)] = items.map {
      case ColItem(c) =>
        if (!groupBy.contains(c))
          throw CHFault(215, s"Column $c is not under an aggregate function and not in GROUP BY")
        c -> rawOf(c)
      case AggItem(func, orNull, arg, castTo, alias) =>
        derived(func, orNull, arg) // validates the argument even when cast
        val t = castTo.getOrElse(derived(func, orNull, arg))
        try CHType.parse(t)
        catch { case e: Exception => throw CHFault(50, s"Unknown cast type $t: ${e.getMessage}") }
        alias -> t
    }
    val grouped: Seq[(Seq[Any], Seq[Map[String, Any]])] =
      if (groupBy.isEmpty) Seq((Nil, rows))
      else rows.groupBy(r => groupBy.map(c =>
        r.getOrElse(c, throw CHFault(47, s"Unknown identifier $c")))).toSeq
        .map { case (k, v) => (k, v) }
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: BigInt, y: BigInt) => x.compare(y)
      case (x: Long, y: Long) => java.lang.Long.compare(x, y)
      case (x: Double, y: Double) => java.lang.Double.compare(x, y)
      case (x: BigDecimal, y: BigDecimal) => x.compare(y)
      case (x: String, y: String) => x.compareTo(y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case _ => throw CHFault(43, s"Cannot order ${a.getClass.getSimpleName}")
    }
    def toDouble(v: Any): Double = v match {
      case x: BigInt => x.toDouble
      case x: Long => x.toDouble
      case x: Double => x
      case x: BigDecimal => x.toDouble
      case other => throw CHFault(43, s"Non-numeric ${other.getClass.getSimpleName}")
    }
    val out = grouped.map { case (key, members) =>
      val base = groupBy.zip(key).toMap
      // "received no values" → NULL under -OrNull, the type default for
      // plain aggregates (a Nullable input column's default is NULL)
      def onEmpty(orNull: Boolean, c: String): Any =
        if (orNull) null
        else stripLCOf(rawOf(c)) match {
          case CHType.CHNullable(_) => null
          case inner => defaultOf(inner)
        }
      val aggVals = items.collect {
        case AggItem("count", orNull, None, _, alias) =>
          alias -> (if (orNull && members.isEmpty) null else BigInt(members.size))
        case AggItem("count", orNull, Some(c), _, alias) =>
          val n = members.count(_.getOrElse(c, null) != null)
          alias -> (if (orNull && n == 0) null else BigInt(n))
        case AggItem(f @ ("min" | "max"), orNull, Some(c), _, alias) =>
          val vs = members.map(_.getOrElse(c, null)).filter(_ != null)
          alias -> (if (vs.isEmpty) onEmpty(orNull, c)
            else if (f == "min") vs.reduce((a, b) => if (cmp(a, b) <= 0) a else b)
            else vs.reduce((a, b) => if (cmp(a, b) >= 0) a else b))
        case AggItem("sum", orNull, Some(c), _, alias) =>
          val vs = members.map(_.getOrElse(c, null)).filter(_ != null)
          alias -> (if (vs.isEmpty) { if (orNull) null
              else if (isIntStored(c)) BigInt(0) else 0.0 }
            else if (isIntStored(c)) vs.map {
              case x: BigInt => x
              case x: Long => BigInt(x)
              case other => throw CHFault(43, s"Non-integer $other in sum")
            }.sum
            else vs.map(toDouble).sum)
        case AggItem("avg", orNull, Some(c), _, alias) =>
          val vs = members.map(_.getOrElse(c, null)).filter(_ != null)
          alias -> (if (vs.isEmpty) { if (orNull) null else Double.NaN }
            else vs.map(toDouble).sum / vs.size)
      }.toMap
      base ++ aggVals
    }
    (colTypes, out)
  }

  private def strip(t: CHType): CHType = t match {
    case CHType.CHLowCardinality(i) => strip(i)
    case CHType.CHNullable(i) => strip(i)
    case other => other
  }

  private def unq(id: String): String = {
    val t = id.trim
    if (t.length >= 2 && t.head == '`' && t.last == '`')
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

  // ----------------------------------------------------------- ORDER BY

  /** One ORDER BY key: column, ascending?, nulls-first?. */
  final case class OrderKey(col: String, asc: Boolean, nullsFirst: Boolean)

  /** Parse `c1 ASC NULLS LAST, c2 DESC NULLS FIRST, c3` — direction
    * defaults ASC; the NULLS clause defaults to ClickHouse's documented
    * default, NULLS LAST, independent of direction. */
  def parseOrderBy(s: String): Seq[OrderKey] =
    s.split(",").map(_.trim).toSeq.map { entry =>
      val rx = """(?is)^(`[^`]*`|[A-Za-z0-9_]+)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$""".r
      entry match {
        case rx(col, dir, nulls) =>
          OrderKey(unq(col),
            asc = dir == null || dir.equalsIgnoreCase("ASC"),
            nullsFirst = nulls != null && nulls.equalsIgnoreCase("FIRST"))
        case other => throw CHFault(62, s"Syntax error in ORDER BY near: $other")
      }
    }

  /** Stable multi-key sort over stored canonical rows. */
  def orderRows(rows: Seq[Map[String, Any]], keys: Seq[OrderKey]): Seq[Map[String, Any]] = {
    val ord = new Ordering[Map[String, Any]] {
      def compare(a: Map[String, Any], b: Map[String, Any]): Int = {
        var i = 0
        while (i < keys.length) {
          val k = keys(i)
          if (!a.contains(k.col))
            throw CHFault(47, s"Unknown identifier ${k.col} in ORDER BY")
          val va = a(k.col)
          val vb = b.getOrElse(k.col, null)
          val c = (va, vb) match {
            case (null, null) => 0
            case (null, _) => if (k.nullsFirst) -1 else 1
            case (_, null) => if (k.nullsFirst) 1 else -1
            case (x, y) =>
              val base = orderCmp(x, y)
              if (k.asc) base else -base
          }
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
    rows.sorted(ord) // sorted is stable
  }

  private def orderCmp(a: Any, b: Any): Int = (a, b) match {
    case (x: BigInt, y: BigInt) => x.compare(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw CHFault(43, s"Cannot order ${a.getClass.getSimpleName}")
  }

  // --------------------------------------- stored values → Native response

  /** Encode stored canonical rows as one `FORMAT Native` block. Column
    * type text is the table's raw declared text. LowCardinality columns
    * follow the real server's `low_cardinality_allow_in_native_format`
    * semantics: with `lcNative` (the default) they ship DICTIONARY-
    * encoded under their LC-declared type; without it they are converted
    * to ordinary — the header declares the INNER type and the data is a
    * plain full column, exactly what a real server answers under the
    * setting. */
  def encodeNative(cols: Seq[(String, String)], rows: Seq[Map[String, Any]],
                   lcNative: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 12)
    varint(out, cols.length.toLong)
    varint(out, rows.length.toLong)
    cols.foreach { case (name, typeText) =>
      str(out, name)
      val t = CHType.parse(typeText)
      val declared =
        if (lcNative) t
        else stripLcForWire(t) // converted-to-ordinary declares the inner type
      str(out, CHType.render(declared) match {
        // keep the table's verbatim spelling when nothing was stripped
        // (render canonicalizes whitespace; header text should stay raw)
        case _ if declared eq t => typeText
        case rendered => rendered
      })
      // LC keys-serialization versions are substream state PREFIXES:
      // written once per LC in the declared tree BEFORE any bulk data,
      // so Array(LowCardinality(T)) ships version, offsets, dict body —
      // the order a real server's NativeWriter produces. 0-row responses
      // carry no column bytes at all, prefixes included.
      if (rows.nonEmpty) writeLcVersions(out, declared)
      writeColumn(out, declared, rows.map(_.getOrElse(name, null)))
    }
    out.toByteArray
  }

  private def writeLcVersions(out: java.io.ByteArrayOutputStream, t: CHType): Unit = {
    import CHType._
    t match {
      case CHLowCardinality(_) => i64(out, 1L)
      case CHNullable(i) => writeLcVersions(out, i)
      case CHArray(i) => writeLcVersions(out, i)
      case CHMap(k, v) => writeLcVersions(out, k); writeLcVersions(out, v)
      case CHTuple(elems) => elems.foreach(e => writeLcVersions(out, e._2))
      case _ => ()
    }
  }

  private def stripLcForWire(t: CHType): CHType = {
    import CHType._
    t match {
      case CHLowCardinality(i) => stripLcForWire(i)
      case CHNullable(i) => CHNullable(stripLcForWire(i))
      case CHArray(i) => CHArray(stripLcForWire(i))
      case CHMap(k, v) => CHMap(stripLcForWire(k), stripLcForWire(v))
      case CHTuple(elems) => CHTuple(elems.map { case (n, et) => (n, stripLcForWire(et)) })
      case other => other
    }
  }

  private def writeColumn(out: java.io.ByteArrayOutputStream, t: CHType,
                          vals: Seq[Any]): Unit = {
    import CHType._
    t match {
      // the real server's LC dictionary serialization — an INDEPENDENT
      // second implementation of the layout the production NativeDecoder
      // reads (round-trip tests are therefore not self-validating):
      // flags = key-width | HasAdditionalKeys(512), dict size, dict
      // column (inner type, Nullable stripped; index 0 = default
      // placeholder, the NULL slot for Nullable inners), keys count, keys.
      // The u64 version=1 prefix is hoisted to [[writeLcVersions]] —
      // before the enclosing column's bulk data, offsets included.
      // A 0-row block writes NO bytes for the column (NativeWriter's
      // if-rows guard — prefix included).
      case CHLowCardinality(inner) =>
        if (vals.isEmpty) return
        val (base, nullable) = inner match {
          case CHNullable(i) => (i, true)
          case o => (o, false)
        }
        val dictVals = scala.collection.mutable.ArrayBuffer[Any](defaultOf(base))
        val idxOf = scala.collection.mutable.HashMap[Any, Int]()
        // non-nullable: a stored default value maps to slot 0; nullable:
        // slot 0 is RESERVED for NULL, every real value gets its own
        if (!nullable) idxOf(dictVals.head) = 0
        val keys = vals.map {
          case null =>
            if (!nullable) throw CHFault(349,
              s"Cannot convert NULL to non-Nullable LowCardinality(${CHType.render(base)})")
            0
          case v => idxOf.getOrElseUpdate(v, { dictVals += v; dictVals.size - 1 })
        }
        val widthCode = if (dictVals.size <= 0xff) 0 else if (dictVals.size <= 0xffff) 1 else 2
        i64(out, 512L | widthCode.toLong) // HasAdditionalKeys | key width
        i64(out, dictVals.size.toLong)
        writeColumn(out, base, dictVals.toSeq)
        i64(out, keys.size.toLong)
        keys.foreach { k =>
          widthCode match {
            case 0 => out.write(k & 0xff)
            case 1 => i16(out, k)
            case 2 => i32(out, k)
          }
        }
      case CHNullable(inner) =>
        vals.foreach(v => out.write(if (v == null) 1 else 0))
        writeColumn(out, inner, vals.map(v => if (v == null) defaultOf(inner) else v))
      case CHArray(inner) =>
        var total = 0L
        vals.foreach { v =>
          total += (if (v == null) 0 else v.asInstanceOf[Seq[Any]].size)
          i64(out, total)
        }
        writeColumn(out, inner,
          vals.flatMap(v => if (v == null) Nil else v.asInstanceOf[Seq[Any]]))
      case CHMap(_, vt) =>
        val ms = vals.map(v => if (v == null) Map.empty[String, Any]
          else v.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1))
        var total = 0L
        ms.foreach { m => total += m.size; i64(out, total) }
        ms.flatten.foreach { case (k, _) => str(out, k) }
        writeColumn(out, vt, ms.flatten.map(_._2).toSeq)
      case tt @ CHTuple(elems) =>
        elems.zip(tt.elementNames).foreach { case ((_, et), en) =>
          writeColumn(out, et, vals.map {
            case null => defaultOf(et)
            case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(en, null)
            case v: Seq[_] =>
              val i = tt.elementNames.indexOf(en)
              if (i < v.size) v(i) else null
            case other => throw CHFault(53, s"Bad stored tuple $other")
          })
        }
      case scalar => vals.foreach(v => writeScalar(out, scalar, v))
    }
  }

  /** Default inner value a Nullable column's null slots carry (the column
    * must stay rectangular on the wire). */
  private def defaultOf(t: CHType): Any = {
    import CHType._
    t match {
      case CHString | CHFixedString(_) => ""
      case CHBool => false
      case CHInt(_) | CHUInt(_) => BigInt(0)
      case CHFloat32 | CHFloat64 => 0.0
      case CHDecimal(_, s) => BigDecimal(0).setScale(s)
      case CHDate | CHDate32 | CHDateTime(_) | CHDateTime64(_, _) => 0L
      case CHEnum(_, values) => values.minBy(_._2)._1
      case CHUUID => "00000000-0000-0000-0000-000000000000"
      case CHIPv4 => "0.0.0.0"
      case CHIPv6 => "::"
      case CHLowCardinality(i) => defaultOf(i)
      case CHNullable(i) => defaultOf(i)
      case CHArray(_) => Vector.empty
      case CHMap(_, _) => Map.empty
      case CHTuple(_) => Map.empty
    }
  }

  private def writeScalar(out: java.io.ByteArrayOutputStream, t: CHType, v: Any): Unit = {
    import CHType._
    // a NULL reaching a non-Nullable column (e.g. CAST(minOrNull(...) AS
    // a non-Nullable type) over an empty set) is the real server's error
    if (v == null)
      throw CHFault(349, s"Cannot convert NULL value to non-Nullable type ${CHType.render(t)}")
    t match {
      case CHString => str(out, String.valueOf(v))
      case CHFixedString(w) =>
        val b = String.valueOf(v).getBytes(UTF_8)
        if (b.length > w) throw CHFault(131, s"Too large value for FixedString($w)")
        out.write(b, 0, b.length)
        (b.length until w).foreach(_ => out.write(0))
      case CHBool => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case CHInt(8) => out.write(num(v).toInt & 0xff)
      case CHInt(16) => i16(out, num(v).toInt)
      case CHInt(32) => i32(out, num(v).toInt)
      case CHInt(_) => i64(out, num(v))
      case CHUInt(8) => out.write(num(v).toInt & 0xff)
      case CHUInt(16) => i16(out, num(v).toInt)
      case CHUInt(32) => i32(out, num(v).toInt)
      case CHUInt(_) => i64(out, num(v)) // BigInt two's-complement low 64
      case CHFloat32 =>
        i32(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Double].toFloat))
      case CHFloat64 =>
        i64(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case CHDecimal(p, s) =>
        val unscaled = v.asInstanceOf[BigDecimal].setScale(s).bigDecimal
          .unscaledValue()
        val width = if (p <= 9) 4 else if (p <= 18) 8 else 16
        val src = unscaled.toByteArray // big-endian two's complement
        val fill: Byte = if (unscaled.signum() < 0) -1 else 0
        var i = 0
        while (i < width) { // little-endian out
          val bi = src.length - 1 - i
          out.write(if (bi >= 0) src(bi) else fill)
          i += 1
        }
      case CHDate => i16(out, v.asInstanceOf[Long].toInt)
      case CHDate32 => i32(out, v.asInstanceOf[Long].toInt)
      case CHDateTime(_) => i32(out, (v.asInstanceOf[Long] / 1000000L).toInt)
      case CHDateTime64(p, _) =>
        val micros = v.asInstanceOf[Long]
        if (p <= 6) {
          var div = 1L; var i = p
          while (i < 6) { div *= 10; i += 1 }
          i64(out, Math.floorDiv(micros, div))
        } else {
          var mul = 1L; var i = 6
          while (i < p) { mul *= 10; i += 1 }
          i64(out, micros * mul)
        }
      case CHEnum(bits, values) =>
        val id = values.getOrElse(String.valueOf(v),
          throw CHFault(691, s"Unknown enum label $v"))
        if (bits == 8) out.write(id & 0xff) else i16(out, id)
      case CHUUID =>
        val u = java.util.UUID.fromString(String.valueOf(v))
        i64(out, u.getMostSignificantBits); i64(out, u.getLeastSignificantBits)
      case CHIPv4 =>
        i32(out, IpCodec.parseV4(String.valueOf(v))
          .getOrElse(throw CHFault(441, s"Bad IPv4 $v")).toInt)
      case CHIPv6 =>
        val b = IpCodec.parseV6(String.valueOf(v))
          .getOrElse(throw CHFault(441, s"Bad IPv6 $v"))
        out.write(b, 0, 16)
      case other => throw CHFault(48, s"SELECT over $other not supported by fixture")
    }
  }

  private def num(v: Any): Long = v match {
    case b: BigInt => b.longValue // two's-complement low bits (UInt64-safe)
    case l: Long => l
    case i: Int => i.toLong
    case other => throw CHFault(53, s"Bad stored numeric $other")
  }

  private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def str(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    varint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  private def i16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def i32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  private def i64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
}
