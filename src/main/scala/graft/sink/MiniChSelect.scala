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
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr

  sealed trait Lit
  final case class NumLit(v: BigDecimal) extends Lit
  final case class StrLit(v: String) extends Lit
  final case class BoolLit(v: Boolean) extends Lit

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

    private def literal(): Lit = {
      skipWs()
      if (atEnd) throw CHFault(62, "Syntax error: expected literal")
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
    case InList(c, lits) =>
      val v = colValue(c, row)
      if (v == null) None
      else Some(lits.exists(l => compare(v, l).contains(0)))
    case Like(c, pat) =>
      colValue(c, row) match {
        case null => None
        case v => Some(likeMatch(String.valueOf(v), pat))
      }
    case Cmp(c, op, lit) =>
      val v = colValue(c, row)
      if (v == null) None
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
    case (n: Double, NumLit(l)) => Some(BigDecimal(n).compare(l))
    case (n: BigDecimal, NumLit(l)) => Some(n.compare(l))
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

  // --------------------------------------- stored values → Native response

  /** Encode stored canonical rows as one `FORMAT Native` block. Column
    * type text is the table's raw declared text; LowCardinality data is
    * sent as the plain inner column (the behavior the reader requests via
    * low_cardinality_allow_in_native_format=0). */
  def encodeNative(cols: Seq[(String, String)], rows: Seq[Map[String, Any]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 12)
    varint(out, cols.length.toLong)
    varint(out, rows.length.toLong)
    cols.foreach { case (name, typeText) =>
      str(out, name)
      str(out, typeText)
      val t = CHType.parse(typeText)
      writeColumn(out, t, rows.map(_.getOrElse(name, null)))
    }
    out.toByteArray
  }

  private def writeColumn(out: java.io.ByteArrayOutputStream, t: CHType,
                          vals: Seq[Any]): Unit = {
    import CHType._
    t match {
      case CHLowCardinality(inner) => writeColumn(out, inner, vals)
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
