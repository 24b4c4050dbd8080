package graft.exprs

import Expr._

/** Hand-written lexer + recursive-descent parser for the expr-lang subset
  * (public language; only the constructs the reference's configs use:
  * comparison/arithmetic/boolean operators, `in`, `matches`, ternary,
  * literals, dotted identifiers, list literals, indexing, function calls).
  */
object Parser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  // ---- lexer ----
  sealed trait Tok
  case class TIdent(s: String) extends Tok
  case class TNum(s: String) extends Tok
  case class TStr(s: String) extends Tok
  case class TOp(s: String) extends Tok
  case object TEof extends Tok

  private val twoCharOps = Set("==", "!=", "<=", ">=", "&&", "||", "??")
  private val oneCharOps = Set("(", ")", "[", "]", ",", "?", ":", ".",
    "+", "-", "*", "/", "%", "<", ">", "!")

  def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && src(i + 1).isDigit)) {
        val start = i
        while (i < n && (src(i).isDigit || src(i) == '.' || src(i) == '_' ||
          src(i) == 'e' || src(i) == 'E' ||
          ((src(i) == '+' || src(i) == '-') && (src(i - 1) == 'e' || src(i - 1) == 'E')))) i += 1
        out += TNum(src.substring(start, i).replace("_", ""))
      } else if (c.isLetter || c == '_' || c == '$' || c == '@') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_' || src(i) == '$' || src(i) == '@')) i += 1
        out += TIdent(src.substring(start, i))
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) {
            src(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
              case other => sb += other
            }
            i += 2
          } else { sb += src(i); i += 1 }
        }
        if (i >= n) throw ParseException(s"unterminated string literal in: $src")
        i += 1
        out += TStr(sb.toString)
      } else if (i + 1 < n && twoCharOps(src.substring(i, i + 2))) {
        out += TOp(src.substring(i, i + 2)); i += 2
      } else if (oneCharOps(c.toString)) {
        out += TOp(c.toString); i += 1
      } else throw ParseException(s"unexpected character '$c' at $i in: $src")
    }
    out += TEof
    out.result()
  }

  // ---- parser ----
  def parse(src: String): Expr = {
    val p = new P(lex(src), src)
    val e = p.ternary()
    p.expect(TEof)
    e
  }

  private final class P(toks: Vector[Tok], src: String) {
    private var pos = 0
    def peek: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expect(t: Tok): Unit =
      if (next() != t) throw ParseException(s"expected $t in: $src")
    private def eatOp(s: String): Boolean = peek match {
      case TOp(`s`) => pos += 1; true
      case _ => false
    }
    private def eatIdent(s: String): Boolean = peek match {
      case TIdent(`s`) => pos += 1; true
      case _ => false
    }

    def ternary(): Expr = {
      val c = or()
      if (eatOp("?")) {
        val t = ternary()
        if (!eatOp(":")) throw ParseException(s"expected ':' in ternary in: $src")
        Ternary(c, t, ternary())
      } else if (eatOp("??")) {
        Call("coalesce", Seq(c, ternary()))
      } else c
    }

    private def or(): Expr = {
      var l = and()
      while (eatOp("||") || eatIdent("or")) l = Binary("||", l, and())
      l
    }

    private def and(): Expr = {
      var l = cmp()
      while (eatOp("&&") || eatIdent("and")) l = Binary("&&", l, cmp())
      l
    }

    private def cmp(): Expr = {
      var l = add()
      var done = false
      while (!done) peek match {
        case TOp(op @ ("==" | "!=" | "<" | "<=" | ">" | ">=")) =>
          pos += 1; l = Binary(op, l, add())
        case TIdent("in") => pos += 1; l = Binary("in", l, add())
        case TIdent("matches") => pos += 1; l = Binary("matches", l, add())
        case TIdent("contains") => pos += 1; l = Call("containsStr", Seq(l, add()))
        case TIdent("startsWith") => pos += 1; l = Call("hasPrefix", Seq(l, add()))
        case TIdent("endsWith") => pos += 1; l = Call("hasSuffix", Seq(l, add()))
        case TIdent("not") =>
          pos += 1
          if (eatIdent("in")) l = Unary("!", Binary("in", l, add()))
          else throw ParseException(s"expected 'in' after 'not' in: $src")
        case _ => done = true
      }
      l
    }

    private def add(): Expr = {
      var l = mul()
      var done = false
      while (!done) peek match {
        case TOp(op @ ("+" | "-")) => pos += 1; l = Binary(op, l, mul())
        case _ => done = true
      }
      l
    }

    private def mul(): Expr = {
      var l = unary()
      var done = false
      while (!done) peek match {
        case TOp(op @ ("*" | "/" | "%")) => pos += 1; l = Binary(op, l, unary())
        case _ => done = true
      }
      l
    }

    private def unary(): Expr = peek match {
      case TOp("!") => pos += 1; Unary("!", unary())
      case TIdent("not") => pos += 1; Unary("!", unary())
      case TOp("-") => pos += 1; Unary("-", unary())
      case _ => postfix()
    }

    private def postfix(): Expr = {
      var e = primary()
      var done = false
      while (!done) peek match {
        case TOp("[") =>
          pos += 1
          val k = ternary()
          if (!eatOp("]")) throw ParseException(s"expected ']' in: $src")
          e = Index(e, k)
        case TOp(".") =>
          pos += 1
          next() match {
            case TIdent(name) => e = e match {
              case Ident(path) => Ident(path :+ name)
              case other => Index(other, Lit(name))
            }
            case t => throw ParseException(s"expected identifier after '.', got $t in: $src")
          }
        case _ => done = true
      }
      e
    }

    private def primary(): Expr = next() match {
      case TNum(s) =>
        if (s.contains('.') || s.contains('e') || s.contains('E')) Lit(s.toDouble)
        else Lit(s.toLong)
      case TStr(s) => Lit(s)
      case TIdent("true") => Lit(true)
      case TIdent("false") => Lit(false)
      case TIdent("nil") | TIdent("null") => Lit(null)
      case TIdent(name) =>
        if (eatOpPeekCall()) {
          // function call
          val args = Seq.newBuilder[Expr]
          if (peek != TOp(")")) {
            args += ternary()
            while (eatOp(",")) args += ternary()
          }
          if (!eatOp(")")) throw ParseException(s"expected ')' in call to $name in: $src")
          Call(name, args.result())
        } else Ident(Seq(name))
      case TOp("(") =>
        val e = ternary()
        if (!eatOp(")")) throw ParseException(s"expected ')' in: $src")
        e
      case TOp("[") =>
        val items = Seq.newBuilder[Expr]
        if (peek != TOp("]")) {
          items += ternary()
          while (eatOp(",")) items += ternary()
        }
        if (!eatOp("]")) throw ParseException(s"expected ']' in: $src")
        ArrayLit(items.result())
      case t => throw ParseException(s"unexpected token $t in: $src")
    }

    private def eatOpPeekCall(): Boolean = peek match {
      case TOp("(") => pos += 1; true
      case _ => false
    }
  }
}
