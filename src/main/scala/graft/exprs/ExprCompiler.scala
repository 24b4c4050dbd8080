package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Expr._

/** Compiles an expr-lang AST into a Catalyst [[Column]] against a known input
  * schema. This replaces the reference's per-row expr VM evaluation
  * (glassflow-api/internal/filter/json/filter.go:37-54) with a declarative
  * expression that Catalyst constant-folds, pushes down, and whole-stage
  * codegens — compile once, evaluate vectorized.
  *
  * Identifier resolution follows the reference's dual strategy
  * (internal/schema_v2/validate.go:64-87): a dotted name is first looked up
  * as a literal column name ("user.id" the flat column), then as a nested
  * struct path (user.id inside struct user).
  */
object ExprCompiler {

  final case class CompileException(msg: String) extends RuntimeException(msg)

  def compile(src: String, schema: StructType): Column =
    toColumn(Parser.parse(src), schema)

  /** Validate-only entry point (mirrors the reference's
    * POST /filter/validate semantics: compile must succeed). */
  def validate(src: String, schema: StructType): Either[String, Unit] =
    try { compile(src, schema); Right(()) }
    catch { case e: Exception => Left(e.getMessage) }

  def toColumn(e: Expr, schema: StructType): Column = e match {
    case Lit(null) => lit(null)
    case Lit(v) => lit(v)
    case Ident(path) => resolve(path, schema)._1
    case ArrayLit(items) => array(items.map(toColumn(_, schema)): _*)
    // expr-lang m["missing"] yields nil, so the try_ variant (ANSI mode
    // element_at throws on absent keys)
    case Index(t, k) => try_element_at(toColumn(t, schema), toColumn(k, schema))

    case Unary("!", x) => !toColumn(x, schema)
    case Unary("-", x) => negate(toColumn(x, schema))
    case Unary(op, _) => throw CompileException(s"unknown unary op $op")

    // `== nil` / `!= nil` are null tests in expr-lang, not SQL null-propagation
    case Binary("==", x, Lit(null)) => toColumn(x, schema).isNull
    case Binary("==", Lit(null), x) => toColumn(x, schema).isNull
    case Binary("!=", x, Lit(null)) => toColumn(x, schema).isNotNull
    case Binary("!=", Lit(null), x) => toColumn(x, schema).isNotNull

    case Binary("+", l, r) =>
      if (isString(l, schema) || isString(r, schema))
        concat(asString(l, schema), asString(r, schema))
      else toColumn(l, schema) + toColumn(r, schema)

    case Binary(op, l, r) =>
      val (lc, rc) = (toColumn(l, schema), toColumn(r, schema))
      op match {
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case "<" => lc < rc
        case "<=" => lc <= rc
        case ">" => lc > rc
        case ">=" => lc >= rc
        case "&&" => lc && rc
        case "||" => lc || rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" => lc / rc
        case "%" => lc % rc
        // Literal patterns are held to the dialect both engines share: the
        // reference runs Go/RE2, we run java.util.regex — Java-only
        // constructs are rejected at compile/validation time (silent
        // semantic divergence otherwise), and RE2-only spellings both
        // engines can express are translated to their Java form.
        case "matches" =>
          r match {
            case Lit(p: String) =>
              Re2Dialect.violation(p).foreach(v =>
                throw CompileException(s"matches pattern not RE2-compatible: $v"))
              regexp_like(lc, lit(Re2Dialect.toJava(p)))
            case _ => regexp_like(lc, rc)
          }
        case "in" => compileIn(l, r, schema)
        case other => throw CompileException(s"unknown operator $other")
      }

    case Ternary(c, t, f) =>
      when(toColumn(c, schema), toColumn(t, schema)).otherwise(toColumn(f, schema))

    case Call(name, args) => Stdlib(name, args, schema)
  }

  /** expr-lang `x in list` / `key in map` / `x in array-column`. */
  private def compileIn(l: Expr, r: Expr, schema: StructType): Column = r match {
    case ArrayLit(items) if items.forall(_.isInstanceOf[Lit]) =>
      toColumn(l, schema).isin(items.collect { case Lit(v) => v }: _*)
    case _ =>
      val rc = toColumn(r, schema)
      typeOf(r, schema) match {
        case Some(_: MapType) => map_contains_key(rc, toColumn(l, schema))
        case _ => array_contains(rc, toColumn(l, schema))
      }
  }

  /** Literal-dotted-name-first, then nested-path resolution. */
  def resolve(path: Seq[String], schema: StructType): (Column, Option[DataType]) = {
    val dotted = path.mkString(".")
    schema.fields.find(_.name == dotted) match {
      case Some(f) => (col(s"`$dotted`"), Some(f.dataType))
      case None =>
        schema.fields.find(_.name == path.head) match {
          case Some(root) =>
            var dt: Option[DataType] = Some(root.dataType)
            var c = col(path.head)
            path.tail.foreach { seg =>
              c = c.getField(seg)
              dt = dt.flatMap {
                case s: StructType => s.fields.find(_.name == seg).map(_.dataType)
                case m: MapType => Some(m.valueType)
                case _ => None
              }
            }
            (c, dt)
          case None =>
            throw CompileException(s"unknown field: $dotted (schema: ${schema.fieldNames.mkString(",")})")
        }
    }
  }

  /** Top-level input columns an expression references (dotted names resolve
    * literal-first like [[resolve]]). Used for column pruning around opaque
    * stages (mapPartitions) that Catalyst can't see through. */
  def referencedFields(src: String, schema: StructType): Set[String] = {
    def walk(e: Expr): Set[String] = e match {
      case Ident(path) =>
        val dotted = path.mkString(".")
        if (schema.fieldNames.contains(dotted)) Set(dotted) else Set(path.head)
      case Lit(_) => Set.empty
      case Unary(_, x) => walk(x)
      case Binary(_, l, r) => walk(l) ++ walk(r)
      case Ternary(c, t, f) => walk(c) ++ walk(t) ++ walk(f)
      case Call(_, args) => args.flatMap(walk).toSet
      case ArrayLit(items) => items.flatMap(walk).toSet
      case Index(t, k) => walk(t) ++ walk(k)
    }
    walk(Parser.parse(src))
  }

  // ---- minimal static typing (enough to pick string-concat vs addition) ----
  def typeOf(e: Expr, schema: StructType): Option[DataType] = e match {
    case Lit(_: String) => Some(StringType)
    case Lit(_: java.lang.Long) | Lit(_: java.lang.Integer) => Some(LongType)
    case Lit(_: java.lang.Double) => Some(DoubleType)
    case Lit(_: java.lang.Boolean) => Some(BooleanType)
    case Lit(_) => None
    case Ident(path) =>
      try resolve(path, schema)._2 catch { case _: Exception => None }
    case Ternary(_, t, _) => typeOf(t, schema)
    case Binary("+", l, r) =>
      if (isString(l, schema) || isString(r, schema)) Some(StringType)
      else typeOf(l, schema).orElse(typeOf(r, schema))
    case Binary("==" | "!=" | "<" | "<=" | ">" | ">=" | "&&" | "||" | "in" | "matches", _, _) =>
      Some(BooleanType)
    case Binary(_, l, r) => typeOf(l, schema).orElse(typeOf(r, schema))
    case Unary("!", _) => Some(BooleanType)
    case Unary(_, x) => typeOf(x, schema)
    case ArrayLit(items) => items.headOption.flatMap(typeOf(_, schema)).map(ArrayType(_))
    case Index(t, _) => typeOf(t, schema).flatMap {
      case a: ArrayType => Some(a.elementType)
      case m: MapType => Some(m.valueType)
      case _ => None
    }
    case Call(name, _) => Stdlib.returnType(name)
  }

  def isString(e: Expr, schema: StructType): Boolean =
    typeOf(e, schema).contains(StringType)

  private def asString(e: Expr, schema: StructType): Column =
    if (isString(e, schema)) toColumn(e, schema)
    else toColumn(e, schema).cast(StringType)
}
