package graft.exprs

/** AST for the expr-lang subset the reference engine accepts in filter and
  * transform configs (see SURVEY.md §2.6; reference:
  * glassflow-api/internal/filter/json/filter.go:22-25,
  * glassflow-api/internal/transformer/json/transformation.go:22-47).
  *
  * The language is compiled once per pipeline into a Catalyst [[org.apache.spark.sql.Column]]
  * (see [[ExprCompiler]]) so per-row evaluation happens inside whole-stage
  * codegen instead of an interpreter VM.
  */
sealed trait Expr

object Expr {
  /** Literal: Long, Double, String, Boolean, or null (expr-lang `nil`). */
  final case class Lit(value: Any) extends Expr
  /** Possibly-dotted identifier, e.g. `user.id` (resolved literal-first,
    * then as a nested path — reference schema_v2/validate.go:64-87). */
  final case class Ident(path: Seq[String]) extends Expr
  /** `!x`, `not x`, `-x` */
  final case class Unary(op: String, e: Expr) extends Expr
  /** Binary op: == != < <= > >= && || + - * / % in matches */
  final case class Binary(op: String, l: Expr, r: Expr) extends Expr
  /** `cond ? a : b` */
  final case class Ternary(cond: Expr, ifTrue: Expr, ifFalse: Expr) extends Expr
  /** Function call, e.g. `upper(name)` — resolved against [[Stdlib]]. */
  final case class Call(name: String, args: Seq[Expr]) extends Expr
  /** `[a, b, c]` */
  final case class ArrayLit(items: Seq[Expr]) extends Expr
  /** `m["k"]` / `arr[0]` */
  final case class Index(target: Expr, key: Expr) extends Expr
}
