package graft.exprs

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

class ExprSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(expr: String, df: org.apache.spark.sql.DataFrame): Any =
    df.select(ExprCompiler.compile(expr, df.schema).as("out")).head.get(0)

  private lazy val sample = Seq(
    ("a1", "login", 42L, 3.7, "u1@x.io", "2025-01-01T10:00:00Z")
  ).toDF("id", "action", "n", "f", "email", "ts")

  test("comparisons, boolean ops, ternary") {
    assert(eval1("n == 42 && action == 'login'", sample) == true)
    assert(eval1("n != 42 || f > 10.0", sample) == false)
    assert(eval1("n >= 42 ? 'big' : 'small'", sample) == "big")
    assert(eval1("!(n < 0)", sample) == true)
    assert(eval1("not (n < 0)", sample) == true)
    assert(eval1("n > 40 and f < 4.0", sample) == true)
    assert(eval1("n < 40 or f < 4.0", sample) == true)
  }

  test("arithmetic and string concat pick the right +") {
    assert(eval1("n + 8", sample) == 50L)
    assert(eval1("n * 2 - 4", sample) == 80L)
    assert(eval1("n % 5", sample) == 2L)
    assert(eval1("action + '_' + id", sample) == "login_a1")
    assert(eval1("'v' + toString(n)", sample) == "v42")
  }

  test("in / not in / matches") {
    assert(eval1("action in ['login', 'logout']", sample) == true)
    assert(eval1("action not in ['x']", sample) == true)
    assert(eval1("n in [1, 2]", sample) == false)
    assert(eval1("email matches '^[a-z0-9]+@[a-z.]+$'", sample) == true)
    assert(eval1("action matches '^log'", sample) == true)
    // RE2 named-group spelling executes (translated to Java's spelling)
    assert(eval1("action matches '(?P<head>^log)in'", sample) == true)
    // Java-only construct → compile-time rejection, not silent divergence
    assertThrows[ExprCompiler.CompileException] {
      eval1("action matches 'log(?=in)'", sample)
    }
  }

  test("nil comparisons are null tests") {
    val df = Seq((Some("x"), 1), (None, 2)).toDF("s", "i")
    val out = df.select(ExprCompiler.compile("s == nil", df.schema).as("o"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(false, true))
    assert(eval1("email != nil", sample) == true)
  }

  test("string stdlib") {
    assert(eval1("upper(action)", sample) == "LOGIN")
    assert(eval1("lower('ABC')", sample) == "abc")
    assert(eval1("trim('  x ')", sample) == "x")
    assert(eval1("containsStr(email, '@')", sample) == true)
    assert(eval1("hasPrefix(action, 'log')", sample) == true)
    assert(eval1("hasSuffix(email, '.io')", sample) == true)
    assert(eval1("replace(action, 'in', 'out')", sample) == "logout")
    assert(eval1("split(email, '@')", sample) == Seq("u1", "x.io"))
    assert(eval1("join(split(email, '@'), '/')", sample) == "u1/x.io")
  }

  test("toInt / toFloat error-to-zero semantics") {
    val df = Seq(("12", "3.9", "-3.7", "oops")).toDF("a", "b", "c", "d")
    assert(eval1("toInt(a)", df) == 12L)
    assert(eval1("toInt(b)", df) == 3L)   // floor(parseFloat)
    assert(eval1("toInt(c)", df) == -4L)  // floor, not truncate
    assert(eval1("toInt(d)", df) == 0L)   // error → 0
    assert(eval1("toFloat(b)", df) == 3.9)
    assert(eval1("toFloat(d)", df) == 0.0)
    assert(eval1("toInt(f)", sample) == 3L) // double column floors
  }

  test("waterfall returns first non-nil non-empty") {
    val df = Seq((null.asInstanceOf[String], "", "x")).toDF("a", "b", "c")
    assert(eval1("waterfall(a, b, c)", df) == "x")
    assert(eval1("waterfall(a, 'y', c)", df) == "y")
  }

  test("waterfall over a list column; all-empty yields null, not an error") {
    val df = Seq(
      (Seq(null.asInstanceOf[String], "", "first"), Seq(null.asInstanceOf[String], "")))
      .toDF("xs", "empties")
    assert(eval1("waterfall(xs)", df) == "first")
    // ANSI mode: element_at on the empty filtered array would throw;
    // expr-lang waterfall returns nil
    assert(eval1("waterfall(empties)", df) == null)
  }

  test("timestamps: parseISO8601 / toDate") {
    assert(eval1("parseISO8601(ts)", sample) == 1735725600L)
    assert(eval1("toDate(ts)", sample) == "2025-01-01")
    assert(eval1("toDate(1735725600)", sample) == "2025-01-01")
    val df = Seq(("2025-01-01 10:00:00", "01/15/2025", "20250107")).toDF("a", "b", "c")
    assert(eval1("toDate(a)", df) == "2025-01-01")
    assert(eval1("toDate(b)", df) == "2025-01-15")
    assert(eval1("toDate(c)", df) == "2025-01-07")
  }

  test("query-string functions") {
    val df = Seq("https://x.io/p?a=1&b=two&a=3").toDF("url")
    assert(eval1("getQueryParam(url, 'b')", df) == "two")
    assert(eval1("getQueryParam(url, 'a')", df) == "1")
    assert(eval1("getQueryParam(url, 'zz')", df) == "")
    assert(eval1("urlDecode('a%20b')", df) == "a b")
    val m = eval1("parseQuery(url)", df).asInstanceOf[Map[String, scala.collection.Seq[String]]]
    assert(m("a").toSeq == Seq("1", "3"))
  }

  test("map functions") {
    val df = Seq(Map("k8s.pod" -> "p1", "env" -> "prod")).toDF("m")
    assert(eval1("hasKeyPrefix(m, ['k8s.'])", df) == true)
    assert(eval1("hasKeyPrefix(m, ['nope'])", df) == false)
    assert(eval1("hasAnyKey(m, ['env', 'zz'])", df) == true)
    assert(eval1("keys(m)", df) == Seq("env", "k8s.pod"))
    assert(eval1("m['env']", df) == "prod")
    assert(eval1("m['missing']", df) == null)
  }

  test("parseUserAgent cascades") {
    val chrome = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0 Safari/537.36"
    val iphone = "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 Mobile/15E148 Safari/604.1"
    val df = Seq((chrome, iphone)).toDF("c", "i")
    assert(eval1("parseUserAgent(c, 'browser')", df) == "Chrome")
    assert(eval1("parseUserAgent(c, 'os')", df) == "Windows")
    assert(eval1("parseUserAgent(c, 'device')", df) == "desktop")
    assert(eval1("parseUserAgent(i, 'os')", df) == "iOS")
    assert(eval1("parseUserAgent(i, 'device')", df) == "mobile")
  }

  test("dotted identifiers resolve literal-first, then nested") {
    val schema = StructType(Seq(
      StructField("user.id", StringType),
      StructField("user", StructType(Seq(StructField("name", StringType))))))
    val rows = java.util.Arrays.asList(Row("u-1", Row("Ada")))
    val df = spark.createDataFrame(rows, schema)
    assert(eval1("user.id", df) == "u-1")     // literal dotted column wins
    assert(eval1("user.name", df) == "Ada")   // nested path fallback
  }

  test("unknown field / function fail at compile time") {
    assertThrows[ExprCompiler.CompileException](ExprCompiler.compile("nope > 1", sample.schema))
    assertThrows[ExprCompiler.CompileException](ExprCompiler.compile("frob(n)", sample.schema))
    assert(ExprCompiler.validate("nope > 1", sample.schema).isLeft)
    assert(ExprCompiler.validate("n > 1", sample.schema).isRight)
  }

  test("elvis ?? operator coalesces") {
    val df = Seq((null.asInstanceOf[String], "fallback")).toDF("a", "b")
    assert(eval1("a ?? b", df) == "fallback")
    assert(eval1("b ?? 'x'", df) == "fallback")
  }

  test("extractPathType") {
    val df = Seq(("/g/collect?v=2", "/_/set_cookie", "/other")).toDF("a", "b", "c")
    assert(eval1("extractPathType(a)", df) == "collect")
    assert(eval1("extractPathType(b)", df) == "set_cookie")
    assert(eval1("extractPathType(c)", df) == "unknown")
  }
}
