package graft.exprs

/** RE2-dialect guard for `matches` patterns.
  *
  * The reference evaluates filter regexes with Go's `regexp` package, an
  * RE2 engine (glassflow-api/internal/filter/json/filter.go:22-25); we
  * compile `matches` to Spark's `regexp_like`, a java.util.regex engine.
  * Java accepts several constructs RE2 rejects — lookarounds,
  * backreferences, atomic groups, possessive quantifiers, Java-style named
  * groups — so a pattern using them would VALIDATE here yet fail (or mean
  * something else) on the reference. Rejecting them at compile/validation
  * time keeps expression semantics inside the dialect both engines share.
  *
  * This is a lexical scan, not a full regex parser: it tracks escaping and
  * character classes, which is enough to recognize every guarded construct
  * without false positives on their escaped/in-class spellings.
  */
object Re2Dialect {

  private val BraceQuant = "^\\{\\d+(,\\d*)?\\}".r

  /** RE2 spelling → Java spelling for constructs BOTH engines support:
    * RE2's named group `(?P<name>...)` becomes Java's `(?<name>...)` so a
    * pattern that runs on the reference also runs on regexp_like. Escapes
    * and character classes are honored, so a literal `(?P<` stays put. */
  def toJava(pattern: String): String = {
    val sb = new StringBuilder(pattern.length)
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length) {
        sb.append(c).append(pattern.charAt(i + 1)); i += 2
      } else if (inClass) {
        if (c == ']') inClass = false
        sb.append(c); i += 1
      } else if (c == '[') {
        inClass = true; sb.append(c); i += 1
      } else if (pattern.startsWith("(?P<", i)) {
        sb.append("(?<"); i += 4
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** First Java-only construct found in `pattern`, with its offset — None
    * when the pattern stays inside the RE2-compatible dialect. */
  def violation(pattern: String): Option[String] = {
    var i = 0
    var inClass = false
    // last unescaped quantifier end position outside a class (for the
    // possessive-quantifier check: a '+' directly after one)
    var quantEnd = -2
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\') {
        if (i + 1 < pattern.length) {
          val n = pattern.charAt(i + 1)
          if (!inClass && n >= '1' && n <= '9')
            return Some(s"backreference \\$n at index $i (RE2 has no backreferences)")
          if (!inClass && n == 'k' && i + 2 < pattern.length && pattern.charAt(i + 2) == '<')
            return Some(s"named backreference \\k<...> at index $i (RE2 has no backreferences)")
          if (n == 'G' || n == 'Z' || n == 'R' || n == 'X')
            return Some(s"Java-only escape \\$n at index $i" +
              (if (n == 'Z') " (use \\z)" else ""))
        }
        i += 2
      } else if (inClass) {
        if (c == '&' && i + 1 < pattern.length && pattern.charAt(i + 1) == '&')
          return Some(s"character-class intersection && at index $i (Java-only)")
        if (c == ']') inClass = false
        i += 1
      } else c match {
        case '[' =>
          inClass = true
          i += 1
          // leading ^ and a literal ] right after it don't close the class
          if (i < pattern.length && pattern.charAt(i) == '^') i += 1
          if (i < pattern.length && pattern.charAt(i) == ']') i += 1
        case '(' if i + 1 < pattern.length && pattern.charAt(i + 1) == '?' =>
          val rest = pattern.substring(i + 2)
          if (rest.startsWith("=") || rest.startsWith("!"))
            return Some(s"lookahead (?${rest.take(1)} at index $i (RE2 has no lookarounds)")
          if (rest.startsWith("<=") || rest.startsWith("<!"))
            return Some(s"lookbehind (?${rest.take(2)} at index $i (RE2 has no lookarounds)")
          if (rest.startsWith(">"))
            return Some(s"atomic group (?> at index $i (Java-only)")
          if (rest.startsWith("<") && !rest.startsWith("<=") && !rest.startsWith("<!"))
            return Some(s"Java-style named group (?<name> at index $i (RE2 spells it (?P<name>))")
          i += 1
        case '*' | '?' =>
          quantEnd = i
          i += 1
        case '{' =>
          // only a real {n} / {n,} / {n,m} is a quantifier; a lone brace is
          // a literal in both dialects and must not trip the possessive check
          BraceQuant.findFirstIn(pattern.substring(i)) match {
            case Some(q) => quantEnd = i + q.length - 1; i += q.length
            case None => i += 1
          }
        case '+' =>
          if (quantEnd == i - 1)
            return Some(s"possessive quantifier at index ${i - 1} (Java-only)")
          quantEnd = i
          i += 1
        case _ =>
          i += 1
      }
    }
    None
  }
}
