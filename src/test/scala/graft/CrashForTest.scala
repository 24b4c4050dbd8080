package graft

/** Test-only fork target for [[BenchGateSpec]]: crashes with a known
  * exception (default) or exits cleanly without printing the marker
  * (`clean` arg) — the two forked-bench failure modes whose artifact
  * records must stay diagnosable. */
object CrashForTest {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("clean")) {
      println("""{"metric":"something_else","value":1}""")
    } else {
      // a few log-looking stderr lines first, so the head capture has to
      // find the exception start rather than take the first stderr line
      System.err.println("INFO some framework chatter")
      System.err.println("WARN more chatter")
      throw new IllegalStateException("deliberate bench-fork crash")
    }
  }
}
