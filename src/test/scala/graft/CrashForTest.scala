package graft

/** Test-only fork target for [[BenchGateSpec]]: crashes with a known
  * exception (default) or exits cleanly without printing the marker
  * (`clean` arg) — the two forked-bench failure modes whose artifact
  * records must stay diagnosable. */
object CrashForTest {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("clean")) {
      println("""{"metric":"something_else","value":1}""")
    } else if (args.headOption.contains("exit56")) {
      // the r15 driver-window mode: the forked JVM dies at Spark RPC boot
      // with a nonzero exit BEFORE any marker line
      System.err.println("Exception in thread \"main\" org.apache.spark.SparkException: " +
        "Exception thrown in awaitResult")
      sys.exit(56)
    } else {
      // a few log-looking stderr lines first, so the head capture has to
      // find the exception start rather than take the first stderr line
      System.err.println("INFO some framework chatter")
      System.err.println("WARN more chatter")
      throw new IllegalStateException("deliberate bench-fork crash")
    }
  }
}

/** Test-only fork target that HANGS forever after optionally printing
  * noise — the r15 driver-window mode where `Process(...).!` with no
  * wall-clock timeout froze every later leg and emit behind one fork. */
object HangForTest {
  def main(args: Array[String]): Unit = {
    System.err.println("INFO booting, then hanging deliberately")
    while (true) Thread.sleep(1000)
  }
}
