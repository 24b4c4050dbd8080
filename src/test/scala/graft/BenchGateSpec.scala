package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's measurement-defense machinery in isolation:
  * [[Bench.discardFlags]] replayed against the round-13 final-sweep
  * telemetry (the incident that motivated run-relative gates), and
  * [[Bench.forkedLine]]'s exception-HEAD capture (the r13 graded run
  * crashed three times and the artifact recorded only bottom-of-stack
  * frames, leaving the failure unexplainable). */
class BenchGateSpec extends AnyFunSuite {

  private def tele(steal: Double, sys: Double, idle: Double,
                   mid: Double): Bench.Tele =
    Bench.Tele(stealPct = steal, sysPct = sys, idlePct = idle,
      load1Before = 3.0, load1After = 10.0, quiesceWaitMs = 0L,
      memAvailMb = 120000L, cpuGateWaitMs = 0L, load1MidMax = mid)

  test("r13 final-sweep replay: the 118k fork is KEPT, the 42k fork is FLAGGED") {
    // the actual six wire forks of the r13 final sweep (BENCH_R13_RUNS
    // .jsonl sweep 4 + its one discarded run): the old absolute gates
    // discarded the FASTEST sample (118,824 ev/s — sys 41.4, marginally
    // over the absolute 40 cap) and kept the SLOWEST (42,493 ev/s, whose
    // contention telemetry is indistinguishable from its 107k siblings)
    val values = Seq(57942.0, 69622.0, 42493.0, 107250.0, 107364.0, 118824.0)
    val teles = Seq(
      tele(0.35, 31.79, 53.14, 19.32),
      tele(0.12, 28.51, 51.32, 19.32),
      tele(0.40, 28.83, 50.18, 25.69), // the 42k "idle-but-slow" fork
      tele(0.25, 31.31, 46.92, 24.89),
      tele(0.05, 29.38, 44.35, 22.93),
      tele(0.04, 41.40, 37.85, 14.09)) // the 118k fork the old gate killed
    val flags = Bench.discardFlags(values, teles, absoluteMidCap = Some(28.0))
    assert(!flags(5), "the 118k fork (sys 41.4 vs run-median ~30: ratio " +
      "1.4 < 1.5) must be KEPT — it was the sweep's fastest sample")
    assert(flags(2), "the 42k fork (value under half the 107k run median, " +
      "clean contention telemetry) must be FLAGGED for a re-run")
    assert(!flags(3) && !flags(4), "the healthy 107k forks must be kept")
  }

  test("absolute fallbacks apply below 3 samples; steal is always absolute") {
    // two samples: no medians — sys falls back to >40, load to the cap
    val two = Bench.discardFlags(Seq(100.0, 90.0),
      Seq(tele(0.1, 45.0, 50.0, 10.0), tele(0.1, 30.0, 50.0, 30.0)),
      absoluteMidCap = Some(28.0))
    assert(two == Seq(true, true)) // sys 45 > 40; mid 30 > cap 28
    // steal > 1.5 flags regardless of the run's shape
    val st = Bench.discardFlags(Seq(100.0, 100.0, 100.0),
      Seq(tele(2.0, 20.0, 50.0, 10.0), tele(0.1, 20.0, 50.0, 10.0),
        tele(0.1, 20.0, 50.0, 10.0)), absoluteMidCap = None)
    assert(st == Seq(true, false, false))
    // a genuine kernel-time storm (r11 signature: 55-74% vs <=26% healthy)
    // still flags under the relative rule
    val storm = Bench.discardFlags(Seq(100.0, 100.0, 40.0),
      Seq(tele(0.1, 24.0, 50.0, 10.0), tele(0.1, 26.0, 50.0, 10.0),
        tele(0.1, 64.0, 20.0, 10.0)), absoluteMidCap = None)
    assert(storm == Seq(false, false, true))
    // batch/streaming legs (no absolute cap): load never flags them even
    // at saturation-level mid-run load
    val batch = Bench.discardFlags(Seq(100.0, 100.0, 100.0),
      Seq(tele(0.1, 20.0, 10.0, 35.0), tele(0.1, 20.0, 10.0, 36.0),
        tele(0.1, 20.0, 10.0, 60.0)), absoluteMidCap = None)
    assert(batch == Seq(false, false, false))
  }

  test("a crashed fork's record names the exception class and message (head, not just tail)") {
    val r = Bench.forkedLine("graft.CrashForTest", Seq.empty, "\"never\"")
    assert(r.isLeft, "CrashForTest must exit non-zero")
    val msg = r.left.toOption.get
    assert(msg.contains("exception head:"), msg)
    assert(msg.contains("IllegalStateException"),
      s"the exception CLASS must be recoverable from the record: $msg")
    assert(msg.contains("deliberate bench-fork crash"),
      s"the exception MESSAGE must be recoverable from the record: $msg")
    assert(msg.contains("stderr tail:"), msg)
  }

  test("a fork that exits 0 without the marker still reports usably") {
    val r = Bench.forkedLine("graft.CrashForTest", Seq("clean"), "\"never\"")
    assert(r.isLeft)
    assert(r.left.toOption.get.contains("printed no"), r.left.toOption.get)
  }
}
