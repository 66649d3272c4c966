package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-telemetry contract both measuring harnesses
  * (Bench, RefCompare) stamp on every pass: sane axes on this
  * platform, non-negative other-process CPU, and a result passed
  * through unchanged. */
class EnvTelemetrySpec extends AnyFunSuite {

  test("measured() returns the thunk result and sane counters") {
    val (r, env) = EnvTelemetry.measured {
      // burn a little CPU so ourCpuSec is strictly positive
      var x = 0L
      var i = 0
      while (i < 20000000) { x += i * 31; i += 1 }
      x
    }
    assert(r != 0L)
    // /proc exists on this platform: load is a real reading
    assert(env.load >= 0.0)
    assert(env.ourCpuSec > 0.0, s"process CPU not measured: $env")
    // other = machine busy minus ours, clamped at 0 — never negative
    assert(env.otherCpuSec >= 0.0)
    // steal is a counter delta: non-negative when the field exists
    assert(env.stealSec >= 0.0 || env.stealSec == -1.0)
  }

  test("Bench load_suspect rule: loaded passes and wide loaded spreads flag, clean runs don't") {
    import EnvTelemetry.PassEnv
    def env(other: Double, steal: Double = 0.0) = PassEnv(1.0, 10.0, other, steal)
    val clean = env(0.0)
    val C = 32 // the rule is capacity-relative; pin it at the bench's cores
    // single clean pass, tight spread: never suspect
    assert(!Bench.suspect(Seq((2.0, clean), (2.1, clean), (2.0, clean)), 2.0, C))
    // external work above a quarter of machine capacity marks a pass
    // loaded (0.25 x 32 cores x 1 s = 8 CPU-sec)
    assert(Bench.loadedPass(1.0, env(other = 10.0), C))
    // ...while kworker flush-scale residue from the query's own I/O
    // (a few CPU-sec) must NOT flag — the r14 false-positive class
    assert(!Bench.loadedPass(1.0, env(other = 6.0), C))
    // sub-second passes get a 2 CPU-sec floor against daemon noise
    assert(!Bench.loadedPass(0.2, env(other = 1.8), C))
    assert(Bench.loadedPass(0.2, env(other = 2.5), C))
    // hypervisor steal above 5% of capacity marks a pass loaded
    assert(Bench.loadedPass(0.35, env(other = 0.0, steal = 1.89), C))
    assert(!Bench.loadedPass(10.0, env(other = 0.0, steal = 1.0), C))
    // majority-loaded passes flag the median
    assert(Bench.suspect(
      Seq((5.0, env(60.0)), (6.0, env(60.0)), (2.0, clean)), 5.0, C))
    // wide spread (med >= 1.5x min) flags too — the r13 q_histogram
    // shape (2.8-16.4 s at <25% CPU while a concurrent verify run
    // saturated the box)
    assert(Bench.suspect(
      Seq((2.8, clean), (9.1, env(80.0)), (16.4, clean)), 9.1, C))
    // ...and since r15 it flags even with NO loaded pass (r14 verdict
    // #1: graph_triangles rode a 2.1x spread through under-threshold
    // contention at n_load_suspect=0) — the isolated re-run
    // adjudicates code-vs-environment either way
    assert(Bench.suspect(
      Seq((6.6, clean), (14.2, clean), (16.4, clean)), 14.2, C))
    // tight spread (med < 1.5x min) with clean passes stays unflagged
    assert(!Bench.suspect(Seq((5.0, clean), (6.5, clean), (7.0, clean)), 6.5, C))
    // sub-second jitter never flags even at a big ratio (0.3 s floor)
    assert(!Bench.suspect(Seq((0.1, clean), (0.25, clean), (0.3, clean)), 0.25, C))
    // a single pass losing >5% of capacity to steal flags on its own,
    // regardless of majority or spread
    assert(Bench.suspect(
      Seq((2.0, clean), (2.0, env(0.0, steal = 4.0)), (2.1, clean)), 2.0, C))
    assert(!Bench.suspect(
      Seq((2.0, clean), (2.0, env(0.0, steal = 2.0)), (2.1, clean)), 2.0, C))
    // missing counters (-1 sentinels) never flag
    assert(!Bench.loadedPass(4.0, PassEnv(1.0, -1.0, -1.0, -1.0), C))
  }

  test("jiffy counters are monotone across a measurement") {
    val m0 = EnvTelemetry.machineBusyJiffies()
    val s0 = EnvTelemetry.stealJiffies()
    Thread.sleep(50)
    val m1 = EnvTelemetry.machineBusyJiffies()
    val s1 = EnvTelemetry.stealJiffies()
    assert(m0 > 0 && m1 >= m0, s"busy jiffies not monotone: $m0 -> $m1")
    if (s0 >= 0) assert(s1 >= s0, s"steal jiffies not monotone: $s0 -> $s1")
  }
}
