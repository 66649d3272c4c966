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
