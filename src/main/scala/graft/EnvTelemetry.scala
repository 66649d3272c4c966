package graft

/** Machine-contention telemetry shared by the measuring harnesses
  * (Bench, RefCompare). Round 9's 24 s-vs-11 s timing dispute was
  * unadjudicable from the artifact alone; every measured pass now
  * records 1-min load average, whole-machine busy CPU-seconds minus
  * THIS JVM's process CPU time (= CPU other processes burned during
  * the pass), and hypervisor steal. other_cpu ≈ 0 → the number is
  * ours; other_cpu large → the environment was loud and the spread
  * says so.
  */
object EnvTelemetry {

  def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").getLines()
      .next().split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def machineBusyJiffies(): Long =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      f.sum - f(3) - f.lift(4).getOrElse(0L) // total - idle - iowait
    } catch { case _: Throwable => -1L }

  def stealJiffies(): Long =
    try scala.io.Source.fromFile("/proc/stat").getLines().next()
      .trim.split("\\s+").lift(8).map(_.toLong).getOrElse(-1L)
    catch { case _: Throwable => -1L }

  def processCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  val jiffyHz = 100.0 // kernel USER_HZ as exposed via /proc/stat

  case class PassEnv(load: Double, ourCpuSec: Double, otherCpuSec: Double,
                     stealSec: Double)

  /** Run `thunk`, sampling the contention counters around it. */
  def measured[A](thunk: => A): (A, PassEnv) = {
    val l0 = loadAvg(); val m0 = machineBusyJiffies(); val p0 = processCpuNanos()
    val s0 = stealJiffies()
    val r = thunk
    val m1 = machineBusyJiffies(); val p1 = processCpuNanos()
    val s1 = stealJiffies()
    val ours = if (p0 < 0 || p1 < 0) -1.0 else (p1 - p0) / 1e9
    val machine = if (m0 < 0 || m1 < 0) -1.0 else (m1 - m0) / jiffyHz
    val other = if (ours < 0 || machine < 0) -1.0 else math.max(0.0, machine - ours)
    // hypervisor steal: CPU-seconds the HOST ran other tenants while
    // this guest wanted the cpu — the contention axis load/other_cpu
    // cannot see on a VM
    val steal = if (s0 < 0 || s1 < 0) -1.0 else (s1 - s0) / jiffyHz
    (r, PassEnv(l0, ours, other, steal))
  }
}
