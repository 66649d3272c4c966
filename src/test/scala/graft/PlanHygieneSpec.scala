package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Suite-wide physical-plan hygiene: every driver-contract query is
  * built at sf0.001 and its plan swept for the two scale-killers the
  * per-operator specs guard locally — a true cartesian product
  * (CartesianProductExec; the BroadcastNestedLoopJoin scalar/constant
  * attaches the suite uses deliberately are NOT flagged) and an
  * UNPARTITIONED window (single-task global sort — every global
  * rank/cumsum in the suite must ride the PrefixSum machinery
  * instead). This codifies the r10 verdict's perf audit as a
  * regression gate: a future operator that sneaks either shape in
  * fails here by name.
  *
  * The three self-measuring stream harnesses are skipped (their
  * "plan" is a fixed-duration run, not a query); iterative operators
  * execute during construction, which at sf0.001 is cheap.
  */
class PlanHygieneSpec extends SparkSpec {

  private val skip = Set(
    "stream_rate_bench", // fixed-duration throughput harness
    "stream_param_sweep", // knob-grid harness
    "stream_soak") // long-soak harness

  private def nodes(p: SparkPlan): Seq[SparkPlan] = ((p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec => nodes(q.plan)
    case other => other.children.flatMap(nodes)
  }) ++ p.subqueries.flatMap(nodes)) :+ p // scalar/IN subqueries can't hide either shape

  test("no query plan contains a cartesian product or an unpartitioned window") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        val all = nodes(fn(spark, sfDir).queryExecution.executedPlan)
        all.foreach {
          case _: CartesianProductExec =>
            offenders += s"$name: CartesianProductExec"
          case w: WindowExec if w.partitionSpec.isEmpty =>
            offenders += s"$name: unpartitioned WindowExec"
          case _ => ()
        }
      }
    }
    assert(offenders.isEmpty,
      s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }
}
