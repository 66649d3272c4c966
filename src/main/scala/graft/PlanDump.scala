package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool behind PLANS.md: prints the formatted physical plan of
  * named driver-contract queries (all of them if no names given).
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.01 q1_agg shard_pack"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    // same contract session builder as Bench/Verify — snapshots must
    // show the plans shipped runs actually execute (incl. injected
    // optimizer rules like LevenshteinBound)
    val spark = Sessions.contract("local[4]", "4", "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      println(s"===== $name =====")
      println(fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
