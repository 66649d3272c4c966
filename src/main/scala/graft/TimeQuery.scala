package graft


/** Ad-hoc single-query timer: `runMain graft.TimeQuery <sfDir> <name> [reps]`
  * runs one SparkEntry query `reps` times in a warm JVM and prints
  * each pass's wall time — for isolating a query's cost from the
  * full-suite bench (JVM/GC interleaving makes Bench's per-query
  * numbers noisy across runs; this pins one query at a time). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    // contract session (Sessions.contract): isolated timings must run
    // the SAME plans as shipped bench runs — incl. injected optimizer
    // rules and the periodicGC cleaner cadence (r7 verdict item)
    val spark = Sessions.contractLocal("graft-timequery", defaultCpus = "32")
    val q = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pass $i: $sec%.3f s")
    }
    spark.stop()
  }
}
