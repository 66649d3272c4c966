package graft

import org.apache.spark.scheduler._

/** Dev diagnostic (r17 optimization, guide §1.1 empirical loop): run
  * one SparkEntry query in a warm JVM and print every Spark job's
  * wall-clock, stage count, and task time — the "which stage is slow"
  * question the UI would answer, without the UI.
  *   sbt "runMain graft.JobProbe /root/testdata/sf0.1 graph_pagerank [reps]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.contractLocal("graft-jobprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int, Long)]()
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, (e.time,
          Option(e.properties).map(_.getProperty("spark.job.description"))
            .filter(_ != null).getOrElse(""), e.stageIds.size))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.getOrDefault(e.stageId, -1)
        if (j >= 0 && e.taskMetrics != null)
          taskMs.computeIfAbsent(j, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(e.taskMetrics.executorRunTime): Unit
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = si.taskMetrics
        if (ms != null && ms.executorRunTime > 3000)
          println(f"    [stage ${si.stageId}%4d] taskSec=${ms.executorRunTime / 1e3}%8.1f gc=${ms.jvmGCTime / 1e3}%6.1f cpu=${ms.executorCpuTime / 1e9}%7.1f tasks=${si.numTasks}%4d in=${ms.inputMetrics.bytesRead / 1e6}%8.1f MB shRead=${ms.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB fetchWait=${ms.shuffleReadMetrics.fetchWaitTime / 1e3}%6.1f deser=${ms.executorDeserializeTime / 1e3}%6.1f ${si.name.take(60)}")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { case (t0, desc, nStages) =>
          done.add((e.jobId, (e.time - t0) / 1e3, desc, nStages,
            Option(taskMs.get(e.jobId)).map(_.get).getOrElse(0L)))
        }
      }
    })
    val q = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      done.clear()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"== pass $i: $sec%.3f s, ${done.size} jobs")
      if (i == reps) {
        import scala.jdk.CollectionConverters._
        val rows = done.asScala.toSeq.sortBy(-_._2)
        rows.take(25).foreach { case (id, wall, desc, nStages, tms) =>
          println(f"  job $id%4d ${wall}%7.2f s  stages=$nStages%2d taskSec=${tms / 1e3}%7.1f  ${desc.take(80)}")
        }
        println(f"  total job wall ${rows.map(_._2).sum}%.2f s (overlaps possible)")
      }
    }
    spark.stop()
  }
}
