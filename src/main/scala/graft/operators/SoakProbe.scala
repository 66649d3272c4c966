package graft.operators

import org.apache.spark.sql.functions._

/** Scratch diagnostic (r17 optimization): split the ferret-search
  * per-batch cost into plan-construction/analysis vs execution, on a
  * warm session — stands in for one stream_soak_ferret trigger. */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.contractLocal("graft-soakprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val e = Similarity.emb(spark, dir).localCheckpoint(true)
    val n = math.max(1L, e.count())
    val corpusQ = e.select(col("vec_id").as("query_id"), col("v").as("qv"))
    // mimic one trigger: a 100-row batch of (value) rows
    import spark.implicits._
    val idx = Similarity.ferretIndex(e)
    val dumpDir = sys.env.get("GRAFT_PROBE_PLANDIR")
    for (conf <- Seq(("off","4"),("off","4idx")); i <- 1 to 5) {
      spark.conf.set("spark.sql.adaptive.enabled", conf._1 == "on")
      spark.conf.set("spark.sql.shuffle.partitions", conf._2.take(1))
      val t0 = System.nanoTime()
      val batch = spark.range(i * 1000, i * 1000 + 100).toDF("value")
        .localCheckpoint(true) // stand-in for the micro-batch LogicalRDD
      val t1 = System.nanoTime()
      val attached = batch.select((col("value") % n).as("query_id"))
        .join(corpusQ, "query_id")
      val out = if (conf._2.endsWith("idx"))
        Similarity.ferretSearchIndexed(idx, e, attached, broadcastQueries = true)
      else Similarity.ferretSearch(e, attached, broadcastQueries = true)
      val plan = out.queryExecution.executedPlan // force analysis+planning
      val t2 = System.nanoTime()
      if (i == 2) dumpDir.foreach { d =>
        val tag = if (conf._2.endsWith("idx")) "after" else "before"
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/ferret_inner_search_$tag.txt"),
          out.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      out.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"aqe=${conf._1} parts=${conf._2} pass $i: ckpt ${(t1 - t0) / 1e6}%.0f ms, plan ${(t2 - t1) / 1e6}%.0f ms, exec ${(t3 - t2) / 1e6}%.0f ms  [${plan.getClass.getSimpleName}]")
    }
    spark.stop()
  }
}
