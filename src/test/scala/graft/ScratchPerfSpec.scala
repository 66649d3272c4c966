package graft

import org.apache.spark.sql.functions._

class ScratchPerfSpec extends SparkSpec {
  val dir01 = "/root/testdata/sf0.1"
  test("cluster rounds anatomy") {
    val pairs = graft.operators.Dedup.dedupNgramJaccard(spark, dir01)
      .select("doc_a", "doc_b")
    val edges = pairs.union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst").localCheckpoint(true)
    var labels = graft.Tables.documents(spark, dir01)
      .select(col("doc_id"), col("doc_id").as("cluster_id")).localCheckpoint(true)
    var prevSum = labels.agg(sum("cluster_id")).first().getLong(0)
    var converged = false; var round = 0
    while (!converged && round < 32) {
      val t0 = System.nanoTime()
      val prop = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val merged = labels.union(prop)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
      val next = merged
        .join(merged.select(col("doc_id").as("cluster_id"), col("cluster_id").as("jump")),
          Seq("cluster_id"), "left")
        .select(col("doc_id"), coalesce(col("jump"), col("cluster_id")).as("cluster_id"))
        .localCheckpoint(true)
      val s2 = next.agg(sum("cluster_id")).first().getLong(0)
      converged = s2 == prevSum; prevSum = s2; labels = next; round += 1
      println(f"round $round: ${(System.nanoTime() - t0) / 1e9}%.2f s (sum=$s2, converged=$converged)")
    }
  }
}
