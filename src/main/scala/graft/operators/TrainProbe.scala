package graft.operators

import org.apache.spark.sql.functions._

/** Scratch diagnostic (r18): cost of the deterministic k-means /
  * PQ-codebook training that several ANN keys pay at DataFrame
  * construction time, isolated from the searches they feed. */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.contractLocal("graft-trainprobe")
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val e = Similarity.emb(spark, dir)
      val t0 = System.nanoTime()
      val cs = Similarity.probeCentroidSeq(e)
      val t1 = System.nanoTime()
      val cb = Similarity.probePqCodebook(e)
      val t2 = System.nanoTime()
      println(f"pass $i: centroidSeq ${(t1 - t0) / 1e9}%.2f s (${cs.size} cells), " +
        f"pqCodebook ${(t2 - t1) / 1e9}%.2f s (${cb.length} doubles)")
    }
    spark.stop()
  }
}
