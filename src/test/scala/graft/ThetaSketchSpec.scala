package graft

import org.apache.spark.sql.functions._

import graft.functions.ThetaFns
import graft.operators.OlapExtras

class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("theta agg: estimate is exact below k, merge across partitions works") {
    // 500 distinct keys spread over 8 partitions, each key seen 3× —
    // far below k=4096, so the sketch must be in exact mode
    val df = spark.range(1500).select((col("id") % 500).as("k"))
      .repartition(8)
    val sk = df.agg(ThetaFns.thetaSketchAgg(col("k")).as("sk"))
      .as[Array[Byte]].head()
    assert(ThetaFns.estimate(sk) == 500.0)
  }

  test("theta algebra: intersection and union match set arithmetic exactly") {
    // A = [0, 300), B = [200, 500): |A∩B| = 100, |A∪B| = 500
    val a = spark.range(0, 300).toDF("k")
      .agg(ThetaFns.thetaSketchAgg(col("k"))).as[Array[Byte]].head()
    val b = spark.range(200, 500).toDF("k")
      .agg(ThetaFns.thetaSketchAgg(col("k"))).as[Array[Byte]].head()
    assert(ThetaFns.intersectEstimate(a, b) == 100.0)
    assert(ThetaFns.unionEstimate(a, b) == 500.0)
    assert(ThetaFns.estimate(a) == 300.0 && ThetaFns.estimate(b) == 300.0)
    // |A \ B| = 200, |B \ A| = 200 — the difference leg
    assert(ThetaFns.aNotBEstimate(a, b) == 200.0)
    assert(ThetaFns.aNotBEstimate(b, a) == 200.0)
  }

  test("q_theta_sets: every pair present, gate green, unions consistent") {
    val rows = OlapExtras.qThetaSets(spark, sfDir).collect()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"), s"gate failed: $r")
      // exact-mode sketches: estimates equal the exact sets outright
      assert(r.getAs[Double]("est_inter") == r.getAs[Long]("exact_inter").toDouble)
      assert(r.getAs[Double]("est_union") == r.getAs[Long]("exact_union").toDouble)
      assert(r.getAs[Double]("est_diff_ab") == r.getAs[Long]("exact_diff_ab").toDouble)
      // inclusion-exclusion on the exact side
      assert(r.getAs[Long]("exact_union") <=
        r.getAs[Double]("est_a").toLong + r.getAs[Double]("est_b").toLong)
      assert(r.getAs[Long]("exact_inter") >= 0L)
    }
  }
}
