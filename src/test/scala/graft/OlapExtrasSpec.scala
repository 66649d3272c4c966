package graft

import org.apache.spark.sql.functions._

import graft.operators.OlapExtras

class OlapExtrasSpec extends SparkSpec {

  test("q_asof: every gap is non-negative (view precedes purchase)") {
    val res = OlapExtras.qAsof(spark, sfDir).cache()
    assert(res.count() > 0)
    assert(res.filter(col("gap_us") < 0).count() == 0)
    res.unpersist()
  }

  test("q_range_join: gaps bounded by 7 days, no self-pairs") {
    val res = OlapExtras.qRangeJoin(spark, sfDir).cache()
    assert(res.count() > 0)
    assert(res.filter(col("gap_days") > 7).count() == 0)
    assert(res.filter(col("o1") === col("o2")).count() == 0)
    res.unpersist()
  }

  test("q_json: event counts conserved") {
    val res = OlapExtras.qJson(spark, sfDir)
    val total = res.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("q_percentile: quartiles ordered") {
    val rows = OlapExtras.qPercentile(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p75"))
    }
  }

  test("q_approx_distinct: sketch within configured error of exact") {
    val rows = OlapExtras.qApproxDistinct(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Double]("rel_err") < 0.1))
  }

  test("q_approx_percentile: sketch tracks the exact quantiles") {
    val rows = OlapExtras.qApproxPercentile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err_p50") < 0.05,
        s"p50 sketch drifted: ${r.mkString(",")}")
      assert(r.getAs[Double]("rel_err_p90") < 0.05,
        s"p90 sketch drifted: ${r.mkString(",")}")
      // quantile ordering survives the sketch
      assert(r.getAs[Double]("approx_p90") >= r.getAs[Double]("approx_p50"))
    }
  }
}
