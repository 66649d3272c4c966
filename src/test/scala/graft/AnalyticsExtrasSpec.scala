package graft

import org.apache.spark.sql.functions._

import graft.operators.AnalyticsExtras

class AnalyticsExtrasSpec extends SparkSpec {

  test("q_moving_avg: ma3 equals hand-computed trailing mean per frame") {
    val rows = AnalyticsExtras.qMovingAvg(spark, sfDir)
      .orderBy("o_custkey", "o_date", "o_orderkey").collect()
    assert(rows.nonEmpty)
    // first row of each customer has null prev_price; every ma3 is finite
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      assert(rs.head.isNullAt(rs.head.fieldIndex("prev_price")))
      assert(rs.last.isNullAt(rs.last.fieldIndex("next_price")))
    }
    rows.foreach(r => assert(!r.getAs[Double]("ma3").isNaN))
  }

  test("q_cube: subtotal rows reconcile with grand total") {
    val res = AnalyticsExtras.qCube(spark, sfDir).collect()
    val grand = res.filter(r => r.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n_rows")
    // each one-dimension margin sums back to the grand total
    for (g <- Seq(1L, 2L)) {
      val margin = res.filter(_.getAs[Long]("gid") == g).map(_.getAs[Long]("n_rows")).sum
      assert(margin == total, s"gid=$g margin $margin != $total")
    }
  }

  test("q_group_topk: at most 2 rows per customer, plan uses WindowGroupLimit") {
    val df = AnalyticsExtras.qGroupTopK(spark, sfDir)
    val over = df.groupBy("o_custkey").count().filter(col("count") > 2).count()
    assert(over == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("q_skew_salted equals plain groupBy count for any salt width") {
    import graft.functions.SkewFns
    val plain = Tables.events(spark, sfDir).groupBy("user_id").count()
      .withColumnRenamed("count", "n")
    for (salts <- Seq(1, 8, 32)) {
      val salted = SkewFns.saltedCount(
        Tables.events(spark, sfDir), "user_id", col("event_id"), salts)
      assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty,
        s"salts=$salts diverged")
    }
  }

  test("q_setops: intersection respects membership, except removes F-status") {
    val res = AnalyticsExtras.qSetOps(spark, sfDir).collect().map(_.getLong(0)).toSet
    val o = Tables.orders(spark, sfDir)
    val y96 = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val y97 = o.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val withF = o.filter(col("o_orderstatus") === "F")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(res == ((y96 & y97) -- withF))
  }

  test("q_ntile: deciles are 1..10 and balanced within each nation") {
    val res = AnalyticsExtras.qNtile(spark, sfDir).collect()
    assert(res.forall { r =>
      val d = r.getAs[Int]("decile"); d >= 1 && d <= 10
    })
    // ntile balance: per nation, max bucket size - min bucket size <= 1
    res.groupBy(_.getAs[Number]("c_nationkey").longValue).values.foreach { rs =>
      val sizes = rs.groupBy(_.getAs[Int]("decile")).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("q_string_agg: segments string is sorted and distinct") {
    AnalyticsExtras.qStringAgg(spark, sfDir).collect().foreach { r =>
      val parts = r.getAs[String]("segments").split(",").toSeq
      assert(parts == parts.sorted && parts.distinct == parts)
    }
  }
}
