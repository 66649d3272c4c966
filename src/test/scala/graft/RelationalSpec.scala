package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg: 6 flag/status groups, quantities add up") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val schema = rows.head.schema.fieldNames.toSet
    assert(schema == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "count_order"))
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q3_join_agg: at most 10 rows, revenue descending") {
    val rows = Relational.q3JoinAgg(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("q5_multijoin: revenue per ASIA nation") {
    val rows = Relational.q5MultiJoin(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }

  test("q6_filter_agg: single row") {
    val rows = Relational.q6FilterAgg(spark, sfDir).collect()
    assert(rows.length == 1)
  }

  test("q_window: rank is 1..n per customer, running_spend monotone") {
    val df = Relational.qWindow(spark, sfDir)
    val bad = df.groupBy("o_custkey")
      .agg(max("rnk").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0)
  }

  test("q_topk: exactly 25 rows sorted by price desc") {
    val rows = Relational.qTopK(spark, sfDir).collect()
    assert(rows.length == 25)
    val prices = rows.map(_.getAs[Double]("l_extendedprice"))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }

  test("semi + anti partition customers") {
    val nSemi = Relational.qSemiJoin(spark, sfDir).count()
    val nAnti = Relational.qAntiJoin(spark, sfDir).count()
    val nCust = Tables.customer(spark, sfDir).count()
    assert(nSemi + nAnti == nCust)
  }

  test("q_rollup: grand total row present") {
    val rows = Relational.qRollup(spark, sfDir).collect()
    val grand = rows.filter(r => r.getAs[String]("returnflag") == "ALL" &&
      r.getAs[String]("linestatus") == "ALL")
    assert(grand.length == 1)
    val total = Tables.lineitem(spark, sfDir).count()
    assert(grand.head.getAs[Long]("n_rows") == total)
  }

  test("q_events_window: event counts add to table size") {
    val df = Relational.qEventsWindow(spark, sfDir)
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("q_sessionize: session bounds ordered, events conserved") {
    val df = Relational.qSessionize(spark, sfDir)
    assert(df.filter(col("start_us") > col("end_us")).count() == 0)
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("q_hop_window: every event lands in exactly 4 windows, cells exact") {
    val r = Relational.qHopWindow(spark, sfDir).cache()
    val total = r.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total == 4L * Tables.events(spark, sfDir).count())
    // spot-check cells against direct range filters
    r.orderBy(col("win_start"), col("event_type")).collect().take(8).foreach { row =>
      val start = lit(row.getAs[String]("win_start")).cast("timestamp")
      val cnt = Tables.events(spark, sfDir).filter(
        col("event_type") === row.getAs[String]("event_type") &&
          col("ts") >= start &&
          col("ts") < start + expr("interval 60 minutes")).count()
      assert(cnt == row.getAs[Long]("n_events"), s"cell mismatch: $row")
    }
    // plan shape: one scan + map-side Expand, not a per-window re-scan.
    // Counted over the FINAL plan's actual nodes — the AQE wrapper's
    // toString prints initial+final plans and a cached frame embeds
    // its child plan twice, so string-counting overshoots on both.
    import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    r.unpersist(blocking = true) // or the fresh frame below hits the cache
    val fresh = Relational.qHopWindow(spark, sfDir)
    fresh.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case other => other.children.flatMap(nodes)
    }) :+ p
    val all = nodes(fresh.queryExecution.executedPlan)
    assert(all.exists(_.isInstanceOf[ExpandExec]),
      s"no Expand in hop-window plan: ${all.map(_.getClass.getSimpleName).mkString(", ")}")
    assert(all.count(_.isInstanceOf[FileSourceScanExec]) == 1,
      "hop window must read the events table exactly once")
  }
}
