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

  test("q_percent_rank: bounds, extremes, and monotonicity per nation") {
    val rows = AnalyticsExtras.qPercentRank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("c_nationkey")).values.foreach { rs =>
      val sorted = rs.sortBy(r => (r.getAs[Double]("c_acctbal"), r.getAs[Long]("c_custkey")))
      val prs = sorted.map(_.getAs[Double]("pct_rank"))
      val cds = sorted.map(_.getAs[Double]("cume"))
      assert(prs.head == 0.0)
      if (rs.length > 1) assert(prs.last == 1.0)
      assert(cds.last == 1.0)
      assert(prs.zip(prs.tail).forall { case (a, b) => a <= b })
      assert(cds.zip(cds.tail).forall { case (a, b) => a <= b })
      cds.foreach(c => assert(c > 0.0 && c <= 1.0))
    }
  }

  test("q_grouping_sets: every grouping set reconciles with the base table") {
    val rows = AnalyticsExtras.qGroupingSets(spark, sfDir).collect()
    val total = Tables.lineitem(spark, sfDir).count()
    // gid: (flag,status)=0, (status)=2 [flag grouped out], ()=3
    assert(rows.map(_.getAs[Long]("gid")).toSet == Set(0L, 2L, 3L))
    Seq(0L, 2L).foreach { gid =>
      val n = rows.filter(_.getAs[Long]("gid") == gid).map(_.getAs[Long]("n_rows")).sum
      assert(n == total, s"set gid=$gid does not cover the table: $n vs $total")
    }
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.getAs[Long]("n_rows") == total)
  }

  test("profile_table: one-pass profile matches direct recomputations") {
    val rows = AnalyticsExtras.profileTable(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    assert(rows.length == 4)
    rows.foreach { r =>
      val c = r.getAs[String]("col_name")
      assert(r.getAs[Long]("n_rows") == total)
      assert(r.getAs[Long]("n_nulls") == li.filter(col(c).isNull).count())
      assert(r.getAs[Long]("n_distinct") == li.select(c).distinct().count())
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
  }

  test("q_window_range: frame sums match a driver recomputation per user") {
    val rows = AnalyticsExtras.qWindowRange(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    // recompute the trailing 1h frame by brute force for a few users
    byUser.take(5).foreach { case (_, rs) =>
      rs.foreach { r =>
        val us = r.getAs[Long]("us")
        val inFrame = rs.filter { o =>
          val ou = o.getAs[Long]("us")
          ou >= us - 3600L * 1000000L && ou <= us
        }
        assert(r.getAs[Long]("n_1h") == inFrame.length,
          s"frame count drifted at us=$us")
      }
    }
    // ts ties are peers: rows with equal (user_id, us) report equal frames
    byUser.values.foreach { rs =>
      rs.groupBy(_.getAs[Long]("us")).values.foreach { peers =>
        assert(peers.map(_.getAs[Long]("n_1h")).distinct.length == 1)
        assert(peers.map(_.getAs[Double]("sum_1h")).distinct.length == 1)
      }
    }
  }

  test("q_anomaly: flags consistent with emitted moments, partitioned window only") {
    val rows = AnalyticsExtras.qAnomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, n, mean, varW) = (r.getAs[Double]("value"), r.getAs[Long]("n_w"),
        r.getAs[Double]("mean_w"), r.getAs[Double]("var_w"))
      val want = n >= 5 && varW > 0.0 && (v - mean) * (v - mean) > 9.0 * varW
      assert(r.getAs[Boolean]("is_anomaly") == want, s"flag drifted: $r")
      assert(varW >= 0.0, s"negative variance escaped the clamp: $r")
    }
    // some events flag, most don't — the gate is live, not degenerate
    val flagged = rows.count(_.getAs[Boolean]("is_anomaly"))
    assert(flagged > 0 && flagged < rows.length / 2,
      s"anomaly gate degenerate: $flagged of ${rows.length}")
    // scale posture: the one window is user-partitioned
    AnalyticsExtras.qAnomaly(spark, sfDir).queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty, "global window in q_anomaly"))
  }

  test("q_multi_distinct: one-pass counts equal per-key recomputations") {
    val rows = AnalyticsExtras.qMultiDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val slice = li.filter(col("l_returnflag") === flag)
      assert(r.getAs[Long]("nd_part") ==
        slice.select("l_partkey").distinct().count())
      assert(r.getAs[Long]("nd_supp") ==
        slice.select("l_suppkey").distinct().count())
      assert(r.getAs[Long]("nd_order") ==
        slice.select("l_orderkey").distinct().count())
      assert(r.getAs[Long]("n_rows") == slice.count())
    }
  }

  test("q_histogram_eqdepth: balanced ordered buckets, no global window") {
    val rows = AnalyticsExtras.qHistogramEqdepth(spark, sfDir)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (0L until 10L).toSeq)
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1, s"not equi-depth: ${sizes.toSeq}")
    assert(sizes.sum == Tables.lineitem(spark, sfDir).count())
    // buckets are ordered price ranges (ties may touch at boundaries)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("min_price") >= a.getAs[Double]("max_price") - 1e-9)
      case _ =>
    }
    // scale posture: the global rank comes from the distributed prefix
    // sum — no unpartitioned window may reach the plan
    val windows = AnalyticsExtras.qHistogramEqdepth(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, "global window in eqdepth"))
  }

  test("q_fuzzy_join: pairs share the blocking noun, distances in (0,3]") {
    val rows = AnalyticsExtras.qFuzzyJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[String]("name_a"); val b = r.getAs[String]("name_b")
      assert(a.split(" ")(1) == b.split(" ")(1), s"pair crosses blocks: $a / $b")
      val d = r.getAs[Int]("dist")
      assert(d >= 1 && d <= 3, s"distance out of bounds: $a / $b = $d")
      assert(a < b, "pair not canonically ordered")
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
    // no duplicate pairs
    val keys = rows.map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b")))
    assert(keys.distinct.length == keys.length)
  }

  test("q_full_outer: unmatched sides survive with zeros, coverage is the union") {
    val rows = AnalyticsExtras.qFullOuter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nc = r.getAs[Long]("n_cust"); val ns = r.getAs[Long]("n_supp")
      r.getAs[String]("presence") match {
        case "both"      => assert(nc > 0 && ns > 0)
        case "cust_only" => assert(nc > 0 && ns == 0)
        case "supp_only" => assert(nc == 0 && ns > 0)
        case p           => fail(s"unknown presence tag $p")
      }
    }
    // the joined key set is exactly the union of the two filtered sides
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000)
      .select(col("c_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val supp = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") > 8000)
      .select(col("s_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(rows.length == (cust ++ supp).size)
  }

  test("q_retention: offset-0 is the full cohort, counts bounded by cohort size") {
    val r = AnalyticsExtras.qRetention(spark, sfDir).cache()
    assert(r.count() > 0)
    // day 0: every cohort member is active by definition
    assert(r.filter(col("day_offset") === 0 &&
      col("n_active") =!= col("cohort_size")).count() == 0)
    assert(r.filter(col("day_offset") === 0 &&
      col("retention_rate") =!= 1.0).count() == 0)
    // no cell exceeds its cohort, offsets are non-negative
    assert(r.filter(col("n_active") > col("cohort_size")).count() == 0)
    assert(r.filter(col("day_offset") < 0).count() == 0)
    // cohort sizes partition the user population
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    val sumCohorts = r.filter(col("day_offset") === 0)
      .agg(sum(col("cohort_size"))).collect()(0).getLong(0)
    assert(sumCohorts == users)
    r.unpersist()
  }

  test("q_skyline: equals a quadratic dominance reference, no global window") {
    val sky = AnalyticsExtras.qSkyline(spark, sfDir)
    // quadratic reference: distinct points not dominated by any other
    val pts = Tables.orders(spark, sfDir)
      .groupBy(col("o_totalprice").as("price"),
        to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDouble(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val expect = pts.filter { case (x, y, _) =>
      !pts.exists { case (qx, qy, _) =>
        qx <= x && qy <= y && (qx < x || qy < y)
      }
    }.map { case (x, y, n) =>
      (x, java.time.LocalDate.ofEpochDay(y).toString, n)
    }.toSet
    val got = sky.collect().map(r => (r.getAs[Double]("price"),
      r.getAs[String]("order_date"), r.getAs[Long]("n_orders"))).toSet
    assert(got == expect, s"skyline mismatch: got $got expected $expect")
    assert(got.nonEmpty)
    // the shipped plan must not contain an UNPARTITIONED window
    val plan = sky.queryExecution.executedPlan.toString
    val badWindow = plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("windowspecdefinition(") &&
        !l.contains("windowspecdefinition(__pid"))
    assert(!badWindow, s"unpartitioned window in skyline plan:\n$plan")
  }

  test("q_funnel: depths match a driver-local quadratic reference") {
    val T = 24L * 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("us")))
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2)).toIndexedSeq
      val depths = sorted.zipWithIndex.collect {
        case ((_, _, "view", vUs), i) =>
          val inWin = sorted.drop(i + 1).filter(r => r._4 > vUs && r._4 <= vUs + T)
          // O(n^2) reference: any click with a later purchase, both in window
          val full = inWin.exists { case (_, cid, cty, cUs) =>
            cty == "click" && sorted.exists { case (_, pid, pty, pUs) =>
              pty == "purchase" && pUs <= vUs + T &&
                (pUs > cUs || (pUs == cUs && pid > cid))
            }
          }
          if (full) 3
          else if (inWin.exists(_._3 == "click")) 2
          else 1
      }
      u -> ((if (depths.isEmpty) None else Some(depths.max),
        depths.count(_ == 3).toLong))
    }
    val got = AnalyticsExtras.qFunnel(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("funnel_depth"), r.getAs[Long]("n_full_chains")))).toMap
    // one output row per user WITH at least one view
    assert(got.keySet == expect.filter(_._2._1.isDefined).keySet)
    expect.foreach {
      case (u, (Some(d), nf)) =>
        assert(got(u) == ((d, nf)), s"user $u: got ${got(u)}, expected ($d, $nf)")
      case _ => ()
    }
    // the corpus exercises the full funnel and at least one shallower depth
    assert(got.values.exists(_._1 == 3), "no user completed the funnel")
  }

  test("q_scd2: intervals chain per user, exactly one open interval each") {
    val rows = AnalyticsExtras.qScd2(spark, sfDir).collect()
    assert(rows.length == Tables.events(spark, sfDir).count(),
      "one interval per changelog event")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val inOrder = rs.sortBy(r =>
        (r.getAs[Long]("valid_from_us"), r.getAs[Long]("event_id")))
      // each interval closes at the next one's open; the last is open
      inOrder.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"),
            s"interval chain broken for user $u")
        case _ => ()
      }
      assert(inOrder.last.getAs[Long]("valid_to_us") == -1L)
      assert(rs.count(_.getAs[Boolean]("is_current")) == 1,
        s"user $u must have exactly one open interval")
      // closed intervals are non-degenerate or zero-length, never inverted
      rs.filter(r => r.getAs[Long]("valid_to_us") != -1L).foreach { r =>
        assert(r.getAs[Long]("valid_to_us") >= r.getAs[Long]("valid_from_us"))
      }
    }
  }

  test("q_recursive: closure matches the parent relation exactly, log-round depth") {
    val rows = AnalyticsExtras.qRecursive(spark, sfDir).collect()
    val n = Tables.customer(spark, sfDir).count()
    assert(rows.length == n, "closure must cover every node exactly once")
    val byV = rows.map(r => r.getAs[Long]("custkey") ->
      (r.getAs[Long]("root"), r.getAs[Long]("depth"))).toMap
    assert(byV.size == n, "duplicate nodes in closure")
    val R = 3L; val F = 8L
    byV.foreach { case (v, (root, depth)) =>
      if (v < R) {
        assert(root == v && depth == 0L, s"root row wrong for $v")
      } else {
        val p = (v - R) / F
        val (pr, pd) = byV(p)
        assert(root == pr, s"node $v root differs from its parent's")
        assert(depth == pd + 1, s"node $v depth is not parent+1")
        assert(root < R, s"node $v resolved to a non-root $root")
      }
    }
    // depth is logarithmic in n (the forest is F-ary by construction)
    val maxDepth = byV.values.map(_._2).max
    assert(maxDepth <= (math.log(n.toDouble) / math.log(F.toDouble)).ceil.toLong + 1,
      s"depth $maxDepth exceeds the F-ary bound")
  }

  test("q_interval_merge: islands disjoint with real gaps, conservation, driver replay") {
    val rows = AnalyticsExtras.qIntervalMerge(spark, sfDir).collect()
    val events = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS s").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s")))
    val len = 1800000000L
    // conservation: every event lands in exactly one island
    assert(rows.map(_.getAs[Long]("n_merged")).sum == events.length)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val spans = rs.sortBy(_.getAs[Long]("island"))
      // islands are numbered 1..k and strictly separated (gap > 0)
      assert(spans.map(_.getAs[Long]("island")).toSeq ==
        (1L to spans.length).toSeq, s"island numbering broken for user $u")
      spans.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_us") < b.getAs[Long]("start_us"),
            s"adjacent islands overlap/touch for user $u")
        case _ => ()
      }
      // driver replay of the merge for this user
      val ivs = events.filter(_._1 == u).map(_._2).sorted.map(s => (s, s + len))
      val merged = ivs.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ms, me, n) :: tail if s <= me =>
            (ms, math.max(me, e), n + 1) :: tail
          case _ => (s, e, 1L) :: acc
        }
      }.reverse
      val got = spans.map(r => (r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_merged"))).toList
      assert(got == merged, s"merge replay mismatch for user $u")
    }
  }
}
