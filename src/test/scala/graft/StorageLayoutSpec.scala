package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.operators.StorageLayout

class StorageLayoutSpec extends SparkSpec {

  /** Final physical plan — unwraps AQE (these queries contain a
    * post-join/post-filter aggregation exchange, so the root is
    * adaptive; the subtree of interest must come from the FINAL plan
    * after the result materialized). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // drive AQE to its final plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Every node of the FINAL plan, descending through the stage
    * wrappers AQE leaves in the finalized tree (QueryStageExec holds
    * its materialized subtree in `plan`, not in `children`, so plain
    * collect stops at stage boundaries). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: allNodes(q.plan)
      case n => Seq(n)
    }

  test("q_colocated_join: sort-merge join with ZERO shuffle below the join") {
    val df = StorageLayout.qColocatedJoin(spark, sfDir)
    val plan = finalPlan(df)
    val joins = allNodes(plan).collect { case j: SortMergeJoinExec => j }
    assert(joins.size == 1, s"expected one SortMergeJoin, plan:\n$plan")
    val shuffles = allNodes(joins.head).filter {
      case _: ShuffleExchangeLike => true
      case _: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => true
      case _ => false
    }
    assert(shuffles.isEmpty,
      s"bucketed co-located join must not shuffle below the join, found: " +
        shuffles.map(_.nodeName).mkString(", "))
    // both children really are bucket-aligned scans, not accidental
    // single-partition reads
    val scans = allNodes(joins.head).collect { case f: FileSourceScanExec => f }
    assert(scans.size == 2 && scans.forall(_.bucketedScan),
      s"both join children must be bucketed scans: ${scans.map(_.metadata.get("SelectedBucketsCount"))}")
  }

  test("q_colocated_join: equals the plain (shuffled) join") {
    val bucketed = StorageLayout.qColocatedJoin(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
    val l = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,4)")
          * (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("o_orderkey")).as("n_orders"))
    assert(bucketed.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("q_partition_prune: scan reads exactly one partition via pruning") {
    val df = StorageLayout.qPartitionPrune(spark, sfDir)
    val plan = finalPlan(df)
    val scans = allNodes(plan).collect { case f: FileSourceScanExec => f }
    assert(scans.size == 1, s"expected one scan, plan:\n$plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "the event_date predicate must be consumed as a partition filter")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"pruning must select exactly the one date directory, got ${scan.selectedPartitions.partitionCount}")
  }

  test("zkey: bit interleave is exact on known patterns") {
    import spark.implicits._
    val rows = Seq(
      (0xFFFFL, 0L),  // all-user bits -> even positions
      (0L, 0xFFFFL),  // all-time bits -> odd positions
      (3L, 1L),       // spread(3)=0b101, spread(1)<<1=0b10 -> 0b111
      (0L, 0L))
    val anchor = 1704067200000000L
    val df = rows.toDF("u", "m")
      .select(StorageLayout.zkey(col("u"),
        timestamp_micros(col("m") * 60000000L + anchor)).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0L))
  }

  test("q_zorder_skip: box predicate prunes most row groups at scan") {
    val df = StorageLayout.qZorderSkip(spark, sfDir)
    val plan = finalPlan(df)
    val scans = allNodes(plan).collect { case f: FileSourceScanExec => f }
    assert(scans.size == 1, s"expected one scan, plan:\n$plan")
    val scan = scans.head
    // both dimensions must reach the parquet reader as pushed filters
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("user_id") && pushed.contains("ts"),
      s"both box predicates must be pushed, got: $pushed")
    // z-clustering gives every file tight min/max on BOTH columns, so
    // stats skipping drops most row groups before any row is read
    val scanned = scan.metrics("numOutputRows").value
    val total = Tables.events(spark, sfDir).count()
    assert(scanned > 0, "scan read nothing — the box matched no data?")
    assert(scanned <= total * 2 / 5,
      s"z-ordered scan read $scanned of $total rows — stats skipping not effective")
  }

  test("q_zorder_skip: equals the box filter on the source table") {
    val z = StorageLayout.qZorderSkip(spark, sfDir)
    val plain = Tables.events(spark, sfDir)
      .filter(col("user_id").between(10L, 19L) &&
        col("ts") >= lit("2024-01-15").cast("timestamp") &&
        col("ts") < lit("2024-01-16").cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(12,4)")).cast("double").as("sum_value"))
    assert(z.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("q_incremental_agg: merge equals full recompute, history untouched") {
    val merged = StorageLayout.qIncrementalAgg(spark, sfDir)
    // the merged store must equal a one-shot aggregate over all events
    val full = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,4)")).as("s"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("event_date"), col("event_type"), col("n_events"),
        col("s").cast("double").as("sum_value"),
        col("min_value"), col("max_value"))
    val m = merged.collect().map(_.toString).sorted.toSeq
    assert(m == full.collect().map(_.toString).sorted.toSeq)
    // incremental property: every pre-cutoff group is the STORE row,
    // bit-identical — the merge never recomputes history
    val preOnly = Tables.events(spark, sfDir)
      .filter(col("ts") < lit("2024-01-25").cast("timestamp"))
    val storePart = preOnly
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,4)")).as("s"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .filter(col("event_date") < "2024-01-25")
      .select(col("event_date"), col("event_type"), col("n_events"),
        col("s").cast("double").as("sum_value"),
        col("min_value"), col("max_value"))
    val mergedPre = merged.filter(col("event_date") < "2024-01-25")
    assert(mergedPre.collect().map(_.toString).sorted.toSeq ==
      storePart.collect().map(_.toString).sorted.toSeq)
    // both eras contribute groups (the merge actually merged)
    assert(merged.filter(col("event_date") >= "2024-01-25").count() > 0)
    assert(mergedPre.count() > 0)
  }

  test("q_delta_upsert: merge equals one-shot latest-per-key, all actions occur") {
    val merged = StorageLayout.qDeltaUpsert(spark, sfDir).cache()
    // one-shot recompute: latest (ts, event_id) per key over the full range
    val ranged = Tables.events(spark, sfDir)
      .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val full = ranged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"),
        col("event_id").as("last_event_id"), col("value").as("last_value"))
    assert(merged.drop("action").collect().map(_.toString).sorted.toSeq ==
      full.collect().map(_.toString).sorted.toSeq)
    // one output row per distinct key in range
    assert(merged.count() ==
      ranged.select("user_id", "event_type").distinct().count())
    // the corpus exercises every MERGE action at this sf
    val actions = merged.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("update", "insert", "keep").subsetOf(actions.keySet),
      s"missing actions: $actions")
    // keep rows are the store rows untouched: their ts predates the cutoff
    assert(merged.filter(col("action") === "keep" &&
      col("last_ts") >= "2024-01-05").count() == 0)
    // insert rows carry only batch-era timestamps
    assert(merged.filter(col("action") === "insert" &&
      col("last_ts") < "2024-01-05").count() == 0)
    merged.unpersist()
  }

  test("q_hll_store: merged day sketches track exact weekly distincts") {
    val r = StorageLayout.qHllStore(spark, sfDir).cache()
    assert(r.count() > 0)
    // every weekly estimate inside the 5% gate, flags consistent
    r.collect().foreach { row =>
      val est = row.getAs[Long]("est"); val exact = row.getAs[Long]("exact")
      val rel = math.abs(est - exact).toDouble / exact.toDouble
      assert(row.getAs[Double]("rel_error") == rel)
      assert(row.getAs[Boolean]("ok") == (rel <= 0.05))
      assert(row.getAs[Boolean]("ok"), s"week ${row.getString(0)}: est $est vs exact $exact")
    }
    // exact side equals a direct recompute per week
    val direct = Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.collect().foreach { row =>
      assert(row.getAs[Long]("exact") == direct(row.getString(0)))
    }
    // mergeability: unioned day sketches give the same estimate as a
    // single-pass weekly sketch over raw events
    val onePass = Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est1"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.collect().foreach { row =>
      assert(row.getAs[Long]("est") == onePass(row.getString(0)),
        s"union-of-days diverged from one-pass for ${row.getString(0)}")
    }
    r.unpersist()
  }

  test("q_store_compact: serve view identical pre/post, fewer files after") {
    val compacted = StorageLayout.qStoreCompact(spark, sfDir)
    // the compacted merge is bit-identical to the direct upsert merge
    val direct = StorageLayout.qDeltaUpsert(spark, sfDir)
    assert(compacted.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
    // compaction reduced the file count and preserved the store view
    val (segPath, compactPath) = StorageLayout.compactPaths(spark, sfDir)
    def partFiles(p: String): Int =
      Option(new java.io.File(p).listFiles).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-") && f.length > 0)
    assert(partFiles(segPath) > partFiles(compactPath),
      s"compaction did not reduce files: ${partFiles(segPath)} vs ${partFiles(compactPath)}")
    assert(partFiles(compactPath) == 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val segServe = spark.read.parquet(segPath)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .collect().map(_.toString).sorted.toSeq
    val compactServe = spark.read.parquet(compactPath)
      .collect().map(_.toString).sorted.toSeq
    assert(segServe == compactServe, "compacted store diverged from segment fold")
  }

  test("q_partition_prune: equals the time-range filter on the source table") {
    val pruned = StorageLayout.qPartitionPrune(spark, sfDir)
    val plain = Tables.events(spark, sfDir)
      .filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
        col("ts") < lit("2024-01-16").cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(12,4)")).cast("double").as("sum_value"))
    assert(pruned.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("q_theta_store: one row per consecutive day pair, exact-mode algebra consistent") {
    import org.apache.spark.sql.functions._
    val rows = StorageLayout.qThetaStore(spark, sfDir).collect()
    val nDays = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    assert(rows.length == nDays - 1, s"${rows.length} pairs for $nDays days")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"), s"gate failed: $r")
      // test-scale sketches are exact-mode: every estimate equals its audit
      assert(r.getAs[Double]("est_returning") ==
        r.getAs[Long]("exact_returning").toDouble)
      assert(r.getAs[Double]("est_churned") ==
        r.getAs[Long]("exact_churned").toDouble)
      assert(r.getAs[Double]("est_new") == r.getAs[Long]("exact_new").toDouble)
      // partition identities: prev = returning + churned, cur = returning + new
      assert(r.getAs[Double]("est_prev") ==
        (r.getAs[Long]("exact_returning") + r.getAs[Long]("exact_churned")).toDouble)
      assert(r.getAs[Double]("est_cur") ==
        (r.getAs[Long]("exact_returning") + r.getAs[Long]("exact_new")).toDouble)
    }
  }
}
