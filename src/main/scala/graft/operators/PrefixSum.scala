package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the scale-safe replacement for
  * Spark's unpartitioned window (which plans every global running
  * sum/rank as ONE sorted task, the textbook serialization point at
  * 100 TB):
  *
  *   1. range-partition on the total-order key, so each partition
  *      holds a contiguous key run;
  *   2. per-partition partial sums — #partitions small rows to the
  *      driver, independent of data size;
  *   3. broadcast exclusive offsets back and add a PARTITIONED window
  *      cumsum, so wall-clock tracks the largest partition.
  *
  * The result is exactly the global inclusive running sum regardless
  * of where the sampled range boundaries fall (offsets reconstruct
  * the global prefix for any partitioning of a total order).
  * Consumers: [[Sampling.shardPack]] (token-weighted),
  * [[AnalyticsExtras.qHistogramEqdepth]] (unit-weighted global rank).
  */
private[graft] object PrefixSum {

  /** Appends `cumName` = inclusive running sum of `weight` (must be a
    * LongType column already present in `df`) in `sortCols` order.
    * `sortCols` must be a total order (include a tiebreak key).
    * Materializes `df` once (localCheckpoint) so the partition
    * assignment seen by the partial-sum pass and the cumsum pass is
    * identical.
    *
    * Null handling: per-partition partials are `coalesce(sum, 0)`, so
    * an all-null partition contributes 0 to the offsets; within the
    * cumsum window, null weights are skipped (SQL sum semantics). The
    * contract is therefore "null weight = weight 0" for offset
    * purposes — callers wanting strict arithmetic should pre-coalesce
    * the weight column. */
  def runningSum(df: DataFrame, sortCols: Seq[Column], weightCol: String,
                 cumName: String): DataFrame =
    runningSumWithTotal(df, sortCols, weightCol, cumName)._1

  /** Appends `minName` = EXCLUSIVE running minimum of `valueCol` (a
    * LongType column) over all strictly-preceding rows in `sortCols`
    * order (null for the global first row) — the running-min monoid on
    * the same 3-step scheme as [[runningSum]]: range-partition,
    * #partitions partial minima to the driver, broadcast exclusive
    * prefix-min offsets back, and a PARTITIONED exclusive-frame window
    * combined with `least` (which skips nulls). Consumer:
    * [[AnalyticsExtras.qSkyline]] — the skyline scan is a global
    * running min that must never plan as one sorted task. */
  def runningMinExclusive(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                          minName: String): DataFrame = {
    val parts = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partials = parts.groupBy("__pid")
      .agg(min(col(valueCol)).as("m"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var acc: Option[Long] = None
    val offsets = partials.map { case (pid, m) =>
      val o = acc
      acc = (acc, m) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b) => a.orElse(b)
      }
      (pid, o)
    }
    val s = df.sparkSession
    import s.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__minoff")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = parts.join(broadcast(offDf), "__pid")
      .withColumn(minName, least(min(col(valueCol)).over(w), col("__minoff")))
      .drop("__pid", "__minoff")
    out
  }

  /** Keyed [[runningSumWithTotal]]: per-GROUP inclusive running sum in
    * `sortCols` order within each `groupCols` group, plus a small
    * (group → total) DataFrame. A per-group global rank planned as
    * `Window.partitionBy(group)` serializes each group into ONE sorted
    * task — for low-cardinality groups over a large corpus (languages
    * over documents: a handful of groups, terabytes each) that is the
    * same bottleneck the unpartitioned window has globally. Same
    * 3-step scheme instead: range-partition on (group ++ sort) so each
    * partition holds a contiguous run of at most a few groups, send
    * #partitions × #groups-present-per-partition partial sums to the
    * driver (bounded by #partitions + #groups − 1 for a range
    * partitioning, NOT #partitions × #groups — each partition overlaps
    * at most 2 group boundaries), broadcast per-(partition, group)
    * exclusive offsets back, and cumsum inside a (partition, group)
    * window. Caller contract: `groupCols` has bounded cardinality
    * (driver traffic scales with it), and `weightCol` must be a
    * LongType column already present in `df` — the same contract as
    * [[runningSum]] (the driver-side partial collection reads it as
    * Long). A NULL group key is a real group here (both the ranked
    * output and the totals frame carry it), so any join back against
    * the returned totals must use null-safe equality (`<=>`) on the
    * group columns — plain equality silently drops the null group. */
  def runningSumKeyed(df: DataFrame, groupCols: Seq[String], sortCols: Seq[Column],
                      weightCol: String, cumName: String): (DataFrame, DataFrame) = {
    val order = groupCols.map(col) ++ sortCols
    val parts = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partials = parts.groupBy("__pid", groupCols: _*)
      .agg(coalesce(sum(col(weightCol)), lit(0L)).as("t"))
      .collect()
      .map(r => (r.getInt(0), groupCols.indices.map(i => r.get(i + 1)).toList,
        r.getLong(groupCols.size + 1)))
    // exclusive prefix per group across partitions, in partition order
    val acc = scala.collection.mutable.Map.empty[List[Any], Long]
    val offsets = partials.sortBy(_._1).map { case (pid, g, t) =>
      val o = acc.getOrElse(g, 0L)
      acc(g) = o + t
      org.apache.spark.sql.Row.fromSeq(pid +: g :+ o)
    }
    val s = df.sparkSession
    val keySchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType) +:
      groupCols.map(c => parts.schema(c)) :+
      org.apache.spark.sql.types.StructField("__offset",
        org.apache.spark.sql.types.LongType))
    val offDf = s.createDataFrame(
      s.sparkContext.parallelize(offsets.toSeq, 1), keySchema)
    val w = Window.partitionBy(col("__pid") +: groupCols.map(col): _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-SAFE group equality: a null group key is a real group to
    // the partials (groupBy treats null as a key), so the offsets
    // join must match it too — plain equality would silently DROP
    // every null-group row here
    val offRenamed = groupCols.zipWithIndex.foldLeft(
      offDf.withColumnRenamed("__pid", "__opid")) {
        case (df, (g, i)) => df.withColumnRenamed(g, s"__g$i")
      }
    val joinCond = groupCols.zipWithIndex.foldLeft(
      col("__pid") === col("__opid")) {
        case (c, (g, i)) => c && (col(g) <=> col(s"__g$i"))
      }
    val out = parts.join(broadcast(offRenamed), joinCond)
      .withColumn(cumName, sum(col(weightCol)).over(w) + col("__offset"))
      .drop("__pid" +: "__opid" +: "__offset" +:
        groupCols.indices.map(i => s"__g$i"): _*)
    val totals = acc.toSeq.map { case (g, t) =>
      org.apache.spark.sql.Row.fromSeq(g :+ t) }
    val totSchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => parts.schema(c)) :+
      org.apache.spark.sql.types.StructField("__total",
        org.apache.spark.sql.types.LongType))
    (out, s.createDataFrame(s.sparkContext.parallelize(totals, 1), totSchema))
  }

  /** [[runningSum]] plus the GRAND TOTAL of the weight column, which
    * the per-partition partials already compute — callers needing N
    * (equi-depth bucketing, normalized ranks) get it for free instead
    * of paying a separate full `count()` scan. */
  def runningSumWithTotal(df: DataFrame, sortCols: Seq[Column], weightCol: String,
                          cumName: String): (DataFrame, Long) = {
    val parts = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val partials = parts.groupBy("__pid")
      .agg(coalesce(sum(col(weightCol)), lit(0L)).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partials.map { case (pid, t) => val o = acc; acc += t; (pid, o) }
    val s = df.sparkSession
    import s.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__offset")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = parts.join(broadcast(offDf), "__pid")
      .withColumn(cumName, sum(col(weightCol)).over(w) + col("__offset"))
      .drop("__pid", "__offset")
    (out, acc)
  }
}
