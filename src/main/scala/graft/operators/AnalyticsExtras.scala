package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.SkewFns

/** Analytic-core extensions (SURVEY.md §2.A): sliding-frame windows
  * with lag/lead, cube/grouping-sets, ordered string aggregation,
  * per-group top-k, set operations, post-aggregation filters,
  * partitioned ntile, and an oracled salted aggregation.
  *
  * All eight are DuckDB-oracled. Decimal-exact sum rules from
  * SURVEY.md §5 apply to every aggregated double.
  *
  * Scale posture: every window here is PARTITIONED (by customer /
  * nation / event user) — no global single-partition window exists in
  * this file; the per-group top-k filter compiles to Spark's
  * WindowGroupLimit so each partition keeps only k rows before the
  * final sort; the salted aggregation is the two-level (partial →
  * merge) pattern that survives a hot key at 100 TB.
  */
object AnalyticsExtras {

  private def decP(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(12, 4))
  private def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("double")

  // ---- q_moving_avg: lag/lead + 3-row sliding average ------------------
  /** Per-customer order history: previous/next order price and the
    * 3-order trailing moving average. One shuffle on o_custkey; the
    * frame is ROWS-bounded so state per key is O(frame). */
  def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val w3 = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      (dbl(sum(decP(col("o_totalprice"))).over(w3)) /
        dbl(count(lit(1)).over(w3))).as("ma3"))
  }

  val qMovingAvgSql: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER w3 AS VARCHAR) AS DOUBLE)
      |    / CAST(COUNT(*) OVER w3 AS DOUBLE) AS ma3
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---- q_cube: full cube with grouping_id ------------------------------
  /** CUBE over (returnflag, linestatus): all four grouping sets in one
    * pass (Spark expands to a union of partial aggs over one shuffle).
    * grouping_id disambiguates a real 'ALL' value from a subtotal. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        dbl(sum(decP(col("l_quantity")))).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("sum_qty"), col("n_rows"))

  val qCubeSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // ---- q_string_agg: ordered distinct string aggregation ---------------
  /** Per nation: distinct market segments present, as one ordered
    * comma-joined string. collect_set shuffles only distinct
    * (nationkey, segment) pairs after partial dedup; the sort is
    * per-group over ≤5 elements. */
  def qStringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"))

  val qStringAggSql: String =
    """SELECT c_nationkey, COUNT(*) AS n_customers,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
      |FROM customer GROUP BY c_nationkey""".stripMargin

  // ---- q_group_topk: top-2 orders per customer -------------------------
  /** row_number ≤ k filtered right after the window: Spark plans a
    * WindowGroupLimit, so each shuffle partition retains only k rows
    * per key before the full window evaluation — the scalable form of
    * per-group top-k (vs. a global sort or per-group collect). */
  def qGroupTopK(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 2)
  }

  val qGroupTopKSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 2""".stripMargin

  // ---- q_setops: INTERSECT / EXCEPT ------------------------------------
  /** Customers ordering in both 1996 and 1997, minus any customer with
    * a finished ('F') order: (A ∩ B) \ C. Each leg is a pushdown scan;
    * the set ops are hash aggregations on the key. */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def keysIn(from: String, until: String): DataFrame =
      o.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))
        .select(col("o_custkey").as("custkey"))
    val withF = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    keysIn("1996-01-01", "1997-01-01")
      .intersect(keysIn("1997-01-01", "1998-01-01"))
      .except(withF)
  }

  val qSetOpsSql: String =
    """SELECT o_custkey AS custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin

  // ---- q_having: post-aggregation group filter -------------------------
  /** Nations×segments whose customers hold above-threshold total
    * balance — the HAVING clause; the filter applies after the final
    * agg merge, partial aggregation still map-side. */
  def qHaving(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        dbl(sum(decP(col("c_acctbal")))).as("sum_bal"))
      .filter(col("n_customers") >= 3 && col("sum_bal") > 0.0)

  val qHavingSql: String =
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_bal
      |FROM customer GROUP BY c_nationkey, c_mktsegment
      |HAVING COUNT(*) >= 3
      |  AND CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) > 0.0""".stripMargin

  // ---- q_ntile: partitioned decile assignment --------------------------
  /** Balance deciles within each nation. Partitioned by nation so the
    * sort is per-partition — no global single-partition window; the
    * (c_acctbal, c_custkey) order is total, so tiles are
    * deterministic. Nation cardinality is FIXED (25), so per-group
    * size grows with the corpus: this key deliberately demonstrates
    * the native ntile surface; when a few-huge-groups rank must scale
    * past one task per group, derive the tile from
    * [[PrefixSum.runningSumKeyed]]'s (rank, total) instead (the
    * mix_budget/text_ccnet form). */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(10).over(w).as("decile"))
  }

  val qNtileSql: String =
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  ntile(10) OVER (PARTITION BY c_nationkey
      |    ORDER BY c_acctbal, c_custkey) AS decile
      |FROM customer""".stripMargin

  // ---- q_outer_join: left outer join with null-preserving agg ----------
  /** Per-customer order profile including customers with NO orders
    * (count 0, spend 0.0) — the outer-join capability the semi/anti
    * pair doesn't cover. The unmatched side survives the join as
    * nulls and the aggregates state them explicitly. */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_mktsegment")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dbl(sum(decP(col("o_totalprice")))), lit(0.0)).as("total_spend"))

  val qOuterJoinSql: String =
    """SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
      |  COALESCE(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE), 0.0) AS total_spend
      |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment""".stripMargin

  // ---- q_gap_fill: time-spine densification ----------------------------
  /** Monthly revenue per customer with missing months filled as
    * explicit zeros: each customer's spine spans their own first-to-
    * last order month (sequence + explode over the MONTHLY table —
    * a generated dimension derived from the aggregate, never a
    * second pass over the fact table), left-joined back with the
    * monthly aggregate. The fact table is scanned and shuffled
    * exactly once (the monthly agg — materialized so both the spine
    * bounds and the join reuse it); the spine join strategy is left
    * to statistics (broadcast while monthly is small, shuffle on
    * (custkey, month) at scale). */
  def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("custkey"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(dbl(sum(decP(col("o_totalprice")))).as("revenue"))
      .localCheckpoint(true) // two consumers: spine bounds + the join
    val spine = monthly.groupBy("custkey")
      .agg(min(col("month")).as("m0"), max(col("month")).as("m1"))
      .select(col("custkey"),
        explode(sequence(col("m0"), col("m1"),
          expr("interval 1 month"))).as("month"))
    spine.join(monthly, Seq("custkey", "month"), "left_outer")
      .select(col("custkey"),
        date_format(col("month"), "yyyy-MM").as("month"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        col("revenue").isNotNull.as("had_orders"))
  }

  val qGapFillSql: String =
    """WITH monthly AS (
      |  SELECT o_custkey AS custkey, date_trunc('month', o_orderdate) AS month,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1, 2
      |), spine AS (
      |  SELECT custkey, unnest(generate_series(MIN(month), MAX(month),
      |    INTERVAL 1 MONTH)) AS month
      |  FROM monthly GROUP BY custkey
      |)
      |SELECT s.custkey, strftime(s.month, '%Y-%m') AS month,
      |  COALESCE(m.revenue, 0.0) AS revenue,
      |  m.revenue IS NOT NULL AS had_orders
      |FROM spine s LEFT JOIN monthly m
      |  ON s.custkey = m.custkey AND s.month = m.month""".stripMargin

  // ---- q_histogram: fixed-width numeric binning ------------------------
  /** Price histogram over lineitem: integer bucket = floor(price/W).
    * One partial→final agg on the bucket key; bucket arithmetic is a
    * single correctly-rounded double division + floor, so the binning
    * is bit-identical cross-engine and scale-free (bucket count is
    * bounded by the value range, not the row count). */
  private val HistWidth = 5000.0
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(floor(col("l_extendedprice") / lit(HistWidth)).cast("long")
        .as("bucket"))
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(decP(col("l_extendedprice")))).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .withColumn("lo", col("bucket").cast("double") * lit(HistWidth))

  val qHistogramSql: String =
    """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
      |  COUNT(*) AS n_items,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  CAST(floor(l_extendedprice / 5000.0) AS BIGINT) * 5000.0 AS lo
      |FROM lineitem
      |GROUP BY CAST(floor(l_extendedprice / 5000.0) AS BIGINT)""".stripMargin

  // ---- q_stats: moment statistics from exact decimal sums --------------
  /** Per-flag mean / sample variance / stddev / correlation, derived
    * from DECIMAL-EXACT power sums (Σx, Σx², Σy, Σy², Σxy) — the
    * distributed-moments formulation: the shuffle carries five decimal
    * partials per group regardless of row count, and because the sums
    * are exact (not floating accumulations) the result is
    * order-independent and bit-identical cross-engine. The derived
    * stats are computed in double with one fixed expression order in
    * both engines (built-in stddev/corr would accumulate floats in
    * partition order — nondeterministic under repartitioning). */
  def qStats(s: SparkSession, dir: String): DataFrame = {
    val qd = decP(col("l_quantity"))
    val pd = decP(col("l_extendedprice"))
    val a = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        dbl(sum(qd)).as("sx"), dbl(sum(qd * qd)).as("sxx"),
        dbl(sum(pd)).as("sy"), dbl(sum(pd * pd)).as("syy"),
        dbl(sum(qd * pd)).as("sxy"))
    val nD = col("n").cast("double")
    a.select(col("l_returnflag"), col("n"),
      (col("sx") / nD).as("mean_qty"),
      ((nD * col("sxx") - col("sx") * col("sx")) / (nD * (nD - lit(1.0))))
        .as("var_qty"),
      sqrt((nD * col("sxx") - col("sx") * col("sx")) / (nD * (nD - lit(1.0))))
        .as("stddev_qty"),
      (col("sy") / nD).as("mean_price"),
      ((nD * col("sxy") - col("sx") * col("sy")) /
        (sqrt(nD * col("sxx") - col("sx") * col("sx")) *
          sqrt(nD * col("syy") - col("sy") * col("sy")))).as("corr_qty_price"))
  }

  val qStatsSql: String =
    """WITH a AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n,
      |  sx / CAST(n AS DOUBLE) AS mean_qty,
      |  (CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_qty,
      |  sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty,
      |  sy / CAST(n AS DOUBLE) AS mean_price,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy) /
      |    (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price
      |FROM a""".stripMargin

  // ---- q_skew_salted: two-level salted aggregation, oracled ------------
  /** Per-user event counts via SkewFns.saltedCount (partial agg on
    * (key, salt), merge per key). The oracle is the PLAIN GROUP BY —
    * an independent engine confirming the salted two-level plan is
    * semantics-preserving. */
  def qSkewSalted(s: SparkSession, dir: String): DataFrame =
    SkewFns.saltedCount(Tables.events(s, dir), "user_id", col("event_id"), 8)

  val qSkewSaltedSql: String =
    "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id"

  // ---- q_percent_rank: relative-position window functions --------------
  /** percent_rank + cume_dist per nation over a TOTAL order (balance,
    * then custkey) — with no rank peers both definitions are exact
    * rational arithmetic ((rank-1)/(n-1), rank/n) and bit-identical
    * cross-engine. Partitioned window, no global sort; as with
    * [[qNtile]], the few-huge-groups scale form is
    * [[PrefixSum.runningSumKeyed]]'s (rank, total) — this key
    * demonstrates the native surface. */
  def qPercentRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
  }

  val qPercentRankSql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""".stripMargin

  // ---- q_grouping_sets: arbitrary grouping-set combination -------------
  /** GROUPING SETS that neither ROLLUP nor CUBE can express —
    * ((flag, status), (status), ()) — in one Expand-planned pass
    * (each set is one tagged row copy, partial-aggregated map-side;
    * the complement of q_rollup/q_cube, which cover the hierarchical
    * and full-lattice specials). Via the SQL surface: Spark's
    * DataFrame API exposes only rollup/cube, so this is also the
    * driver-contract proof that `spark.sql` plans land in the same
    * engine paths. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gsets")
    s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_rows
      FROM lineitem_gsets
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""")
  }

  val qGroupingSetsSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin

  // ---- profile_table: one-pass column profiler -------------------------
  /** Data-quality profile of the numeric measure columns in ONE scan:
    * null count, exact distinct count, min, max per column. The four
    * distinct counts ride the same Expand strategy as
    * q_multi_distinct (one scan, tagged copies, map-side partials) —
    * the profile a pipeline runs before trusting a new drop of data,
    * at a cost that stays one table pass at any scale. */
  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val aggs = ProfileCols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    val one = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stackArgs = ProfileCols.map(c =>
      s"'$c', nn_$c, nd_$c, min_$c, max_$c").mkString(", ")
    one.selectExpr("n_rows",
      s"stack(${ProfileCols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
  }

  val profileTableSql: String = {
    val arms = ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, n_rows,
         |  nn_$c AS n_nulls, nd_$c AS n_distinct,
         |  min_$c AS min_val, max_$c AS max_val FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    val aggs = ProfileCols.map { c =>
      s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c,
         |  COUNT(DISTINCT $c) AS nd_$c, MIN($c) AS min_$c, MAX($c) AS max_$c""".stripMargin
    }.mkString(",\n  ")
    s"""WITH a AS (
       |  SELECT COUNT(*) AS n_rows,
       |  $aggs
       |  FROM lineitem
       |)
       |$arms""".stripMargin
  }

  // ---- q_window_range: RANGE-framed event-time sliding aggregate -------
  /** Trailing 1-hour RANGE frame per user: for every event, the count
    * and decimal-exact value sum of that user's events in the
    * preceding hour (inclusive). RANGE frames bound state by TIME —
    * the frame is defined by the ordering value, so ts ties are peers
    * and the result is deterministic with no tiebreak column (the
    * complement of q_moving_avg's ROWS frame, which is why both
    * exist). The window is PARTITIONED by user; event time is
    * microseconds since epoch in both engines. */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double"))
      .select("event_id", "user_id", "us", "n_1h", "sum_1h")
  }

  val qWindowRangeSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS us,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // ---- q_anomaly: trailing-window z-score anomaly flags ----------------
  /** Streaming-shaped anomaly detection in batch form: each event
    * scored against its user's TRAILING 7-day window (the
    * q_window_range RANGE frame, widened to the corpus's monthly
    * activity density) — flagged iff the window holds ≥ 5
    * prior+current events AND (value − mean)² > 9·var, i.e. |z| > 3
    * WITHOUT a square root (the squared comparison keeps the whole
    * gate in the proven decimal-power-sum arithmetic; q_stats
    * established the cross-engine parity of exactly these moments).
    * Sums ride as DECIMAL so partitioning never reorders float
    * accumulation; the single window pass computes count, Σv and Σv²
    * together. One Exchange on user_id, one sort, no self-join —
    * the shape a fraud/telemetry pipeline runs per key at 100 TB. */
  def qAnomaly(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-7L * 86400L * 1000000L, Window.currentRow)
    val decV = col("value").cast(DecimalType(24, 8))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("sum_w", sum(decV).over(w).cast("double"))
      .withColumn("sum2_w", sum(decV * decV).over(w).cast("double"))
      .withColumn("mean_w", col("sum_w") / col("n_w").cast("double"))
      // clamp: the double evaluation of the decimal power sums can
      // round a ZERO-variance window to a tiny negative, and
      // x² > 9·(−ε) would then flag every event of a perfectly
      // constant signal — the opposite of an anomaly. A zero-spread
      // window has no z-score, so the gate also requires var > 0.
      .withColumn("var_w", greatest(
        (col("sum2_w") - col("sum_w") * col("sum_w") / col("n_w").cast("double"))
          / col("n_w").cast("double"), lit(0.0)))
      .withColumn("is_anomaly",
        col("n_w") >= 5 && col("var_w") > 0.0 &&
          (col("value") - col("mean_w")) * (col("value") - col("mean_w"))
            > lit(9.0) * col("var_w"))
      .select("event_id", "user_id", "us", "value", "n_w", "mean_w", "var_w",
        "is_anomaly")
  }

  val qAnomalySql: String =
    """SELECT event_id, user_id, us, value, n_w,
      |  sum_w / CAST(n_w AS DOUBLE) AS mean_w,
      |  greatest((sum2_w - sum_w * sum_w / CAST(n_w AS DOUBLE)) / CAST(n_w AS DOUBLE),
      |    0.0) AS var_w,
      |  n_w >= 5 AND
      |    greatest((sum2_w - sum_w * sum_w / CAST(n_w AS DOUBLE)) / CAST(n_w AS DOUBLE),
      |      0.0) > 0.0 AND
      |    (value - sum_w / CAST(n_w AS DOUBLE)) * (value - sum_w / CAST(n_w AS DOUBLE))
      |      > 9.0 * greatest((sum2_w - sum_w * sum_w / CAST(n_w AS DOUBLE))
      |          / CAST(n_w AS DOUBLE), 0.0)
      |    AS is_anomaly
      |FROM (
      |  SELECT event_id, user_id, epoch_us(ts) AS us, value,
      |    COUNT(*) OVER w AS n_w,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(24,8))) OVER w AS VARCHAR) AS DOUBLE) AS sum_w,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(24,8)) * CAST(value AS DECIMAL(24,8))) OVER w
      |      AS VARCHAR) AS DOUBLE) AS sum2_w
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |)""".stripMargin

  // ---- q_multi_distinct: several COUNT(DISTINCT) in one pass -----------
  /** Three distinct-counts over different keys in ONE aggregation:
    * Catalyst plans this with an Expand (one row copy per distinct
    * key, tagged by gid) feeding a two-level aggregate, so the table
    * is scanned once and each copy partial-aggregates map-side —
    * scan count stays 1 at any scale, trading a bounded 3× row
    * expansion for two extra passes over the data that a naive
    * per-key self-join formulation would pay as three scans plus
    * joins. */
  def qMultiDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_orderkey")).as("nd_order"),
        count(lit(1)).as("n_rows"))

  val qMultiDistinctSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS nd_part,
      |  COUNT(DISTINCT l_suppkey) AS nd_supp,
      |  COUNT(DISTINCT l_orderkey) AS nd_order,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---- q_histogram_eqdepth: equi-depth histogram via distributed rank --
  /** Equi-depth (equal-frequency) histogram over l_extendedprice:
    * B buckets of ~N/B rows each, with per-bucket count, bounds, and a
    * decimal-exact revenue sum. The global rank that assigns buckets
    * is [[PrefixSum.runningSum]] with unit weights — a distributed
    * prefix rank — NOT ntile()/row_number() over a global window,
    * which Spark plans as one sorted task (the complement of
    * q_histogram's equi-width bucketing, which needs no rank at all).
    * Ties on price are broken by (l_orderkey, l_linenumber), so
    * assignment is a total order and fully deterministic. */
  private val EqDepthBuckets = 10

  def qHistogramEqdepth(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"),
        lit(1L).as("one"))
    // N comes from the prefix sum's own partition partials — no
    // separate count() scan (2 jobs, not 3)
    val (ranked, n) = PrefixSum.runningSumWithTotal(base,
      Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), "one", "rk")
    ranked
      .withColumn("bucket",
        floor((col("rk") - 1) * EqDepthBuckets / lit(n.toDouble)).cast("long"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_rows"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        sum(decP(col("l_extendedprice"))).cast("double").as("sum_price"))
  }

  val qHistogramEqdepthSql: String =
    s"""WITH r AS (
      |  SELECT l_extendedprice,
      |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rk,
      |    COUNT(*) OVER () AS n
      |  FROM lineitem
      |)
      |SELECT CAST(floor((rk - 1) * $EqDepthBuckets / CAST(n AS DOUBLE)) AS BIGINT) AS bucket,
      |  COUNT(*) AS n_rows,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM r GROUP BY 1""".stripMargin

  // ---- q_fuzzy_join: blocked edit-distance similarity join -------------
  /** Entity-resolution join: part names within edit distance 3 of each
    * other, blocked on the name's head noun so candidates come from an
    * equi-join — never a cartesian; the levenshtein verify runs only
    * inside a block. The fuzzy match runs on DISTINCT names (the
    * dedup-before-similarity layering every fuzzy join needs: a
    * row-level formulation re-finds each name pair n_a×n_b times),
    * then joins per-name row counts back so the output carries the
    * row-pair accounting. At 100 TB the name table is the small
    * distinct side — broadcast by statistics — while the counts stay
    * an aggregation over the fact scan. */
  def qFuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.part(s, dir)
      .groupBy("p_name").agg(count(lit(1)).as("n_rows"))
    val names = counts
      .select(col("p_name"), split(col("p_name"), " ").getItem(1).as("noun"))
    names.select(col("p_name").as("name_a"), col("noun"))
      .join(names.select(col("p_name").as("name_b"), col("noun")), "noun")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
      .join(counts.select(col("p_name").as("name_a"), col("n_rows").as("n_a")), "name_a")
      .join(counts.select(col("p_name").as("name_b"), col("n_rows").as("n_b")), "name_b")
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }

  val qFuzzyJoinSql: String =
    """WITH counts AS (
      |  SELECT p_name, COUNT(*) AS n_rows FROM part GROUP BY p_name
      |), names AS (
      |  SELECT p_name, string_split(p_name, ' ')[2] AS noun FROM counts
      |)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
      |  ca.n_rows AS n_a, cb.n_rows AS n_b
      |FROM names a
      |JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
      |JOIN counts ca ON ca.p_name = a.p_name
      |JOIN counts cb ON cb.p_name = b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin

  // ---- q_full_outer: full outer join of two aggregates -----------------
  /** FULL OUTER join of two independently aggregated sides (high-value
    * BUILDING customers vs high-balance suppliers, per nation): rows
    * surviving on either side alone keep zeros for the other, and a
    * presence tag records which side matched. The dim attach after the
    * outer join is a broadcast on the coalesced key (an FK into
    * nation, so it preserves every row). */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val supp = Tables.supplier(s, dir)
      .filter(col("s_acctbal") > 8000)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    val nation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("nationkey"), col("n_name"))
    cust.join(supp, Seq("nationkey"), "full_outer")
      .withColumn("presence",
        when(col("n_cust").isNotNull && col("n_supp").isNotNull, "both")
          .when(col("n_cust").isNotNull, "cust_only")
          .otherwise("supp_only"))
      .join(broadcast(nation), "nationkey")
      .select(col("n_name"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        col("presence"))
  }

  val qFullOuterSql: String =
    """WITH cust AS (
      |  SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
      |  FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 8000
      |  GROUP BY c_nationkey
      |), supp AS (
      |  SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
      |  FROM supplier WHERE s_acctbal > 8000
      |  GROUP BY s_nationkey
      |)
      |SELECT n.n_name,
      |  COALESCE(c.n_cust, 0) AS n_cust,
      |  COALESCE(s.n_supp, 0) AS n_supp,
      |  CASE WHEN c.nationkey IS NOT NULL AND s.nationkey IS NOT NULL THEN 'both'
      |       WHEN c.nationkey IS NOT NULL THEN 'cust_only'
      |       ELSE 'supp_only' END AS presence
      |FROM cust c FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
      |JOIN nation n ON n.n_nationkey = COALESCE(c.nationkey, s.nationkey)""".stripMargin

  // ---- q_retention: cohort retention matrix over events ----------------
  /** Classic cohort retention: users are cohorted by first-activity
    * date; for each (cohort, day-offset) cell, the count and fraction
    * of the cohort active that day. Three grouped aggregations and
    * one dimension-sized join (cohort table is user-cardinality, the
    * output is days × offsets) — every shuffle is keyed, nothing
    * windows globally, so the shape is flat at any event volume. */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohort = activity.groupBy("user_id").agg(min(col("d")).as("cohort_d"))
    // cohort has one row per user by construction — a plain count is
    // the same value without a second distinct-aggregate pass
    val cohortSize = cohort.groupBy("cohort_d")
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_d")))
      .groupBy(col("cohort_d"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(cohortSize, "cohort_d")
      .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_date"),
        col("day_offset"), col("n_active"), col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention_rate"))
  }

  val qRetentionSql: String =
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |c AS (SELECT user_id, MIN(d) AS cohort_d FROM a GROUP BY 1),
      |cs AS (SELECT cohort_d, COUNT(DISTINCT user_id) AS cohort_size FROM c GROUP BY 1),
      |r AS (
      |  SELECT c.cohort_d,
      |    CAST(date_diff('day', c.cohort_d, a.d) AS INT) AS day_offset,
      |    COUNT(DISTINCT a.user_id) AS n_active
      |  FROM a JOIN c USING (user_id) GROUP BY 1, 2
      |)
      |SELECT strftime(r.cohort_d, '%Y-%m-%d') AS cohort_date, r.day_offset,
      |  r.n_active, cs.cohort_size,
      |  CAST(r.n_active AS DOUBLE) / CAST(cs.cohort_size AS DOUBLE) AS retention_rate
      |FROM r JOIN cs USING (cohort_d)""".stripMargin

  // ---- q_funnel: ordered event funnel within a time window -------------
  /** Conversion-funnel depth (the windowFunnel verb): per user, the
    * deepest prefix of view → click → purchase completed with the
    * click and purchase both inside [[FunnelWindowUs]] of the view,
    * each step strictly after the previous. Two window passes over
    * user-partitioned event time — no self-join, nothing quadratic:
    *   pass 1 (ROWS following, total order (us, event_id)): each
    *     event's earliest strictly-later purchase timestamp;
    *   pass 2 (RANGE (us, us+T]): per view, the earliest
    *     purchase-after-a-click over clicks in the window — if that
    *     lands inside the window the chain closed.
    * "After" is the (us, event_id) lexicographic order on ties,
    * identical in both engines, so the result is deterministic. */
  private val FunnelWindowUs = 24L * 3600L * 1000000L

  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val wRows = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val wRange = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(1L, FunnelWindowUs)
    val staged = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("fp_after",
        min(when(col("event_type") === "purchase", col("us"))).over(wRows))
      .withColumn("click_in_w",
        min(when(col("event_type") === "click", col("us"))).over(wRange))
      .withColumn("chain_p",
        min(when(col("event_type") === "click", col("fp_after"))).over(wRange))
    staged.filter(col("event_type") === "view")
      .select(col("user_id"),
        when(col("chain_p") <= col("us") + FunnelWindowUs, 3)
          .when(col("click_in_w").isNotNull, 2)
          .otherwise(1).as("depth"))
      .groupBy("user_id")
      .agg(max(col("depth")).as("funnel_depth"),
        sum(when(col("depth") === 3, 1L).otherwise(0L)).as("n_full_chains"))
  }

  val qFunnelSql: String =
    s"""WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
      |), staged AS (
      |  SELECT user_id, event_id, event_type, us,
      |    min(CASE WHEN event_type = 'purchase' THEN us END) OVER (
      |      PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fp_after
      |  FROM e
      |), scoped AS (
      |  SELECT user_id, event_type, us,
      |    min(CASE WHEN event_type = 'click' THEN us END) OVER w AS click_in_w,
      |    min(CASE WHEN event_type = 'click' THEN fp_after END) OVER w AS chain_p
      |  FROM staged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us
      |    RANGE BETWEEN 1 FOLLOWING AND $FunnelWindowUs FOLLOWING)
      |)
      |SELECT user_id, MAX(depth) AS funnel_depth,
      |  CAST(SUM(CASE WHEN depth = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_chains
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN chain_p <= us + $FunnelWindowUs THEN 3
      |         WHEN click_in_w IS NOT NULL THEN 2 ELSE 1 END AS depth
      |  FROM scoped WHERE event_type = 'view'
      |) GROUP BY user_id""".stripMargin

  // ---- q_skyline: Pareto frontier (skyline query) ----------------------
  /** The skyline operator (Börzsönyi et al., ICDE 2001): orders on
    * the Pareto frontier of (price ↓, order date ↓) — no other order
    * is at-most-equal on both axes and strictly better on one.
    * Exact duplicates merge first (a keyed agg emitting n_orders), so
    * the remaining points form a total order and the classic x-sorted
    * scan applies: a point survives iff its date is STRICTLY below
    * the minimum date of every preceding point in (price, date)
    * order. That global running minimum is the scale trap — Spark
    * plans it as ONE sorted task — so it rides
    * [[PrefixSum.runningMinExclusive]]: range-partition, #partitions
    * partial minima to the driver, broadcast exclusive prefix-min
    * offsets, PARTITIONED exclusive window. Oracled against DuckDB's
    * single-window formulation (fine at oracle scale, never shipped). */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.orders(s, dir)
      .groupBy(col("o_totalprice"), to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("dday", datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
    PrefixSum.runningMinExclusive(pts,
        Seq(col("o_totalprice").asc, col("dday").asc), "dday", "min_prev_day")
      .filter(col("min_prev_day").isNull || col("dday") < col("min_prev_day"))
      .select(col("o_totalprice").as("price"),
        date_format(col("d"), "yyyy-MM-dd").as("order_date"),
        col("n_orders"))
  }

  val qSkylineSql: String =
    """WITH p AS (
      |  SELECT o_totalprice AS price, CAST(o_orderdate AS DATE) AS d FROM orders
      |), g AS (
      |  SELECT price, d, CAST(COUNT(*) AS BIGINT) AS n_orders FROM p GROUP BY 1, 2
      |), s AS (
      |  SELECT price, d, n_orders,
      |    min(d) OVER (ORDER BY price, d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
      |  FROM g
      |)
      |SELECT price, strftime(d, '%Y-%m-%d') AS order_date, n_orders
      |FROM s WHERE mp IS NULL OR d < mp""".stripMargin

  // ---- q_scd2: slowly-changing-dimension type-2 intervals --------------
  /** SCD2 interval construction — the warehouse verb that turns an
    * event CHANGELOG into validity intervals ("what was each user's
    * state at time T"): per user, each event opens an interval at its
    * timestamp that the NEXT event closes (lead over the per-user
    * order); the open interval carries the -1 sentinel and the
    * is_current flag. Timestamps surface as epoch micros so the whole
    * operator is integer arithmetic. One PARTITIONED window (user-
    * keyed, spread like every window in this file); an as-of lookup
    * downstream becomes `valid_from <= T < valid_to` — the q_asof
    * complement from the build side. */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("valid_from_us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("valid_from_us"))
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(w), lit(-1L)))
      .withColumn("is_current", col("valid_to_us") === -1L)
  }

  val qScd2Sql: String =
    """SELECT user_id, event_id, event_type, valid_from_us,
      |  COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id
      |    ORDER BY valid_from_us, event_id), -1) AS valid_to_us,
      |  COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id
      |    ORDER BY valid_from_us, event_id), -1) = -1 AS is_current
      |FROM (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS valid_from_us
      |  FROM events
      |)""".stripMargin

  // ---- q_recursive: hierarchy closure via pointer doubling -------------
  /** Recursive-CTE semantics (the `WITH RECURSIVE` ancestor closure
    * every warehouse engine ships and Spark SQL lacks): resolve each
    * node of a forest to its ROOT ancestor and DEPTH. The hierarchy
    * derives deterministically from the customer table — parent(v) =
    * (v − R) div F for v ≥ R, nodes below R are roots — so both
    * engines build the identical forest with no synthetic input.
    *
    * The Spark plan is POINTER DOUBLING, not depth-step iteration:
    * each round joins the state table with itself on the current
    * ancestor pointer (anc ← anc∘anc, depth additive), so a
    * depth-D hierarchy resolves in ⌈log₂ D⌉ self-joins instead of
    * D semi-naive passes — at 100 TB a 30-deep corporate hierarchy
    * costs 5 shuffles, not 30. Roots are fixpoints (anc = v,
    * d = 0), so the join never loses rows; convergence is detected
    * by the total-depth sum going stationary (1-row agg per round),
    * and rounds are eagerly checkpointed + freed on exit
    * ([[CheckpointScope]] — the pagerank lifecycle).
    *
    * Oracle: DuckDB evaluates the same closure with a genuine
    * `WITH RECURSIVE` — integer end-to-end, exact hash compare. */
  private[operators] val RecRoots = 3L
  private[operators] val RecFanout = 8L

  def qRecursive(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.customer(s, dir).select(col("c_custkey").as("v"))
    val result = CheckpointScope.scoped(s) { ck =>
      var st = ck(nodes.select(col("v"),
        when(col("v") < RecRoots, col("v"))
          .otherwise(expr(s"(v - $RecRoots) div $RecFanout")).as("anc"),
        when(col("v") < RecRoots, lit(0L)).otherwise(lit(1L)).as("d")))
      var total = -1L
      var converged = false
      while (!converged) {
        val hop = st.select(col("v").as("anc"), col("anc").as("anc2"),
          col("d").as("d2"))
        val next = ck(st.join(hop, "anc")
          .select(col("v"), col("anc2").as("anc"), (col("d") + col("d2")).as("d")))
        val sumD = next.agg(sum("d")).first().getLong(0)
        converged = sumD == total
        total = sumD
        st = next
      }
      // materialized OUTSIDE ck: node-sized result survives the
      // scope's round-block cleanup
      st.select(col("v").as("custkey"), col("anc").as("root"),
        col("d").as("depth")).localCheckpoint(true)
    }
    result
  }

  val qRecursiveSql: String =
    s"""WITH RECURSIVE h AS (
      |  SELECT c_custkey AS v, c_custkey AS root, CAST(0 AS BIGINT) AS depth
      |  FROM customer WHERE c_custkey < $RecRoots
      |  UNION ALL
      |  SELECT c.c_custkey, h.root, h.depth + 1
      |  FROM customer c JOIN h ON (c.c_custkey - $RecRoots) // $RecFanout = h.v
      |  WHERE c.c_custkey >= $RecRoots
      |)
      |SELECT v AS custkey, root, depth FROM h""".stripMargin

  // ---- q_interval_merge: coalesce overlapping validity intervals -------
  /** Interval coalescing (the warehouse "merge overlapping periods"
    * verb — distinct from q_sessionize, which islands POINTS by gap;
    * here the inputs are INTERVALS with ends, and two intervals merge
    * iff they overlap or touch). Each event opens a 30-minute
    * validity interval; per user, overlapping-or-adjacent intervals
    * collapse to one row with the merged span and member count.
    * The classic two-window formulation: running max of prior ends
    * (ROWS to -1), an island increments where start > that max, then
    * one grouped agg per (user, island). Both windows share the
    * single user_id partition — ONE shuffle, integer micros
    * end-to-end, exact oracle. */
  private[operators] val IvLenUs = 1800000000L // 30 min

  def qIntervalMerge(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("start_us"), col("end_us"), col("event_id"))
    val iv = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("start_us"))
      .withColumn("end_us", col("start_us") + lit(IvLenUs))
      .withColumn("prev_max_end",
        max("end_us").over(w.rowsBetween(Window.unboundedPreceding, -1)))
    iv.withColumn("island",
        sum(when(col("prev_max_end").isNull ||
          col("start_us") > col("prev_max_end"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min("start_us").as("start_us"), max("end_us").as("end_us"),
        count(lit(1)).as("n_merged"))
  }

  val qIntervalMergeSql: String =
    s"""WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS start_us,
      |    epoch_us(ts) + $IvLenUs AS end_us
      |  FROM events
      |), pm AS (
      |  SELECT *, max(end_us) OVER (PARTITION BY user_id
      |    ORDER BY start_us, end_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
      |  FROM iv
      |), isl AS (
      |  SELECT *, CAST(SUM(CASE WHEN prev_max_end IS NULL
      |      OR start_us > prev_max_end THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY start_us, end_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
      |  FROM pm
      |)
      |SELECT user_id, island, MIN(start_us) AS start_us, MAX(end_us) AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_merged
      |FROM isl GROUP BY user_id, island""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interval_merge" -> (qIntervalMerge _),
    "q_recursive" -> (qRecursive _),
    "q_scd2" -> (qScd2 _),
    "q_skyline" -> (qSkyline _),
    "q_retention" -> (qRetention _),
    "q_funnel" -> (qFunnel _),
    "q_moving_avg" -> (qMovingAvg _),
    "q_cube" -> (qCube _),
    "q_string_agg" -> (qStringAgg _),
    "q_group_topk" -> (qGroupTopK _),
    "q_setops" -> (qSetOps _),
    "q_having" -> (qHaving _),
    "q_ntile" -> (qNtile _),
    "q_outer_join" -> (qOuterJoin _),
    "q_gap_fill" -> (qGapFill _),
    "q_histogram" -> (qHistogram _),
    "q_stats" -> (qStats _),
    "q_skew_salted" -> (qSkewSalted _),
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_full_outer" -> (qFullOuter _),
    "q_histogram_eqdepth" -> (qHistogramEqdepth _),
    "q_window_range" -> (qWindowRange _),
    "q_anomaly" -> (qAnomaly _),
    "q_multi_distinct" -> (qMultiDistinct _),
    "q_grouping_sets" -> (qGroupingSets _),
    "profile_table" -> (profileTable _),
    "q_percent_rank" -> (qPercentRank _))

  val oracle: Map[String, String] = Map(
    "q_interval_merge" -> qIntervalMergeSql,
    "q_recursive" -> qRecursiveSql,
    "q_scd2" -> qScd2Sql,
    "q_skyline" -> qSkylineSql,
    "q_retention" -> qRetentionSql,
    "q_funnel" -> qFunnelSql,
    "q_moving_avg" -> qMovingAvgSql,
    "q_cube" -> qCubeSql,
    "q_string_agg" -> qStringAggSql,
    "q_group_topk" -> qGroupTopKSql,
    "q_setops" -> qSetOpsSql,
    "q_having" -> qHavingSql,
    "q_ntile" -> qNtileSql,
    "q_outer_join" -> qOuterJoinSql,
    "q_gap_fill" -> qGapFillSql,
    "q_histogram" -> qHistogramSql,
    "q_stats" -> qStatsSql,
    "q_skew_salted" -> qSkewSaltedSql,
    "q_fuzzy_join" -> qFuzzyJoinSql,
    "q_full_outer" -> qFullOuterSql,
    "q_histogram_eqdepth" -> qHistogramEqdepthSql,
    "q_window_range" -> qWindowRangeSql,
    "q_anomaly" -> qAnomalySql,
    "q_multi_distinct" -> qMultiDistinctSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "profile_table" -> profileTableSql,
    "q_percent_rank" -> qPercentRankSql)
}
