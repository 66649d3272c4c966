package graft

import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {

  private def check(rows: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("id", "key", "w")
    val got = PrefixSum.runningSum(df,
        Seq(col("key"), col("id")), "w", "cum")
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.sortBy(r => (r._2, r._1))
      .scanLeft((0L, 0L)) { case ((_, acc), (id, _, w)) => (id, acc + w) }
      .drop(1).toMap
    assert(got == expected, s"prefix sum diverged for ${rows.take(5)}...")
  }

  test("random weights over random keys: matches an in-memory scan") {
    val rnd = new scala.util.Random(42)
    // several shapes: uniform keys, heavy key ties, all-equal keys
    check((1L to 500L).map(i => (i, rnd.nextLong(), rnd.nextInt(100).toLong)))
    check((1L to 300L).map(i => (i, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(10).toLong)))
    check((1L to 100L).map(i => (i, 7L, rnd.nextInt(1000).toLong)))
  }

  test("edge cases: empty input, single row, zero weights") {
    import spark.implicits._
    val empty = PrefixSum.runningSum(
      Seq.empty[(Long, Long, Long)].toDF("id", "key", "w"),
      Seq(col("key"), col("id")), "w", "cum")
    assert(empty.count() == 0)
    check(Seq((1L, 0L, 5L)))
    check((1L to 50L).map(i => (i, i, 0L)))
  }

  test("null weights follow the documented contract (null = 0 for offsets)") {
    import spark.implicits._
    // an ALL-NULL weight run used to NPE the partial-sum collect; the
    // contract is coalesce(sum,0) per partition, nulls skipped in the
    // window (SQL sum semantics)
    val df = Seq((1L, 1L, Some(3L)), (2L, 2L, None), (3L, 3L, None),
      (4L, 4L, Some(2L))).toDF("id", "key", "w")
    val (got, total) = PrefixSum.runningSumWithTotal(df,
      Seq(col("key"), col("id")), "w", "cum")
    assert(total == 5L)
    val byId = got.select("id", "cum").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byId(1L).contains(3L))
    assert(byId(4L).contains(5L))
    // null-weight rows carry a null cumsum (sum over an all-null
    // window frame) — they don't break neighbors' offsets
    val allNull = Seq((1L, 1L, None: Option[Long]), (2L, 2L, None))
      .toDF("id", "key", "w")
    val (gotNull, totalNull) = PrefixSum.runningSumWithTotal(allNull,
      Seq(col("key"), col("id")), "w", "cum")
    assert(totalNull == 0L)
    assert(gotNull.count() == 2)
  }

  private def checkMin(rows: Seq[(Long, Long, Long)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("id", "key", "v")
    val got = PrefixSum.runningMinExclusive(df,
        Seq(col("key"), col("id")), "v", "mn")
      .select("id", "mn").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val sorted = rows.sortBy(r => (r._2, r._1))
    val expected = sorted.zipWithIndex.map { case ((id, _, _), i) =>
      val prev = sorted.take(i).map(_._3)
      id -> (if (prev.isEmpty) None else Some(prev.min))
    }.toMap
    assert(got == expected, s"exclusive running min diverged for ${rows.take(5)}...")
  }

  test("runningMinExclusive: matches an in-memory scan on random shapes") {
    val rnd = new scala.util.Random(1234)
    // uniform keys, heavy ties, all-equal keys, descending values,
    // min-at-front (every later row sees it)
    checkMin((1L to 500L).map(i => (i, rnd.nextLong(), rnd.nextInt(1000).toLong)))
    checkMin((1L to 300L).map(i => (i, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(50).toLong)))
    checkMin((1L to 100L).map(i => (i, 9L, rnd.nextInt(10).toLong)))
    checkMin((1L to 200L).map(i => (i, i, 1000L - i)))
    checkMin((1L to 200L).map(i => (i, i, if (i == 1) 0L else 500L + i)))
    // edge: single row has a null exclusive min
    checkMin(Seq((1L, 1L, 42L)))
  }

  test("runningSumKeyed: per-group prefix matches an in-memory scan, totals exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // few huge groups — the shape the keyed variant exists for
    val rows = (1L to 400L).map(i =>
      (i, s"g${rnd.nextInt(4)}", rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "grp", "w")
    val (got, totals) = PrefixSum.runningSumKeyed(df, Seq("grp"),
      Seq(col("id")), "w", "cum")
    val gotMap = got.select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(_._1).scanLeft((0L, 0L)) {
        case ((_, acc), (id, _, w)) => (id, acc + w)
      }.drop(1)
    }
    assert(gotMap == expected.toMap, "keyed prefix sum diverged")
    val totMap = totals.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expTot = rows.groupBy(_._2).map { case (k, g) => k -> g.map(_._3).sum }
    assert(totMap == expTot, "keyed totals diverged")
    // edge: empty input and a single group behave
    val (e, et) = PrefixSum.runningSumKeyed(
      Seq.empty[(Long, String, Long)].toDF("id", "grp", "w"), Seq("grp"),
      Seq(col("id")), "w", "cum")
    assert(e.count() == 0 && et.count() == 0)
    // a NULL group key is a real group (groupBy semantics) — the
    // offsets join must be null-safe or these rows silently vanish
    val withNull = Seq((1L, Some("a"), 2L), (2L, None, 3L), (3L, None, 4L),
      (4L, Some("a"), 5L)).toDF("id", "grp", "w")
    val (gn, tn) = PrefixSum.runningSumKeyed(withNull, Seq("grp"),
      Seq(col("id")), "w", "cum")
    val nm = gn.select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nm == Map(1L -> 2L, 2L -> 3L, 3L -> 7L, 4L -> 7L),
      s"null-group prefix wrong: $nm")
    val tnm = tn.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    assert(tnm == Map("a" -> 7L, (null: String) -> 7L))
  }
}
