package graft

import org.apache.spark.sql.functions._

import graft.operators.Diagnostics

class DiagnosticsSpec extends SparkSpec {

  test("profile_skew: buckets partition the key space of both profiled tables") {
    val rows = Diagnostics.profileSkew(spark, sfDir).collect()
    val byProf = rows.groupBy(_.getAs[String]("profiled"))
    assert(byProf.keySet ==
      Set("events.user_id", "lineitem.l_orderkey"))
    val want = Map(
      "events.user_id" ->
        (Tables.events(spark, sfDir).count(),
          Tables.events(spark, sfDir).select("user_id").distinct().count()),
      "lineitem.l_orderkey" ->
        (Tables.lineitem(spark, sfDir).count(),
          Tables.lineitem(spark, sfDir).select("l_orderkey").distinct().count()))
    byProf.foreach { case (prof, rs) =>
      // rows and keys partition exactly across buckets
      assert(rs.map(_.getAs[Long]("n_rows")).sum == want(prof)._1, prof)
      assert(rs.map(_.getAs[Long]("n_keys")).sum == want(prof)._2, prof)
      rs.foreach { r =>
        val (b, lo, hi, mx) = (r.getAs[Int]("bucket"), r.getAs[Long]("lo"),
          r.getAs[Long]("hi"), r.getAs[Long]("max_key_rows"))
        assert(lo == (1L << b) && hi == (1L << (b + 1)) - 1)
        assert(mx >= lo && mx <= hi, s"max_key_rows outside bucket: $r")
        // bucket rows bounded by the bucket's own arithmetic
        val nk = r.getAs[Long]("n_keys")
        val nr = r.getAs[Long]("n_rows")
        assert(nr >= nk * lo && nr <= nk * hi, s"bucket row total impossible: $r")
      }
    }
  }

  test("q_skew_join: salted join result equals the plain-join formulation") {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.loadParallel(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val decV = col("value").cast(DecimalType(24, 10))
    val dim = ev.groupBy("event_type")
      .agg((sum(decV).cast("double") / count(lit(1)).cast("double"))
        .as("type_mean"))
    val plain = ev.join(dim, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > col("type_mean"), 1L).otherwise(0L))
          .as("n_above_mean"),
        max(abs(col("value") - col("type_mean"))).as("max_abs_dev"),
        max(col("type_mean")).as("type_mean"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Diagnostics.qSkewJoin(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("q_skew_join: the salted plan replicates the dim side, no broadcast of the fact") {
    val plan = Diagnostics.qSkewJoin(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    // the salt explode (sequence 0..salts-1) must reach the plan —
    // that's the mitigation under test
    assert(plan.contains("explode") || plan.contains("Expand") ||
      plan.contains("Generate"), s"no salt replication in plan:\n$plan")
  }

  test("profile_integrity: set identities hold against direct counts") {
    val r = Diagnostics.profileIntegrity(spark, sfDir).collect().head
    val docKeys = r.getAs[Long]("n_doc_keys"); val vecKeys = r.getAs[Long]("n_vec_keys")
    // matched + one-side-only partitions each key set exactly
    assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_doc_only") == docKeys)
    assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_vec_only") == vecKeys)
    assert(r.getAs[Long]("n_dup_doc_keys") ==
      r.getAs[Long]("n_doc_rows") - docKeys)
    assert(r.getAs[Long]("n_dup_vec_keys") ==
      r.getAs[Long]("n_vec_rows") - vecKeys)
    // direct recount of both sides
    assert(r.getAs[Long]("n_doc_rows") == Tables.documents(spark, sfDir).count())
    assert(r.getAs[Long]("n_vec_rows") == Tables.embeddings(spark, sfDir).count())
  }
}
