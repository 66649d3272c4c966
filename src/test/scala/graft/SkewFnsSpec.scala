package graft

import org.apache.spark.sql.functions._

import graft.functions.SkewFns

class SkewFnsSpec extends SparkSpec {

  test("saltedJoin equals the plain join result") {
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"))
    val small = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = l.join(small, "l_suppkey")
      .select("l_orderkey", "l_linenumber", "s_name")
    val salted = SkewFns.saltedJoin(l, small, "l_suppkey",
        concat_ws("/", col("l_orderkey"), col("l_linenumber")), 8)
      .select("l_orderkey", "l_linenumber", "s_name")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedCount equals plain groupBy count") {
    val e = Tables.events(spark, sfDir)
    val plain = e.groupBy("event_type").agg(count(lit(1)).as("n"))
    val salted = SkewFns.saltedCount(e, "event_type", col("event_id"), 16)
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
