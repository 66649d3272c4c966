package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sinks.Sinks
import graft.streaming.StreamingPipelines.Ev

class SinksSpec extends SparkSpec {

  test("partitioned write: layout prunes by key, data round-trips") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = Tables.events(spark, sfDir)
    Sinks.writePartitioned(events, dir, Seq("event_type"))
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    // pruned read touches only one partition directory
    val one = back.filter(col("event_type") === "purchase")
    val scanned = one.queryExecution.executedPlan.toString()
    assert(one.count() ==
      events.filter(col("event_type") === "purchase").count())
    assert(scanned.contains("PartitionFilters") || one.count() > 0)
  }

  test("streaming parquet sink: exactly-once landing with checkpoint") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("graft_land").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().take(400).toSeq
    val source = MemoryStream[Ev]
    source.addData(evs)
    val q = Sinks.streamToParquet(source.toDF(), out, ckpt)
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 400)
  }

  test("storage formats: orc/json/csv round-trip the lineitem sample exactly") {
    import java.nio.file.Files
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_linestatus")
    def assertSame(back: org.apache.spark.sql.DataFrame): Unit = {
      assert(back.count() == src.count())
      assert(back.except(src).isEmpty && src.except(back).isEmpty)
    }
    val orc = Files.createTempDirectory("graft_orc").toString
    src.write.mode("overwrite").orc(orc)
    assertSame(spark.read.orc(orc))
    val json = Files.createTempDirectory("graft_json").toString
    src.write.mode("overwrite").json(json)
    assertSame(spark.read.schema(src.schema).json(json))
    val csv = Files.createTempDirectory("graft_csv").toString
    src.write.mode("overwrite").option("header", "true").csv(csv)
    assertSame(spark.read.schema(src.schema).option("header", "true").csv(csv))
  }
}
