package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Relational
import graft.streaming.{StreamingPipelines, TwsSessionize}
import graft.streaming.StreamingPipelines.Ev

class TwsSessionSpec extends SparkSpec {

  test("transformWithState sessionize matches batch qSessionize") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
      val lastTs = evs.last.ts.getTime
      val sentinel = Ev(-1L, new Timestamp(lastTs + 86400000L), -999L, "sentinel", 0.0)
      val source = MemoryStream[Ev]
      val q = TwsSessionize(source.toDS())
        .writeStream.format("memory").queryName("tws_sink")
        .outputMode(OutputMode.Append()).start()
      evs.grouped(300).foreach(source.addData(_))
      source.addData(Seq(sentinel))
      q.processAllAvailable()
      val streamed = spark.table("tws_sink")
        .filter(col("user_id") =!= -999L)
        .select("user_id", "sess_id", "n_events", "start_us", "end_us")
      val batch = Relational.qSessionize(spark, sfDir)
        .select("user_id", "sess_id", "n_events", "start_us", "end_us")
      val onlyStream = streamed.exceptAll(batch).count()
      val onlyBatch = batch.exceptAll(streamed).count()
      q.stop()
      assert(onlyStream == 0 && onlyBatch == 0,
        s"session mismatch: $onlyStream stream-only, $onlyBatch batch-only")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState: sess_id numbering survives a mid-stream timeout") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1700000000000L // ms
      def ev(id: Long, user: Long, offsetMin: Long): Ev =
        Ev(id, new Timestamp(t0 + offsetMin * 60000L), user, "view", 1.0)
      val source = MemoryStream[Ev]
      val q = TwsSessionize(source.toDS())
        .writeStream.format("memory").queryName("tws_timeout_sink")
        .outputMode(OutputMode.Append()).start()
      // one processAllAvailable per addData forces real micro-batch
      // boundaries so the timer actually fires mid-stream
      source.addData(Seq(ev(1, 7001, 0), ev(2, 7002, 0))); q.processAllAvailable()
      source.addData(Seq(ev(3, 7002, 120))); q.processAllAvailable()
      // 7001 silent → its session 1 must close via the expired timer
      source.addData(Seq(ev(4, 7002, 180))); q.processAllAvailable()
      val afterTimeout = spark.table("tws_timeout_sink")
        .filter(col("user_id") === 7001L).count()
      assert(afterTimeout == 1, "session 1 must close via the timer path")
      // later event for 7001 → must continue numbering at session 2
      source.addData(Seq(ev(5, 7001, 240))); q.processAllAvailable()
      source.addData(Seq(ev(6, 7003, 1440))); q.processAllAvailable()
      val sess7001 = spark.table("tws_timeout_sink")
        .filter(col("user_id") === 7001L)
        .orderBy("sess_id").collect()
      q.stop()
      assert(sess7001.map(_.getAs[Long]("sess_id")).toSeq == Seq(1L, 2L),
        s"expected sessions 1,2 for user 7001, got ${sess7001.mkString(", ")}")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
