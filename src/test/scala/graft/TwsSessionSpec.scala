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
}
