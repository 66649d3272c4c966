package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{Relational, StreamingOps}
import graft.streaming.StreamingPipelines
import graft.streaming.StreamingPipelines.Ev

class StreamingSpec extends SparkSpec {

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
  }

  test("streaming windowAgg matches batch q_events_window totals") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.windowAgg(source.toDF())
      .writeStream.format("memory").queryName("wa_sink")
      .outputMode(OutputMode.Update()).start()
    evs.grouped(300).foreach(source.addData(_))
    q.processAllAvailable()
    // Update mode: latest row per (window, event_type) is the final agg
    val sink = spark.table("wa_sink")
      .groupBy("window", "event_type").agg(last("n_events").as("n_events"))
    val streamTotal = sink.agg(sum("n_events")).collect().head.getLong(0)
    q.stop()
    assert(streamTotal == evs.size.toLong)
    val batchGroups = Relational.qEventsWindow(spark, sfDir).count()
    assert(sink.count() == batchGroups)
  }

  test("streaming dedup emits one row per (user_id, event_type) key") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.dedupStream(source.toDF())
      .writeStream.format("memory").queryName("dd_sink")
      .outputMode(OutputMode.Append()).start()
    evs.grouped(300).foreach(source.addData(_))
    q.processAllAvailable()
    val sinkKeys = spark.table("dd_sink").select("user_id", "event_type").distinct().count()
    val sinkRows = spark.table("dd_sink").count()
    q.stop()
    val batchKeys = StreamingOps.streamDedupBatch(spark, sfDir).count()
    assert(sinkRows == sinkKeys, "dedup emitted a duplicate key")
    assert(sinkKeys == batchKeys)
  }

  test("streaming sessionize matches batch qSessionize") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = loadEvents()
    // sentinel far in the future pushes the watermark past every
    // session's gap horizon so all real sessions close
    val lastTs = evs.last.ts.getTime
    val sentinel = Ev(-1L, new Timestamp(lastTs + 86400000L), -999L, "sentinel", 0.0)
    val source = MemoryStream[Ev]
    val q = StreamingPipelines.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append()).start()
    evs.grouped(300).foreach(source.addData(_))
    source.addData(Seq(sentinel))
    q.processAllAvailable()
    val streamed = spark.table("sess_sink")
      .filter(col("user_id") =!= -999L)
      .select("user_id", "sess_id", "n_events", "start_us", "end_us")
    val batch = Relational.qSessionize(spark, sfDir)
      .select("user_id", "sess_id", "n_events", "start_us", "end_us")
    val onlyStream = streamed.exceptAll(batch).count()
    val onlyBatch = batch.exceptAll(streamed).count()
    q.stop()
    assert(onlyStream == 0 && onlyBatch == 0,
      s"session mismatch: $onlyStream stream-only, $onlyBatch batch-only")
  }

  test("throughput harness returns sane metrics") {
    val evs = loadEvents().take(600)
    val r = StreamingPipelines.throughputBench(spark, evs, 200, "spec",
      StreamingPipelines.windowAgg)
    assert(r.rows_in == 600 && r.batches == 3)
    assert(r.rows_per_sec > 0 && r.rows_out > 0)
  }
}
