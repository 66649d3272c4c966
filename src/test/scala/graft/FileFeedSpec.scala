package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Relational
import graft.streaming.StreamingPipelines
import graft.streaming.StreamingPipelines.Ev

/** The distributed replay feed (prepareFeed + file-source stream) must
  * deliver slices in event-time order — otherwise watermarked state
  * fragments sessions and the stream diverges from the batch mirror.
  * The subset check below is exact: every session the ordered stream
  * closes must be byte-identical to a batch-mirror session (only
  * sessions still open at end-of-stream may be missing).
  */
class FileFeedSpec extends SparkSpec {

  test("file-feed replay follows event time: streamed sessions ⊆ batch mirror") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val feed = StreamingPipelines.prepareFeed(spark, events, nSlices = 5)
    try {
      val sink = s"filefeed_sink_${System.nanoTime()}"
      val q = StreamingPipelines.sessionize(
          spark.readStream.schema(feed.schema).option("maxFilesPerTrigger", 1)
            .parquet(feed.path).as[Ev])
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable()
      val streamed = spark.table(sink)
        .select("user_id", "sess_id", "n_events", "start_us", "end_us")
      val batch = Relational.qSessionize(spark, sfDir)
        .select("user_id", "sess_id", "n_events", "start_us", "end_us")
      val extras = streamed.except(batch).count()
      q.stop()
      assert(extras == 0, s"$extras streamed sessions not in the batch mirror")
      val nStream = streamed.count()
      val nBatch = batch.count()
      assert(nStream >= nBatch / 2,
        s"only $nStream of $nBatch sessions closed — replay order suspect")
    } finally StreamingPipelines.deleteRecursively(new java.io.File(feed.path))
  }
}
