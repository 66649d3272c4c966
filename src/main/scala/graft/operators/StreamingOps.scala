package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamingPipelines
import graft.streaming.StreamingPipelines.Ev

/** Driver-facing entry points for the streaming family (SURVEY.md
  * §2.F): a DuckDB-oracled batch mirror of the streaming dedup, and
  * the throughput harness packaged as a query.
  */
object StreamingOps {

  // ---- stream_dedup_batch: deterministic mirror of dedupStream ---------
  /** First-event-per-key semantics, stated deterministically (MIN
    * event_id) so batch and oracle agree; the streaming twin keeps
    * whichever arrives first within the watermark. */
  def streamDedupBatch(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id", "event_type")
      .agg(min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_dupes"))

  val streamDedupBatchSql: String =
    """SELECT user_id, event_type, MIN(event_id) AS first_event_id,
      |  COUNT(*) AS n_dupes
      |FROM events GROUP BY user_id, event_type""".stripMargin

  // ---- stream_rate_bench: MemoryStream throughput measurement ----------
  /** Local measurement HARNESS, not a scale-path operator: MemoryStream
    * can only be fed from the driver, so the events table is collected
    * once (bounded by the bench SF — never run at production scale).
    * Production streams read from a distributed source (files/Kafka)
    * through the very same pipeline transforms, with no collect. */
  def streamRateBench(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val batchSize = math.max(2000, evs.size / 10)
    val results = Seq(
      StreamingPipelines.throughputBench(s, evs, batchSize, "window_agg",
        StreamingPipelines.windowAgg),
      StreamingPipelines.throughputBench(s, evs, batchSize, "dedup",
        StreamingPipelines.dedupStream),
      // stateful per-key sessionization — the reference's core
      // stream-parallelism characteristic (keyed state + event time)
      StreamingPipelines.throughputBench(s, evs, batchSize, "sessionize",
        df => {
          import s.implicits._
          StreamingPipelines.sessionize(df.as[Ev]).toDF()
        }, org.apache.spark.sql.streaming.OutputMode.Append()))
    s.createDataFrame(results)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_dedup_batch" -> (streamDedupBatch _),
    "stream_rate_bench" -> (streamRateBench _))

  val oracle: Map[String, String] = Map(
    "stream_dedup_batch" -> streamDedupBatchSql)
}
