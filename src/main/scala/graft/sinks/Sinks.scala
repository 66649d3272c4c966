package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Output paths (SURVEY.md §4): partition-pruned batch layout and the
  * checkpointed streaming parquet sink. At 100 TB the partition keys
  * are the downstream read predicates (date, source, modality) —
  * partitionBy turns them into directory pruning instead of scans.
  */
object Sinks {

  /** Hive-style partitioned parquet layout. */
  def writePartitioned(df: DataFrame, path: String, keys: Seq[String]): Unit =
    df.write.partitionBy(keys: _*).mode("overwrite").parquet(path)

  /** Exactly-once streaming parquet sink (checkpointed WAL + file
    * manifest — the production landing zone for a cleaned stream). */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
