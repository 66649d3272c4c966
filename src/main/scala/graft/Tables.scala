package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned loaders for the driver-generated test tables
  * (TESTDATA.md). At cluster scale these would be catalog tables with
  * partition pruning; here each is one parquet file per scale factor.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The test tables ship as one single-row-group parquet file each,
    * so scans get exactly one input split no matter the config — every
    * downstream map stage would run single-threaded. Compute-bound
    * operators read through this helper: it fans the scan out to the
    * session's parallelism when (and only when) the source arrives
    * under-partitioned. On a real multi-file/bucketed layout the
    * condition is false and this is a no-op — filters still push into
    * the scan either way (Catalyst moves them through Repartition).
    */
  def parallel(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  def loadParallel(spark: SparkSession, dir: String, name: String): DataFrame =
    parallel(spark, load(spark, dir, name))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet's `ts` column has shipped under three physical
    * types across testdata regenerations: TIMESTAMP(NANOS) (read as
    * INT64 nanos via the legacy nanosAsLong conf, set in
    * Sessions.contract), TIMESTAMP[us], and TIMESTAMP_NTZ. A loader
    * pinned to any one of them breaks every events consumer the next
    * time the generator changes — round 9 lost 12 queries and 23
    * specs to exactly that — so branch on the LOADED schema and
    * normalize to session-zoned µs TIMESTAMP, the value DuckDB sees
    * for its µs TIMESTAMP, preserving oracle parity in all cases. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other; expected INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
