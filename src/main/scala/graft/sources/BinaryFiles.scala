package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NativeChunk

/** Binary-file ingestion (SURVEY.md §2.B, reference input mode).
  *
  * The reference Dedup consumes arbitrary binary archives
  * (apps/dedup reads TAR files — README "the function that reads the
  * files only processes TAR files"); the Spark-native equivalent is
  * the built-in `binaryFile` source: one row per file with the
  * payload as a `binary` column, processed by the same Buzhash CDC
  * kernel as document text. Storage-style chunk parameters (2 KiB
  * min / ~8 KiB avg / 64 KiB max).
  */
object BinaryFiles {

  def readDir(spark: SparkSession, path: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Per-file chunk-level dedup accounting over every file in `dir` —
    * the reference Dedup pipeline applied to a directory of binaries.
    * Cross-file duplicate chunks are found with a hash groupBy (only
    * 32-byte digests shuffle, never chunk payloads). */
  def fileDedup(s: SparkSession, dir: String): DataFrame = {
    val files = readDir(s, dir, "*.parquet")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
        col("length").as("n_bytes"), col("content"))
    val chunks = files
      .repartition(s.sparkContext.defaultParallelism, col("file"))
      .select(col("file"), col("n_bytes"),
        NativeChunk.chunks(col("content"), minSize = 2048,
          maxSize = 65536, maskBits = 13))
      .select(col("file"), col("n_bytes"), col("chunk_sha"),
        col("length").as("chunk_len"))
    val refCounts = chunks.groupBy("chunk_sha")
      .agg(count(lit(1)).as("refs"))
    chunks.join(refCounts, "chunk_sha")
      .groupBy("file")
      .agg(first(col("n_bytes")).as("n_bytes"),
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_sha")).as("n_unique_chunks"),
        sum(when(col("refs") > 1, 1).otherwise(0)).as("n_shared_chunks"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "file_dedup" -> (fileDedup _))

  val oracle: Map[String, String] = Map.empty
}
