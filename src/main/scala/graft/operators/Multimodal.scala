package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.E): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata; the
  * expensive decode/feature step runs batched per partition.
  *
  * The decode itself is STUBBED deterministically (no image/audio
  * codecs in this environment — the stub derives "pixels" from the
  * payload's SHA-256 bytes), but the Spark-side contract is real:
  * schema, binary column handling, partition-batched iteration, and
  * the feature-vector output shape are exactly what a production
  * decode stage would use.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, Tables.documents(s, dir))

  // ---- mm_meta: binary payload + typed metadata (oracled) --------------
  def mmMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
      sha2(encode(col("text"), "UTF-8"), 256).as("payload_sha"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      ((col("doc_id") * 2654435761L) % 4096).as("fake_width"),
      ((col("doc_id") * 40503L) % 2160).as("fake_height"))

  val mmMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS payload_sha,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS modality,
      |  (doc_id * 2654435761) % 4096 AS fake_width,
      |  (doc_id * 40503) % 2160 AS fake_height
      |FROM documents""".stripMargin

  // ---- mm_features: partition-batched decode + feature extraction ------
  /** Array-valued intermediates (frame indices, feature vector) are
    * reduced to scalar digests in the emitted row: the downstream
    * verify harness (and any columnar sink) compares scalars, and the
    * full vectors stay available inside the pipeline stage where a
    * real consumer (ANN index, classifier) would read them. */
  case class MMFeature(doc_id: Long, n_bytes: Int, n_frames: Int,
                       sampled_frames: String, features_sha: String,
                       feat_sum: Double)

  /** Deterministic stand-in for a real decoder: "frames" are 128-byte
    * windows of the payload; the 16-dim feature vector comes from the
    * payload digest (one byte per dim, scaled to [0,1]). A real
    * deployment swaps `decodeStub` for an image/audio codec — the
    * partition-batched plumbing is unchanged.
    *
    * The emitted digests are over the QUANTIZED feature bytes (the
    * digest prefix itself), so every output column is independently
    * recomputable by the DuckDB oracle — this row carries a full
    * cross-engine check, not a rows-only one. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MMFeature = {
    val nFrames = payload.length / 128 + 1
    // uniform frame sampling, at most 4 frames
    val step = math.max(1, nFrames / 4)
    val sampled = (0 until nFrames by step).take(4)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val digest = md.digest(payload)
    val quantized = digest.take(16)
    // the in-pipeline feature vector a downstream consumer would read
    val features = quantized.map(b => (b & 0xff) / 255.0f)
    require(features.length == 16)
    // fingerprint of the hex form (the oracle's sha256 is VARCHAR-only)
    val hexPrefix = quantized.map("%02x".format(_)).mkString
    val featSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(hexPrefix.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // exact rational sum (k/255 each) → one final double rounding
    val featSum = quantized.map(_ & 0xff).map(_.toLong).sum / 255.0
    MMFeature(docId, payload.length, nFrames, sampled.mkString(","),
      featSha, featSum)
  }

  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      // one iterator per partition: the decoder (re)initializes once
      // per batch, exactly like a mapInPandas/Arrow batch boundary
      .mapPartitions { it => it.map { case (id, payload) => decodeStub(id, payload) } }
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_features" -> (mmFeatures _))

  /** Every mm_features column recomputed independently by DuckDB:
    * frame geometry from octet_length, the feature digest as
    * sha256(first 16 digest bytes), and feat_sum by parsing the hex
    * digest — a cross-engine proof of the full decode-stub contract. */
  val mmFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |    sha256(text) AS h
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, n_bytes, CAST(n_bytes // 128 + 1 AS INT) AS n_frames, h FROM m
      |)
      |SELECT doc_id, n_bytes, n_frames,
      |  array_to_string(list_slice(range(0, n_frames, greatest(1, n_frames // 4)), 1, 4), ',') AS sampled_frames,
      |  sha256(substr(h, 1, 32)) AS features_sha,
      |  CAST(list_sum(list_transform(range(0, 16), i ->
      |    (strpos('0123456789abcdef', substr(h, 2*i + 1, 1)) - 1) * 16
      |      + strpos('0123456789abcdef', substr(h, 2*i + 2, 1)) - 1)) AS DOUBLE) / 255.0 AS feat_sum
      |FROM f""".stripMargin

  val oracle: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_features" -> mmFeaturesSql)
}
