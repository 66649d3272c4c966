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
    * payload digest. A real deployment swaps `decodeStub` for an
    * image/audio codec — the partition-batched plumbing is unchanged. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MMFeature = {
    val nFrames = payload.length / 128 + 1
    // uniform frame sampling, at most 4 frames
    val step = math.max(1, nFrames / 4)
    val sampled = (0 until nFrames by step).take(4)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val digest = md.digest(payload)
    val features = digest.take(16).map(b => (b & 0xff) / 255.0f)
    val featBytes = features.flatMap { f =>
      val bits = java.lang.Float.floatToIntBits(f)
      Array((bits >>> 24).toByte, (bits >>> 16).toByte,
        (bits >>> 8).toByte, bits.toByte)
    }
    val featSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(featBytes).map("%02x".format(_)).mkString
    // exact rational sum (k/255 each) rounded once → stable double
    val featSum = features.map(f => math.round(f * 255.0f).toLong).sum / 255.0
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

  val oracle: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql)
}
