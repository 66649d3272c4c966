package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.E): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata; the
  * expensive decode/feature step runs batched per partition.
  *
  * The image COLUMN is synthesized (this environment ships no image
  * files — pixels derive deterministically from content digests), but
  * the decode is REAL: payloads are genuine 24-bit BMP files and
  * [[graft.functions.ImageCodec]] parses the actual format (headers,
  * BGR order, bottom-up rows, row padding). Schema, binary column
  * handling, partition-batched iteration and the feature output shape
  * are exactly what a production decode stage uses.
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

  // ---- mm_features: partition-batched REAL decode + feature extraction -
  /** One row of decoded image features: geometry, encoded size, per-
    * channel sums and a 4-bin intensity histogram over all pixel
    * bytes — the t_extract shape (decode → segment geometry → channel
    * features, ferret-pthreads.c:514) reduced to scalars a columnar
    * sink (and the DuckDB oracle) can compare directly. */
  case class MMFeature(doc_id: Long, width: Int, height: Int, bmp_bytes: Int,
                       r_sum: Long, g_sum: Long, b_sum: Long,
                       hist_0: Long, hist_1: Long, hist_2: Long, hist_3: Long)

  /** The image column is SYNTHESIZED (no image files in this sandbox):
    * a doc's payload is a genuine 24-bit BMP whose geometry derives
    * from (doc_id, byte length) and whose pixels cycle the content's
    * SHA-256 bytes — fully deterministic, so the oracle recomputes
    * every feature from the documents table alone. The DECODER is not
    * synthesized: [[graft.functions.ImageCodec.decodeBmp]] parses the
    * little-endian headers, BGR order, bottom-up rows and 4-byte row
    * padding of the real format, and every emitted feature is computed
    * from the decoder's output, never from the synthesis inputs. */
  private def synthesizeBmp(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val width = (2 + (docId % 6)).toInt
    val height = (2 + (payload.length % 5)).toInt
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    val rgb = Array.tabulate(width * height * 3)(i => digest(i % 32))
    graft.functions.ImageCodec.encodeBmp(
      graft.functions.ImageCodec.Image(width, height, rgb))
  }

  private def extractFeatures(docId: Long, bmp: Array[Byte]): MMFeature = {
    val img = graft.functions.ImageCodec.decodeBmp(bmp)
    var r = 0L; var g = 0L; var b = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < img.rgb.length) {
      val v = img.rgb(i) & 0xff
      (i % 3) match {
        case 0 => r += v
        case 1 => g += v
        case _ => b += v
      }
      hist(v >> 6) += 1
      i += 1
    }
    MMFeature(docId, img.width, img.height, bmp.length,
      r, g, b, hist(0), hist(1), hist(2), hist(3))
  }

  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      // one iterator per partition: the decoder (re)initializes once
      // per batch, exactly like a mapInPandas/Arrow batch boundary
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          extractFeatures(id, synthesizeBmp(id, payload))
        }
      }
      .toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_features" -> (mmFeatures _))

  /** Every mm_features column recomputed independently by DuckDB:
    * geometry from (doc_id, octet_length), the BMP's encoded size from
    * the format's row-padding rule, and the channel sums / intensity
    * histogram by re-deriving the pixel bytes from the hex digest — a
    * cross-engine proof that the real encode→decode round trip
    * preserves every pixel (any decoder bug in padding, BGR order or
    * bottom-up rows would shift bytes between channels and break the
    * sums). */
  val mmFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id, octet_length(encode(text)) AS nb, sha256(text) AS h
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, CAST(2 + doc_id % 6 AS INT) AS width,
      |    CAST(2 + nb % 5 AS INT) AS height, h
      |  FROM m
      |), px AS (
      |  SELECT doc_id, width, height,
      |    list_transform(range(0, width*height*3), i ->
      |      (strpos('0123456789abcdef', substr(h, 2*(i % 32) + 1, 1)) - 1) * 16
      |        + strpos('0123456789abcdef', substr(h, 2*(i % 32) + 2, 1)) - 1) AS p
      |  FROM g
      |)
      |SELECT doc_id, width, height,
      |  CAST(54 + ((3*width + 3) // 4) * 4 * height AS INT) AS bmp_bytes,
      |  CAST(list_sum(list_transform(range(0, width*height), k -> p[3*k + 1])) AS BIGINT) AS r_sum,
      |  CAST(list_sum(list_transform(range(0, width*height), k -> p[3*k + 2])) AS BIGINT) AS g_sum,
      |  CAST(list_sum(list_transform(range(0, width*height), k -> p[3*k + 3])) AS BIGINT) AS b_sum,
      |  CAST(len(list_filter(p, v -> v // 64 = 0)) AS BIGINT) AS hist_0,
      |  CAST(len(list_filter(p, v -> v // 64 = 1)) AS BIGINT) AS hist_1,
      |  CAST(len(list_filter(p, v -> v // 64 = 2)) AS BIGINT) AS hist_2,
      |  CAST(len(list_filter(p, v -> v // 64 = 3)) AS BIGINT) AS hist_3
      |FROM px""".stripMargin

  val oracle: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_features" -> mmFeaturesSql)
}
