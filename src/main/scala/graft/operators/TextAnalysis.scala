package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Text-analysis operators for a training-data pipeline
  * (SURVEY.md §2.D). Everything is built-in-function composition —
  * codegen'd, UDF-free, embarrassingly parallel, so it holds at
  * 100 TB as a pure map stage over the corpus.
  *
  * Oracled queries keep every expression bit-reproducible in DuckDB:
  * integer counts from identical regexes, double arithmetic in
  * identical evaluation order (SURVEY.md §5).
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.parallel(s, Tables.documents(s, dir))

  // ---- text_tokens: token counting (oracled) ---------------------------
  private val WordRe = "[a-zA-Z]+"
  // BPE-ish pre-tokenizer: letter runs | digit runs | single symbol
  private val BpeRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def textTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(WordRe), lit(0))).as("n_word_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeRe), lit(0))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"),
      octet_length(encode(col("text"), "UTF-8")).as("n_bytes"))

  val textTokensSql: String =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_word_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
      |  length(text) AS n_chars,
      |  octet_length(encode(text)) AS n_bytes
      |FROM documents""".stripMargin

  // ---- text_quality: quality scoring (oracled) -------------------------
  private val StopRe = "\\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as)\\b"
  private val PunctCls = "[.,;:!?'\"()\\[\\]{}-]"

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text"))
    val nWs = size(split(trim(col("text")), "\\s+"))
    val nStop = size(regexp_extract_all(lower(col("text")), lit(StopRe), lit(0)))
    val nPunct = size(regexp_extract_all(col("text"), lit(PunctCls), lit(0)))
    val nAlpha = length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
    def ratio(a: Column, b: Column): Column =
      when(b === 0, 0.0).otherwise(a.cast("double") / b.cast("double"))
    val stopR = ratio(nStop, nWs)
    val punctR = ratio(nPunct, nChars)
    val alphaR = ratio(nAlpha, nChars)
    val lenNorm = least(lit(1.0), nWs.cast("double") / lit(100.0))
    docs(s, dir).select(col("doc_id"),
      nChars.as("n_chars"), nWs.as("n_ws_tokens"),
      stopR.as("stopword_ratio"), punctR.as("punct_ratio"),
      alphaR.as("alpha_ratio"), lenNorm.as("len_norm"),
      (stopR * 0.25 + alphaR * 0.25 + (lit(1.0) - punctR) * 0.25 + lenNorm * 0.25)
        .as("quality_score"))
  }

  val textQualitySql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
      |  stop_r AS stopword_ratio, punct_r AS punct_ratio,
      |  alpha_r AS alpha_ratio, len_norm,
      |  stop_r * 0.25 + alpha_r * 0.25 + (1.0 - punct_r) * 0.25 + len_norm * 0.25 AS quality_score
      |FROM (
      |  SELECT doc_id, text,
      |    CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0.0
      |      ELSE CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as)\b')) AS DOUBLE)
      |        / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) END AS stop_r,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE CAST(len(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]')) AS DOUBLE)
      |        / CAST(length(text) AS DOUBLE) END AS punct_r,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |        / CAST(length(text) AS DOUBLE) END AS alpha_r,
      |    least(1.0, CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 100.0) AS len_norm
      |  FROM documents
      |)""".stripMargin

  // ---- text_langid: marker-word heuristic language ID ------------------
  private val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is|to|in|that|it|was|for)\\b",
    "fr" -> "\\b(le|la|les|et|de|un|une|est|que|pour)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\\b",
    "es" -> "\\b(el|los|las|y|es|un|una|que|por|para)\\b",
    "zh" -> "[\\x{4e00}-\\x{9fff}]") // \x{} form: valid in both Java and RE2

  val textLangidSql: String = {
    val scores = LangMarkers.map { case (lang, re) =>
      s"len(regexp_extract_all(lower(text), '$re')) AS s_$lang"
    }.mkString(",\n    ")
    val langs = LangMarkers.map(_._1)
    // tie → earliest marker order, mirroring the Column fold below
    val caseArms = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString("\n      ")
    s"""WITH s AS (
      |  SELECT doc_id, lang AS label_lang,
      |    $scores
      |  FROM documents
      |)
      |SELECT doc_id, label_lang,
      |  CASE $caseArms ELSE '${langs.last}' END AS pred_lang,
      |  greatest(${langs.map("s_" + _).mkString(", ")}) AS marker_hits,
      |  CASE $caseArms ELSE '${langs.last}' END = label_lang AS is_correct
      |FROM s""".stripMargin
  }

  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val scores = LangMarkers.map { case (lang, re) =>
      struct(regexp_count(lower(col("text")), lit(re)).as("score"),
        lit(lang).as("lang"))
    }
    // deterministic argmax: max score, ties broken by marker order via
    // greatest on (score, reverse-priority) structs
    val best = scores.zipWithIndex.map { case (sc, i) =>
      struct(sc.getField("score").as("score"),
        lit(LangMarkers.size - i).as("prio"), sc.getField("lang").as("lang"))
    }.reduce((a, b) => when(b.getField("score") > a.getField("score") ||
      (b.getField("score") === a.getField("score") &&
        b.getField("prio") > a.getField("prio")), b).otherwise(a))
    docs(s, dir).select(col("doc_id"), col("lang").as("label_lang"),
        best.getField("lang").as("pred_lang"),
        best.getField("score").as("marker_hits"))
      .withColumn("is_correct", col("pred_lang") === col("label_lang"))
  }

  // ---- text_fingerprint: order-sensitive rolling document hash ---------
  /** Chained-xxhash64 rolling fingerprint over the token stream —
    * order-sensitive (unlike the set-based dedup signatures), overflow-
    * free under ANSI mode. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      aggregate(TextFns.tokens(col("text")), lit(0L),
        (acc, t) => xxhash64(acc, t)).as("fingerprint"),
      size(TextFns.tokens(col("text"))).as("n_tokens"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _))

  val oracle: Map[String, String] = Map(
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql)
}
