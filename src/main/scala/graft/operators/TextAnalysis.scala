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

  private def ratio(a: Column, b: Column): Column =
    when(b === 0, 0.0).otherwise(a.cast("double") / b.cast("double"))

  private def stopRatio(text: Column): Column =
    ratio(size(regexp_extract_all(lower(text), lit(StopRe), lit(0))),
      size(split(trim(text), "\\s+")))
  private def punctRatio(text: Column): Column =
    ratio(size(regexp_extract_all(text, lit(PunctCls), lit(0))), length(text))
  private def alphaRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^a-zA-Z]", "")), length(text))
  private def lenNorm(text: Column): Column =
    least(lit(1.0), size(split(trim(text), "\\s+")).cast("double") / lit(100.0))

  /** The composite quality score as a reusable expression — the
    * curation pipeline (Curation.textPipeline) filters on it. */
  private[graft] def qualityScore(text: Column): Column =
    stopRatio(text) * 0.25 + alphaRatio(text) * 0.25 +
      (lit(1.0) - punctRatio(text)) * 0.25 + lenNorm(text) * 0.25

  def textQuality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      length(col("text")).as("n_chars"),
      size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
      stopRatio(col("text")).as("stopword_ratio"),
      punctRatio(col("text")).as("punct_ratio"),
      alphaRatio(col("text")).as("alpha_ratio"),
      lenNorm(col("text")).as("len_norm"),
      qualityScore(col("text")).as("quality_score"))

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

  /** Deterministic argmax over the marker scores: max score, ties
    * broken by marker order — reusable (score, lang) struct for the
    * langid query and the curation pipeline. */
  private[operators] def langBest(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, re) =>
      struct(regexp_count(lower(text), lit(re)).as("score"),
        lit(lang).as("lang"))
    }
    scores.zipWithIndex.map { case (sc, i) =>
      struct(sc.getField("score").as("score"),
        lit(LangMarkers.size - i).as("prio"), sc.getField("lang").as("lang"))
    }.reduce((a, b) => when(b.getField("score") > a.getField("score") ||
      (b.getField("score") === a.getField("score") &&
        b.getField("prio") > a.getField("prio")), b).otherwise(a))
  }

  private[operators] def predLang(text: Column): Column =
    langBest(text).getField("lang")

  /** Inline (no-CTE) DuckDB SELECT computing pred_lang per doc_id —
    * embeddable as a CTE body by composite oracles (the curation
    * pipeline), where the WITH-form [[textLangidSql]] can't nest. */
  private[operators] val predLangInlineSql: String = {
    val scores = LangMarkers.map { case (lang, re) =>
      s"len(regexp_extract_all(lower(text), '$re')) AS s_$lang"
    }.mkString(", ")
    val langs = LangMarkers.map(_._1)
    val caseArms = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, CASE $caseArms ELSE '${langs.last}' END AS pred_lang
       |  FROM (SELECT doc_id, $scores FROM documents)""".stripMargin
  }

  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val best = langBest(col("text"))
    docs(s, dir).select(col("doc_id"), col("lang").as("label_lang"),
        best.getField("lang").as("pred_lang"),
        best.getField("score").as("marker_hits"))
      .withColumn("is_correct", col("pred_lang") === col("label_lang"))
  }

  // ---- text_fingerprint: order-sensitive rolling document hash ---------
  /** Horner polynomial rolling fingerprint over the document's Unicode
    * code points, mod the Mersenne prime 2^31-1 — order-sensitive
    * (unlike the set-based dedup signatures) and engine-neutral, so the
    * oracle recomputes it independently (DuckDB list_reduce over
    * unicode(char)). Spark's split('')/ascii pair yields full code
    * points (astral plane included), verified identical to DuckDB's
    * string_split('')/unicode. Empty text pins to 0 (the engines
    * disagree on unicode('')). Pure codegen map stage, zero shuffle. */
  private val FpMod = 2147483647L // 2^31 - 1
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      when(length(col("text")) === 0, lit(0L)).otherwise(
        aggregate(transform(split(col("text"), ""), c => ascii(c).cast("long")),
          lit(0L), (acc, x) => (acc * 31 + x) % FpMod)).as("fingerprint"),
      size(TextFns.tokens(col("text"))).as("n_tokens"))

  val textFingerprintSql: String =
    """SELECT doc_id,
      |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
      |    ELSE list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 2147483647) END AS fingerprint,
      |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
      |FROM documents""".stripMargin

  // ---- text_tfidf: corpus TF-IDF top terms per document ----------------
  /** Top-[[TfidfTopK]] TF-IDF terms per document. tf/df are exact
    * integer counts; the idf weight is the RATIONAL (N+1)/(df+1) —
    * chosen over log-idf because ln() is not correctly rounded in
    * either engine (measured: 4/11502 inputs differ between Java
    * Math.log and DuckDB ln), while one integer-ratio multiply and
    * divide is bit-exact cross-engine. Ranking per doc is total-ordered
    * by (score DESC, term) so the top-k set is deterministic.
    *
    * Scale posture: tf is a (doc,term)-keyed partial→final agg; df
    * aggregates the already-distinct tf table by term; the tf⋈df
    * equi-join shuffles on the term key. No driver loop — the corpus
    * size N enters as a broadcast one-row cross join. */
  private val TfidfTopK = 5
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfT, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("n_docs") + lit(1)).cast("double") /
          (col("df") + lit(1)).cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TfidfTopK)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }

  val textTfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT doc_id, term, tf, df, score, rank FROM (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE) AS score,
      |    CAST(row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY CAST(tf.tf AS DOUBLE) * CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE) DESC,
      |        tf.term) AS INT) AS rank
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |) WHERE rank <= 5""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_tfidf" -> (textTfidf _),
    "text_fingerprint" -> (textFingerprint _))

  val oracle: Map[String, String] = Map(
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_tfidf" -> textTfidfSql,
    "text_fingerprint" -> textFingerprintSql)
}
