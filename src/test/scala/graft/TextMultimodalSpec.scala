package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}

class TextMultimodalSpec extends SparkSpec {

  test("text_tokens: counts positive and consistent") {
    val res = TextAnalysis.textTokens(spark, sfDir).cache()
    assert(res.count() == Tables.documents(spark, sfDir).count())
    assert(res.filter(col("n_ws_tokens") <= 0).count() == 0)
    // bytes >= chars always (UTF-8)
    assert(res.filter(col("n_bytes") < col("n_chars")).count() == 0)
    res.unpersist()
  }

  test("text_quality: ratios in [0,1], score in [0,1]") {
    val res = TextAnalysis.textQuality(spark, sfDir).cache()
    for (c <- Seq("stopword_ratio", "punct_ratio", "alpha_ratio", "len_norm", "quality_score"))
      assert(res.filter(col(c) < 0 || col(c) > 1).count() == 0, s"$c out of range")
    res.unpersist()
  }

  test("text_langid: every doc predicted, deterministic") {
    val a = TextAnalysis.textLangid(spark, sfDir).orderBy("doc_id").collect()
    val b = TextAnalysis.textLangid(spark, sfDir).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sfDir).count())
    val langs = Set("en", "fr", "de", "es", "zh")
    a.foreach(r => assert(langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("text_fingerprint: deterministic and order-sensitive") {
    import spark.implicits._
    val fp = TextAnalysis.textFingerprint(spark, sfDir)
    assert(fp.select(countDistinct(col("fingerprint"))).collect().head.getLong(0) > 1)
    // order sensitivity: same tokens, different order → different prints
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val prints = df.select(
      aggregate(graft.functions.TextFns.tokens(col("text")), lit(0L),
        (acc, t) => xxhash64(acc, t)).as("fp")).collect().map(_.getLong(0))
    assert(prints(0) != prints(1))
  }

  test("mm_meta: metadata well-formed") {
    val res = Multimodal.mmMeta(spark, sfDir).cache()
    assert(res.filter(col("fake_width") < 0 || col("fake_width") >= 4096).count() == 0)
    assert(res.filter(length(col("payload_sha")) =!= 64).count() == 0)
    assert(res.select(countDistinct(col("modality"))).collect().head.getLong(0) == 3)
    res.unpersist()
  }

  test("mm_features: scalar digests well-formed, frames sampled within bounds") {
    val res = Multimodal.mmFeatures(spark, sfDir).cache()
    assert(res.count() == Tables.documents(spark, sfDir).count())
    assert(res.filter(length(col("features_sha")) =!= 64).count() == 0)
    assert(res.filter(size(split(col("sampled_frames"), ",")) > 4).count() == 0)
    assert(res.filter(col("n_frames") <= 0).count() == 0)
    // feat_sum is a mean of 16 values in [0,1] scaled: bounded by [0,16]
    assert(res.filter(col("feat_sum") < 0 || col("feat_sum") > 16).count() == 0)
    res.unpersist()
  }
}
