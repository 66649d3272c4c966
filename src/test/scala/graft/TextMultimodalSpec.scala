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

  test("text_pii: detects planted PII, redaction is idempotent on clean text") {
    import spark.implicits._
    // corpus-level invariants
    val res = TextAnalysis.textPii(spark, sfDir)
    assert(res.count() == Tables.documents(spark, sfDir).count())
    assert(res.filter(col("n_emails") < 0 || col("n_ipv4") < 0 ||
      col("n_phones") < 0).count() == 0)
    // planted rows prove each pattern class actually fires
    val planted = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call 555-123-4567 now"),
      (2L, "server at 192.168.10.1 responded"),
      (3L, "no pii whatsoever here")).toDF("doc_id", "text")
    val got = planted.select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))).as("e"),
        size(regexp_extract_all(col("text"),
          lit("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"), lit(0))).as("i"),
        size(regexp_extract_all(col("text"),
          lit("\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"), lit(0))).as("p"),
        TextAnalysis.redact(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Int]("e") == 1 && got(1L).getAs[Int]("p") == 1)
    assert(got(2L).getAs[Int]("i") == 1)
    assert(got(3L).getAs[Int]("e") + got(3L).getAs[Int]("i") +
      got(3L).getAs[Int]("p") == 0)
    assert(got(1L).getAs[String]("red") ==
      "contact <EMAIL> or call <PHONE> now")
    assert(got(2L).getAs[String]("red") == "server at <IP> responded")
    assert(got(3L).getAs[String]("red") == "no pii whatsoever here")
  }

  test("text_repetition: fractions in [0,1], repeated text scores higher") {
    import spark.implicits._
    val res = TextAnalysis.textRepetition(spark, sfDir)
    for (c <- Seq("dup_token_frac", "dup_2gram_frac", "dup_3gram_frac"))
      assert(res.filter(col(c) < 0.0 || col(c) > 1.0).count() == 0, c)
    // n-gram counts shrink with n: total 2-grams = tokens-1 (when >=2)
    assert(res.filter(col("n_tokens") >= 2 &&
      col("n_2grams") =!= col("n_tokens") - 1).count() == 0)
    // a looping document must out-score a non-repeating one — run the
    // operator itself over a tiny substituted table via the same exprs
    val docsDf = Seq(
      (1L, ("spam ham " * 20).trim),
      (2L, (1 to 40).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    docsDf.createOrReplaceTempView("rep_probe")
    val toks = graft.functions.TextFns.tokens(col("text"))
    val probe = docsDf.select(col("doc_id"),
        (lit(1.0) - size(array_distinct(toks)).cast("double") /
          size(toks).cast("double")).as("dup"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probe(1L) > 0.9 && probe(2L) == 0.0)
  }

  test("text_contamination: benchmark docs fully contaminated, counts bounded") {
    val res = TextAnalysis.textContamination(spark, sfDir).cache()
    assert(res.count() == Tables.documents(spark, sfDir).count())
    assert(res.filter(col("n_contaminated") > col("n_ngrams")).count() == 0)
    assert(res.filter(col("contamination_frac") < 0.0 ||
      col("contamination_frac") > 1.0).count() == 0)
    // every benchmark-window doc with any 5-grams is 100% contaminated
    // (its n-grams are in the benchmark set by construction)
    val benchBad = res.filter(col("doc_id") < TextAnalysis.ContamBenchN &&
      col("n_ngrams") > 0 && col("contamination_frac") =!= 1.0).count()
    assert(benchBad == 0, "benchmark docs must be fully contaminated")
    res.unpersist()
  }

  test("mm_meta: metadata well-formed") {
    val res = Multimodal.mmMeta(spark, sfDir).cache()
    assert(res.filter(col("fake_width") < 0 || col("fake_width") >= 4096).count() == 0)
    assert(res.filter(length(col("payload_sha")) =!= 64).count() == 0)
    assert(res.select(countDistinct(col("modality"))).collect().head.getLong(0) == 3)
    res.unpersist()
  }

  test("mm_features: real BMP decode — geometry, channel sums, histogram") {
    val res = Multimodal.mmFeatures(spark, sfDir).cache()
    assert(res.count() == Tables.documents(spark, sfDir).count())
    assert(res.filter(col("width") < 2 || col("width") > 7 ||
      col("height") < 2 || col("height") > 6).count() == 0)
    // the 4 intensity bins partition the pixel bytes exactly
    assert(res.filter(col("hist_0") + col("hist_1") + col("hist_2") + col("hist_3")
      =!= col("width") * col("height") * 3).count() == 0)
    // each channel sum is bounded by 255 × pixel count
    assert(res.filter(col("r_sum") > col("width") * col("height") * 255L ||
      col("g_sum") > col("width") * col("height") * 255L ||
      col("b_sum") > col("width") * col("height") * 255L).count() == 0)
    // encoded size follows the BMP header + row-padding rule
    assert(res.filter(col("bmp_bytes") =!=
      lit(54) + floor((col("width") * 3 + 3) / 4) * 4 * col("height")).count() == 0)
    res.unpersist()
  }

  test("mm_resize: 4x4 nearest-neighbor thumbnail — bytes from the decoded source") {
    val res = Multimodal.mmResize(spark, sfDir).cache()
    assert(res.count() == Tables.documents(spark, sfDir).count())
    // 16 pixels x 3 channels as hex = 96 chars, and sums recompute
    // from the pinned bytes exactly
    assert(res.filter(length(col("thumb_hex")) =!= 96).count() == 0)
    res.collect().foreach { r =>
      val bytes = r.getAs[String]("thumb_hex").grouped(2)
        .map(Integer.parseInt(_, 16)).toArray
      val sums = Array(0L, 0L, 0L)
      bytes.zipWithIndex.foreach { case (v, i) => sums(i % 3) += v }
      assert(sums(0) == r.getAs[Long]("thumb_r") &&
        sums(1) == r.getAs[Long]("thumb_g") && sums(2) == r.getAs[Long]("thumb_b"))
    }
    // a source whose dims already are 4x4 must thumbnail to ITSELF
    // (nearest-neighbor with identical dims is the identity) — proves
    // the sampler indexes the decoder's real pixel layout, not a copy
    import spark.implicits._
    val sq = Multimodal.mmFeatures(spark, sfDir)
      .filter(col("width") === 4 && col("height") === 4)
      .join(res, "doc_id")
    assert(sq.count() > 0, "need at least one 4x4 source at test SF")
    assert(sq.filter(col("thumb_r") =!= col("r_sum") ||
      col("thumb_g") =!= col("g_sum") ||
      col("thumb_b") =!= col("b_sum")).count() == 0)
    res.unpersist()
  }

  test("mm_frame_sample: strided sampling — even frames only, half kept") {
    val res = Multimodal.mmFrameSample(spark, sfDir).cache()
    // only even frame indices survive the stride-2 sampler
    assert(res.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    assert(res.filter(col("frame_idx") >= col("n_frames")).count() == 0)
    // per doc: exactly ceil(n_frames / 2) sampled rows
    val bad = res.groupBy("doc_id", "n_frames")
      .agg(count(lit(1)).as("n_sampled"))
      .filter(col("n_sampled") =!= ceil(col("n_frames") / lit(2.0)).cast("long"))
    assert(bad.count() == 0)
    // frame 0's pixels coincide with the still image's (offset 0), so
    // its channel sums must equal mm_features' — the frame synthesizer
    // and the still-image path share the decoder end to end
    val mism = res.filter(col("frame_idx") === 0)
      .select(col("doc_id"), col("r_sum").as("fr"), col("g_sum").as("fg"),
        col("b_sum").as("fb"))
      .join(Multimodal.mmFeatures(spark, sfDir), "doc_id")
      .filter(col("fr") =!= col("r_sum") || col("fg") =!= col("g_sum") ||
        col("fb") =!= col("b_sum"))
    assert(mism.count() == 0)
    res.unpersist()
  }

  test("mm_audio: real RIFF decode — integer-exact waveform features") {
    val res = Multimodal.mmAudio(spark, sfDir).cache()
    assert(res.count() == Tables.documents(spark, sfDir).count())
    assert(res.filter(col("n_samples") < 64 || col("n_samples") >= 256).count() == 0)
    assert(res.filter(col("sample_rate") < 8000 ||
      col("sample_rate") > 15000).count() == 0)
    // peak bounds 16-bit magnitudes; zero crossings bound by n-1
    assert(res.filter(col("peak_abs") > 32768).count() == 0)
    assert(res.filter(col("zero_crossings") >= col("n_samples")).count() == 0)
    // sum of squares is bounded by n * peak^2 and consistent with it
    assert(res.filter(col("sumsq") >
      col("n_samples").cast("long") * col("peak_abs").cast("long")
        * col("peak_abs").cast("long")).count() == 0)
    assert(res.filter(col("sumsq") <
      col("peak_abs").cast("long") * col("peak_abs").cast("long")).count() == 0)
    res.unpersist()
  }

  test("mm_segment: regions partition each image, descriptors well-formed") {
    val res = Multimodal.mmSegment(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).count()
    // every doc segmented; region indexes dense 0..n_regions-1
    assert(res.select("doc_id").distinct().count() == docs)
    val badIdx = res.groupBy("doc_id")
      .agg(max(col("n_regions")).as("nr"), count(lit(1)).as("cnt"),
        max(col("region_idx")).as("mx"), min(col("region_idx")).as("mn"))
      .filter(col("cnt") =!= col("nr") || col("mx") =!= col("nr") - 1 ||
        col("mn") =!= 0)
    assert(badIdx.count() == 0)
    // sizes partition the synthesized geometry: width*height =
    // 8*(2 + doc_id%3) * 8*(1 + octet_length%3) (block-aligned for
    // the exact JPEG ingest round trip)
    val expected = Tables.documents(spark, sfDir).select(col("doc_id"),
      (lit(8) * (lit(2) + col("doc_id") % 3) * lit(8) *
        (lit(1) + octet_length(encode(col("text"), "UTF-8")) % 3)).as("npx"))
    val sized = res.groupBy("doc_id").agg(sum(col("n_pixels")).as("got"))
      .join(expected, "doc_id").filter(col("got") =!= col("npx"))
    assert(sized.count() == 0)
    // weights sum to 1 per image; descriptors are 14-dim
    val badW = res.groupBy("doc_id").agg(sum(col("weight")).as("w"))
      .filter(abs(col("w") - 1.0) > 1e-9)
    assert(badW.count() == 0)
    // descriptor is the comma-joined shortest-repr string of 14
    // doubles (driver-sortable; DuckDB splits + casts it back)
    assert(res.filter(size(split(col("descriptor"), ",")) =!= 14).count() == 0)
    assert(res.filter(
      exists(transform(split(col("descriptor"), ","), x => x.cast("double")),
        x => x.isNull)).count() == 0)
    // the band structure produces real multi-region segmentations:
    // images with several contrasting bands usually keep boundaries
    assert(res.filter(col("n_regions") > 1).count() > 0)
    res.unpersist()
  }

  test("mm_segment_check: per-image invariants match the region rollup") {
    val check = Multimodal.mmSegmentCheck(spark, sfDir).cache()
    val seg = Multimodal.mmSegment(spark, sfDir)
      .groupBy("doc_id")
      .agg(max(col("n_regions")).as("n_regions"),
        sum(col("n_pixels")).cast("long").as("n_pixels"),
        sum(col("r_sum")).as("r_sum"), sum(col("g_sum")).as("g_sum"),
        sum(col("b_sum")).as("b_sum"))
    val totals = check.drop("regions_sha")
    assert(totals.exceptAll(seg).isEmpty && seg.exceptAll(totals).isEmpty)
    // the r15 descriptor fold: regions_sha must equal a driver-side
    // recompute of SHA-256 over the region_idx-ordered
    // (region_idx, n_pixels, descriptor) serialization
    val regions = Multimodal.mmSegment(spark, sfDir)
      .select("doc_id", "region_idx", "n_pixels", "descriptor").collect()
      .groupBy(_.getLong(0))
    val wantSha = regions.map { case (doc, rs) =>
      val payload = rs.sortBy(_.getInt(1))
        .map(r => s"${r.getInt(1)}:${r.getInt(2)}:${r.getString(3)}")
        .mkString("|")
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(payload.getBytes("UTF-8"))
      doc -> d.map(b => f"$b%02x").mkString
    }
    val gotSha = check.select("doc_id", "regions_sha").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotSha == wantSha)
    check.unpersist()
  }

  test("mm_jpeg_files / mm_wav_files: disk round trip equals column twins") {
    // the file-ingest twins write real .jpg/.wav files once, read them
    // back through the binaryFile source and decode the FILE bytes —
    // their output must be row-identical to the column-borne operators
    // (any naming, listing, truncation or codec-framing bug diverges)
    import graft.operators.Multimodal
    val jf = Multimodal.mmJpegFiles(spark, sfDir)
    val jc = Multimodal.mmJpeg(spark, sfDir)
    assert(jf.exceptAll(jc).isEmpty && jc.exceptAll(jf).isEmpty,
      "mm_jpeg_files diverged from mm_jpeg")
    val wf = Multimodal.mmWavFiles(spark, sfDir)
    val wc = Multimodal.mmAudio(spark, sfDir)
    assert(wf.exceptAll(wc).isEmpty && wc.exceptAll(wf).isEmpty,
      "mm_wav_files diverged from mm_audio")
  }

  test("mm_jpeg: real encode->decode round trip, decoded sums match source") {
    val res = Multimodal.mmJpeg(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).count()
    assert(res.select("doc_id").distinct().count() == docs)
    // band fan-out matches the synthesized geometry
    val badBands = res.groupBy("doc_id")
      .agg(count(lit(1)).as("nb"), max(col("width")).as("w"))
      .filter(col("nb") =!= col("w") / 8)
    assert(badBands.count() == 0)
    // the decoded-pixel band sums equal the source construction:
    // digest byte × band pixel count (the q100 lossless anchor) —
    // recomputed here via the same synthesis the oracle uses
    val bad = res.filter(
      col("band_sum") < 0 || col("band_sum") > lit(255L) * 8 * col("height"))
    assert(bad.count() == 0)
    // one sample all the way down: stream is a real JFIF file and the
    // decoded image equals the synthesized source bit-for-bit
    val sample = Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("p"))
      .head()
    val src = Multimodal.synthesizeGrayBands(
      sample.getLong(0), sample.getAs[Array[Byte]]("p"))
    val jpeg = graft.functions.JpegCodec.encodeJpeg(src, 100, gray = true)
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    assert(jpeg.length < src.rgb.length, "JPEG stream should compress the raw plane")
    assert(graft.functions.JpegCodec.decodeJpeg(jpeg).rgb.sameElements(src.rgb))
    res.unpersist()
  }

  test("text_crossdup: shared spans are covered exactly, unique text is not") {
    import spark.implicits._
    // a 10-token span shared by docs 1 and 2 at different offsets;
    // only grams fully inside the span are identical across docs, and
    // their union covers exactly the 10 span positions in each doc
    val span = (1 to 10).map(i => s"shared$i").mkString(" ")
    val injected = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"iota kappa lambda mu nu xi omicron pi $span"),
      (3L, "solo tokens that never repeat across documents one two three four"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.crossdupFromDocs(injected).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1L).getAs[Long]("n_dup_positions") == 10)
    assert(r(2L).getAs[Long]("n_dup_positions") == 10)
    assert(r(3L).getAs[Long]("n_dup_positions") == 0)
    assert(r(3L).getAs[Double]("dup_frac") == 0.0)
    // corpus run: one row per doc, fractions in [0,1]
    val corpus = TextAnalysis.textCrossdup(spark, sfDir).collect()
    assert(corpus.length == Tables.documents(spark, sfDir).count())
    corpus.foreach { row =>
      val f = row.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(row.getAs[Long]("n_dup_positions") <= row.getAs[Long]("n_tokens"))
    }
  }

  test("text_paragraph_dedup: matches a driver-local reference on the corpus") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // local reference: same 12-token window segmentation, cross-doc
    // dup rule, and cleaned-digest over the sf0.001 corpus
    val docsLocal = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val paras = docsLocal.toSeq.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").toSeq.grouped(12).zipWithIndex
        .map { case (w, i) => (id, i, w.mkString(" ")) }
    }
    val nd = paras.groupBy(_._3).map { case (p, occ) =>
      p -> occ.map(_._1).distinct.size
    }
    val expect = paras.groupBy(_._1).map { case (id, ps) =>
      val sorted = ps.sortBy(_._2)
      val dups = sorted.count(p => nd(p._3) >= 2)
      val kept = sorted.filter(p => nd(p._3) < 2).map(_._3).mkString(" ")
      id -> ((sorted.size.toLong, dups.toLong, md5hex(kept)))
    }
    val got = operators.TextAnalysis.textParagraphDedup(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_dup_paras"),
          r.getAs[String]("kept_digest")))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
    // at least one duplicated and one clean paragraph exist at this sf,
    // or the operator tested nothing
    assert(expect.values.exists(_._2 > 0), "no duplicated paragraph in corpus")
    assert(expect.values.exists(v => v._2 < v._1), "every paragraph duplicated")
  }

  test("dedup_substring: matches a driver-local gaps-and-islands reference") {
    // local reference: same 8-token windows, cross-doc dup rule,
    // maximal consecutive runs, over the sf0.001 corpus
    val W = 8
    val docsLocal = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq)
    val grams = docsLocal.flatMap { case (id, ts) =>
      ts.sliding(W).filter(_.size == W).zipWithIndex
        .map { case (w, i) => (id, i + 1, w.mkString(" ")) }
    }
    val nd = grams.groupBy(_._3).map { case (g, occ) =>
      g -> occ.map(_._1).distinct.size
    }
    val expect = docsLocal.map { case (id, ts) =>
      val starts = grams.filter(g => g._1 == id && nd(g._3) >= 2)
        .map(_._2).sorted
      // islands: consecutive starts form one run
      val runs = starts.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => e - s + 1 }
      val mx = if (runs.isEmpty) 0L else runs.max.toLong + (W - 1)
      id -> ((ts.size.toLong, runs.size.toLong, mx, mx >= 20))
    }.toMap
    val got = TextAnalysis.dedupSubstring(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_runs"),
          r.getAs[Long]("max_dup_substr_tokens"), r.getAs[Boolean]("drop_doc"))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
    // the corpus must exercise both drop branches or the spec proved nothing
    assert(expect.values.exists(_._4), "no doc over the drop threshold")
    assert(expect.values.exists(v => !v._4), "every doc over the threshold")
    // gapped runs (no doc at this sf has two separate islands): inject a
    // doc sharing two NON-adjacent 8-token spans with a second doc —
    // two runs of one window each, neither reaching the 20-token cut
    import spark.implicits._
    val span1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val span2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val gap = (1 to 5).map(i => s"g$i").mkString(" ")
    val injected = Seq(
      (1L, s"$span1 $gap $span2"),
      (2L, s"$span1 x y z $span2"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")).toDF("doc_id", "text")
    val inj = TextAnalysis.dedupSubstringFromDocs(injected).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_runs"), r.getAs[Long]("max_dup_substr_tokens"),
          r.getAs[Boolean]("drop_doc")))).toMap
    assert(inj(1L) == ((2L, 8L, false)), s"doc 1: ${inj(1L)}")
    assert(inj(2L) == ((2L, 8L, false)), s"doc 2: ${inj(2L)}")
    assert(inj(3L) == ((0L, 0L, false)), s"doc 3: ${inj(3L)}")
  }

  test("text_gopher_filter: each rule isolated by an injected doc; corpus sane") {
    import spark.implicits._
    val stops = "the be to of and that have with"        // 8 stop types, 24 chars
    val filler = (1 to 52).map(i => f"word$i%02d").mkString(" ") // 52 × 6 chars
    val injected = Seq(
      (1L, s"$stops $filler"),                           // 60 words, all rules pass
      (2L, s"$stops again again"),                       // 10 words: word-count fails
      (3L, (1 to 60).map(_ => "12345").mkString(" ")),   // numeric: alpha + stops fail
      (4L, s"$stops ${(1 to 45).map(i => f"word$i%02d").mkString(" ")} " +
        (1 to 7).map(_ => "#").mkString(" ")),           // 60 words, 7 '#': symbol fails
      (5L, (1 to 60).map(_ => "abcdefghijkl").mkString(" "))) // mean len 12: fails
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherFromDocs(injected).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    def flags(id: Long): (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean) = {
      val x = r(id)
      (x.getAs[Boolean]("ok_word_count"), x.getAs[Boolean]("ok_mean_word_len"),
        x.getAs[Boolean]("ok_symbol_ratio"), x.getAs[Boolean]("ok_alpha_words"),
        x.getAs[Boolean]("ok_stop_words"), x.getAs[Boolean]("keep"))
    }
    assert(flags(1L) == ((true, true, true, true, true, true)))
    assert(flags(2L) == ((false, true, true, true, true, false)))
    assert(flags(3L) == ((true, true, true, false, false, false)))
    assert(flags(4L) == ((true, true, false, true, true, false)),
      s"doc 4: ${flags(4L)}")
    assert(flags(5L) == ((true, false, true, true, false, false)))
    assert(r(1L).getAs[Long]("n_words") == 60L)
    assert(r(4L).getAs[Double]("symbol_ratio") > 0.1)
    // corpus: one row per doc, both keep branches exercised
    val corpus = TextAnalysis.textGopherFilter(spark, sfDir).cache()
    assert(corpus.count() == Tables.documents(spark, sfDir).count())
    assert(corpus.filter(col("keep")).count() > 0, "no doc keeps")
    assert(corpus.filter(!col("keep")).count() > 0, "every doc keeps")
    corpus.unpersist()
  }

  test("mm_phash: hash bits exact on a crafted image; corpus pairs verified") {
    import graft.functions.ImageCodec
    // 2x2 image, lumas (10, 10, 10, 100): mean 32.5 → only pixel 3 above
    val rgb = Array[Byte](4, 3, 3, 5, 2, 3, 0, 0, 10, 50, 30, 20)
    val img = ImageCodec.Image(2, 2, rgb)
    assert(Multimodal.phashBits(img) == 8L, "expected only bit 3 set")
    // all-equal lumas: STRICTLY above mean never fires → hash 0
    val flat = ImageCodec.Image(2, 2, Array.fill[Byte](12)(7))
    assert(Multimodal.phashBits(flat) == 0L)
    // synthesis is deterministic and the real decode round-trips it
    val bmp = Multimodal.synthesizePhashBmp("hello world the end")
    assert(bmp.sameElements(Multimodal.synthesizePhashBmp("hello world the end")))
    val dec = ImageCodec.decodeBmp(bmp)
    assert(dec.width >= 2 && dec.height >= 2)
    // corpus: every pair re-verified driver-side from the emitted hashes
    val rows = Multimodal.mmPhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("phash_a"); val b = r.getAs[Long]("phash_b")
      val ham = java.lang.Long.bitCount(a ^ b)
      assert(r.getAs[Int]("hamming") == ham)
      assert(r.getAs[Boolean]("is_dup") == (ham <= 2))
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val n = r.getAs[Int]("width") * r.getAs[Int]("height")
      // every pair shares a band under the floor(n/3) split
      def slices(h: Long): Seq[Long] = {
        val w = n / 3
        Seq(h & ((1L << w) - 1), (h >> w) & ((1L << w) - 1), h >> (2 * w))
      }
      assert(slices(a).zip(slices(b)).exists(p => p._1 == p._2),
        s"pair without a shared band: $r")
      // no bit above the pixel count is ever set
      if (n < 64) {
        assert((a >> n) == 0L && (b >> n) == 0L, s"hash bits beyond n=$n: $r")
      }
    }
    // both verify branches live on the corpus
    assert(rows.exists(_.getAs[Boolean]("is_dup")), "no near-dup image pair")
    assert(rows.exists(!_.getAs[Boolean]("is_dup")), "every candidate a dup")
    // RECALL guarantee: every same-geometry pair within the Hamming
    // radius appears as a candidate (pigeonhole: <=2 errors cannot
    // corrupt all 3 non-empty bands) — checked exhaustively driver-side
    val table = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map { rr =>
        val img = graft.functions.ImageCodec.decodeBmp(
          Multimodal.synthesizePhashBmp(rr.getString(1)))
        (rr.getLong(0), img.width, img.height, Multimodal.phashBits(img))
      }
    val emitted = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    for {
      pair <- table.sortBy(_._1).toSeq.combinations(2)
      Seq((da, wa, ha, pa), (db, wb, hb, pb)) = pair
      if wa == wb && ha == hb && java.lang.Long.bitCount(pa ^ pb) <= 2
    } assert(emitted.contains((da, db)),
      s"true near-dup pair ($da,$db) missing from candidates")
  }

  test("mm_audio_vad: matches a driver-local reference over the corpus") {
    // local reference: same synthesis (digest byte pairs), framing,
    // strict-above-mean gate, and run finding
    val docsLocal = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = docsLocal.map { case (id, text) =>
      val payload = text.getBytes("UTF-8")
      val n = 64 + payload.length % 192
      val digest = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      val samples = Array.tabulate(n) { i =>
        val base = 2 * i + 7 * (i / 16)
        (((digest(base % 32) & 0xff) << 8 |
          (digest((base + 1) % 32) & 0xff)) - 32768)
      }
      val nf = n / 16
      val e = Array.tabulate(nf)(f =>
        (f * 16 until (f + 1) * 16).map(i => math.abs(samples(i)).toLong).sum)
      val total = e.sum
      val v = e.map(x => x * nf > total)
      val runs = v.foldLeft(List.empty[Int] -> 0) {
        case ((acc, cur), true) => acc -> (cur + 1)
        case ((acc, cur), false) => (if (cur > 0) cur :: acc else acc) -> 0
      } match { case (acc, cur) => if (cur > 0) cur :: acc else acc }
      id -> ((n, nf, v.count(identity), if (runs.isEmpty) 0 else runs.max,
        v.indexWhere(identity) match { case -1 => nf; case i => i }))
    }.toMap
    val got = Multimodal.mmAudioVad(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_samples"), r.getAs[Int]("n_frames"),
          r.getAs[Int]("n_voiced"), r.getAs[Int]("longest_voiced_run"),
          r.getAs[Int]("lead_silence")))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
    // sane + non-degenerate: voiced and silent frames both occur
    assert(expect.values.exists(_._3 > 0), "no voiced frame anywhere")
    assert(expect.values.exists(v => v._3 < v._2), "every frame voiced")
    assert(expect.values.forall(v => v._4 <= v._3 && v._5 <= v._2))
  }

  test("text_source_overlap: matrix matches driver-local gram sets") {
    val docsLocal = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val gsets = docsLocal.groupBy(_._1).map { case (src, rows) =>
      src -> rows.flatMap { case (_, text) =>
        text.trim.toLowerCase.split("\\s+").toSeq.sliding(8)
          .filter(_.size == 8).map(_.mkString(" "))
      }.toSet
    }
    val expect = (for {
      a <- gsets.keys; b <- gsets.keys if a < b
      sh = (gsets(a) & gsets(b)).size.toLong
    } yield (a, b) -> ((gsets(a).size.toLong, gsets(b).size.toLong, sh,
      sh.toDouble / (gsets(a).size + gsets(b).size - sh).toDouble))).toMap
    val got = TextAnalysis.textSourceOverlap(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("gram_jaccard")))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, e) =>
      assert(got(k) == e, s"pair $k: got ${got(k)}, expected $e")
    }
    // the matrix must measure something: some pair overlaps, none is identical
    assert(expect.values.exists(_._3 > 0), "no cross-source overlap anywhere")
    assert(expect.values.forall(v => v._4 < 1.0))
  }

  test("mm_video_scene: matches a driver-local reference over the corpus") {
    val docsLocal = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = docsLocal.map { case (id, text) =>
      val payload = text.getBytes("UTF-8")
      val nf = (4 + id % 5).toInt
      val w = (2 + id % 6).toInt
      val h = (2 + payload.length % 5).toInt
      val digest = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      def luma(f: Int): IndexedSeq[Int] = (0 until w * h).map { k =>
        (0 to 2).map(c => digest((3 * k + c + 7 * f) % 32) & 0xff).sum
      }
      val diffs = (1 until nf).map { f =>
        val (la, lb) = (luma(f), luma(f - 1))
        la.indices.map(k => math.abs(la(k) - lb(k)).toLong).sum
      }
      val total = diffs.sum
      val cuts = (1 until nf).filter(f => diffs(f - 1) * diffs.length > total)
      val bounds = 0 +: cuts :+ nf
      id -> ((nf, cuts.length, cuts.length + 1,
        bounds.sliding(2).map(p => p(1) - p(0)).max))
    }.toMap
    val got = Multimodal.mmVideoScene(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_frames"), r.getAs[Int]("n_cuts"),
          r.getAs[Int]("n_shots"), r.getAs[Int]("longest_shot")))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
    // cuts exist somewhere and no video is all-cuts
    assert(expect.values.exists(_._2 > 0), "no scene cut in corpus")
    assert(expect.values.forall(v => v._4 >= 1))
  }

  test("graft_nfc: canonical composition matches composed forms") {
    import spark.implicits._
    val composed = "café"                 // é as one code point
    val decomposed = "café"              // e + combining acute
    val rows = Seq(("a", decomposed), ("b", composed), ("c", "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), graft.functions.NormFns.nfc(col("s")).as("n"))
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("n")).toMap
    assert(rows("a") == composed, "decomposed form did not compose")
    assert(rows("b") == composed)
    assert(rows("c") == "plain ascii")
    // SQL surface
    graft.GraftFunctions.register(spark)
    val viaSql = spark.sql(s"SELECT graft_nfc('café') AS n")
      .collect().head.getAs[String]("n")
    assert(viaSql == composed)
  }

  test("text_normalize: digests match a driver recomputation, unicode folds") {
    val res = TextAnalysis.textNormalize(spark, sfDir).cache()
    assert(res.count() == Tables.documents(spark, sfDir).count())
    assert(res.filter(length(col("norm_sha")) =!= 64).count() == 0)
    // driver recomputation of the full normalize chain on a sample
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = res.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("norm_sha")).toMap
    docs.take(50).foreach { case (id, text) =>
      val norm = java.text.Normalizer
        .normalize(text, java.text.Normalizer.Form.NFC)
        .toLowerCase.trim.replaceAll("\\s+", " ")
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(id) == sha, s"normalize digest drifted for doc $id")
    }
    res.unpersist()
  }

  test("text_bpe_train: hand-traced merges on the classic corpus") {
    import spark.implicits._
    // "low low lower": words low×2 lower×1 → pairs (l,o):3 (o,w):3
    // (w,e):1 (e,r):1. Round 1 tie at 3 breaks to (l,o); round 2
    // merges (lo,w); round 3 tie at 1 breaks to (e,r) ('e' < 'low');
    // round 4 merges (low,er); then no pairs remain → 4 rows despite
    // BpeMerges = 6 (exhaustion stops the loop).
    val d = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bpeTrainFromDocs(spark, d)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("merge_a"),
        r.getAs[String]("merge_b"), r.getAs[Long]("pair_count"),
        r.getAs[String]("new_symbol")))
    assert(got.toSeq == Seq(
      (1, "l", "o", 3L, "lo"),
      (2, "lo", "w", 3L, "low"),
      (3, "e", "r", 1L, "er"),
      (4, "low", "er", 1L, "lower")))
  }

  test("text_bpe_train: deterministic, counts non-increasing, symbols compose") {
    val r1 = TextAnalysis.textBpeTrain(spark, sfDir).orderBy("round").collect()
    val r2 = TextAnalysis.textBpeTrain(spark, sfDir).orderBy("round").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(r1.length == 6)
    // a merged pair's count can never exceed an earlier round's best:
    // merging only consumes occurrences, and new pairs containing the
    // merged symbol are bounded by its occurrence count
    val counts = r1.map(_.getAs[Long]("pair_count"))
    counts.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"pair counts rose: $a -> $b")
      case _ => ()
    }
    // every merge operand is either a single char or a previously
    // produced symbol (the BPE vocabulary-closure property)
    val produced = scala.collection.mutable.Set[String]()
    r1.foreach { r =>
      for (sym <- Seq(r.getAs[String]("merge_a"), r.getAs[String]("merge_b")))
        assert(sym.length == 1 || produced.contains(sym),
          s"merge operand $sym is neither a char nor a prior symbol")
      produced += r.getAs[String]("new_symbol")
    }
  }

  test("text_bpe_encode: hand-traced encoding on the classic corpus") {
    import spark.implicits._
    // merges on "low low lower" (see the train spec): lo, low, er,
    // lower — both words encode to ONE symbol each, so the doc's 3
    // word occurrences (11 chars) become 3 BPE tokens at 11/3 chars
    // per token.
    val d = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bpeEncodeFromDocs(spark, d).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("word_chars") == 11L)
    assert(r.getAs[Long]("bpe_tokens") == 3L)
    assert(math.abs(r.getAs[Double]("chars_per_token") - 11.0 / 3.0) < 1e-12)
  }

  test("text_bpe_encode: matches a driver re-encode; bounds hold corpus-wide") {
    val res = TextAnalysis.textBpeEncode(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    assert(res.count() == docs.count(), "one row per document")
    // every word is at least 1 and at most len(word) symbols
    assert(res.filter(col("bpe_tokens") < col("n_words") ||
      col("bpe_tokens") > col("word_chars")).count() == 0)
    // driver reference encoder: the trained merges applied as greedy
    // left-to-right non-overlapping passes, word by word
    val merges = TextAnalysis.textBpeTrain(spark, sfDir).orderBy("round")
      .collect().map(r =>
        (r.getAs[String]("merge_a"), r.getAs[String]("merge_b")))
    // the encode query's session merge cache must agree with a fresh
    // training run (cache ≡ fresh)
    assert(graft.operators.TextAnalysis.trainedMerges(spark, sfDir) ==
      merges.toSeq, "merge cache drifted from a fresh training run")
    def encLen(word: String): Int =
      merges.foldLeft(word.map(_.toString).toVector) { case (v, (a, b)) =>
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        for (t <- v) {
          if (buf.nonEmpty && buf.last == a && t == b)
            buf(buf.length - 1) = a + b
          else buf += t
        }
        buf.toVector
      }.length
    val got = res.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_words"), r.getAs[Long]("word_chars"),
        r.getAs[Long]("bpe_tokens"))).toMap
    docs.limit(40).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ws = "[a-z]+".r.findAllIn(r.getAs[String]("text").toLowerCase).toSeq
      val want = (ws.size.toLong, ws.map(_.length.toLong).sum,
        ws.map(encLen(_).toLong).sum)
      assert(got(id) == want, s"encode accounting drifted for doc $id")
    }
    res.unpersist()
  }

  test("text_bm25: query set is the top-df long terms, scores match a driver recompute") {
    val res = TextAnalysis.textBm25(spark, sfDir).cache()
    val rows = res.collect()
    assert(rows.length > 0 && rows.length <= 8 * 10)
    // rebuild tf/df/dl from the raw corpus with the same tokenizer
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.trim.split("\\s+").toSeq).toMap
    val dl = docs.view.mapValues(_.size.toLong).toMap
    val tf = docs.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) } }
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val qwant = df.filter(_._1.length >= 4).toSeq
      .sortBy { case (t, d) => (-d, t) }.take(8).map(_._1).toSet
    assert(rows.map(_.getAs[String]("term")).toSet == qwant,
      "query-term selection drifted from top-df length>=4")
    val nDocs = docs.size.toLong
    val avgdl = dl.values.sum.toDouble / nDocs.toDouble
    val tfMap = tf.map { case (id, t, c) => (id, t) -> c }.toMap
    rows.foreach { r =>
      val t = r.getAs[String]("term"); val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("tf") == tfMap((id, t)))
      assert(r.getAs[Long]("df") == df(t))
      assert(r.getAs[Long]("dl") == dl(id))
      val want = ((nDocs + 1).toDouble / (df(t) + 1).toDouble) *
        ((tfMap((id, t)).toDouble * 2.2) /
          (tfMap((id, t)).toDouble + 1.2 * (0.25 + 0.75 * (dl(id).toDouble / avgdl))))
      assert(r.getAs[Double]("score") == want, s"bm25 arithmetic drifted for ($t, $id)")
    }
    // per term: ranks are 1..k and scores non-increasing in rank order
    rows.groupBy(_.getAs[String]("term")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length).toSeq)
      sorted.map(_.getAs[Double]("score")).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ => ()
      }
    }
    res.unpersist()
  }

  test("text_inverted_index: df/cf conservation, postings digest matches a driver sum") {
    val res = TextAnalysis.textInvertedIndex(spark, sfDir).cache()
    val rows = res.collect()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.trim.split("\\s+").toSeq).toMap
    // Σcf over terms = total corpus tokens; df <= cf per term
    assert(rows.map(_.getAs[Long]("cf")).sum == docs.values.map(_.size.toLong).sum)
    rows.foreach(r => assert(r.getAs[Long]("df") <= r.getAs[Long]("cf")))
    def h40(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:ii".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(10), 16)
    }
    val postings = docs.toSeq.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("term"); val ps = postings(t)
      assert(r.getAs[Long]("df") == ps.size.toLong)
      assert(r.getAs[Long]("doc_min") == ps.min && r.getAs[Long]("doc_max") == ps.max)
      assert(r.getAs[Long]("postings_sum") == ps.map(h40).sum,
        s"postings digest drifted for term $t")
    }
    assert(rows.map(_.getAs[String]("term")).toSet == postings.keySet)
    res.unpersist()
  }

  test("text_perplexity: hand-computed bits on a tiny corpus") {
    import spark.implicits._
    // corpus: counts a=3 b=1 c=1 → N=5, V=3, N+V=8=2^3
    //   doc 1 [a a b]: bits = 3 − (2·ln4 + ln2)/(3·ln2) = 4/3
    //   doc 2 [a c]  : bits = 3 − (ln4 + ln2)/(2·ln2)   = 3/2
    val d = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.perplexityFromDocs(d)
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    val r1 = got(0); val r2 = got(1)
    assert(r1.getAs[Long]("n_tokens") == 3 && r1.getAs[Long]("n_distinct") == 2)
    assert(r2.getAs[Long]("n_tokens") == 2 && r2.getAs[Long]("n_distinct") == 2)
    assert(math.abs(r1.getAs[Double]("bits") - 4.0 / 3.0) < 1e-12)
    assert(math.abs(r2.getAs[Double]("bits") - 1.5) < 1e-12)
    // lower-bits doc ranks into the earlier tercile
    assert(r1.getAs[Int]("tercile") == 1 && r2.getAs[Int]("tercile") == 2)
  }

  test("text_perplexity: one row per doc, balanced terciles, rank-consistent") {
    val res = TextAnalysis.textPerplexity(spark, sfDir).cache()
    val n = Tables.documents(spark, sfDir).count()
    assert(res.count() == n)
    // floor((rk-1)·3/n)+1 splits |tercile sizes| within 1 of each other
    val sizes = res.groupBy("tercile").count()
      .collect().map(r => r.getAs[Int]("tercile") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1)
    // tercile is monotone in (bits, doc_id): max of tercile t sorts
    // strictly before min of tercile t+1
    val rows = res.select("bits", "doc_id", "tercile").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getInt(2)))
    val byT = rows.groupBy(_._3)
    for (t <- Seq(1, 2)) {
      val hi = byT(t).map(r => (r._1, r._2)).max
      val lo = byT(t + 1).map(r => (r._1, r._2)).min
      assert(Ordering[(Double, Long)].lt(hi, lo), s"tercile $t overlaps ${t + 1}")
    }
    res.unpersist()
  }

  test("text_pmi: canonical pairs, window bounds, pair conservation, pmi from integers") {
    val rows = TextAnalysis.textPmi(spark, sfDir).collect()
    assert(rows.length == 50, "top-K cut drifted")
    val keys = rows.map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    assert(keys.distinct.length == keys.length, "duplicate pairs")
    val docs = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+", -1).length.toLong)
    val mPairs = docs.map(n => math.max(0L, n - 1) + math.max(0L, n - 2)).sum
    val nTokens = docs.sum
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
      assert(a <= b, "pair not canonicalized")
      assert(r.getAs[Long]("m_pairs") == mPairs, "windowed pair total drifted")
      assert(r.getAs[Long]("n_tokens") == nTokens, "token total drifted")
      val (cab, ca, cb) = (r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"))
      // each occurrence of a token joins at most 2W = 4 window pairs
      assert(cab <= 4 * math.min(ca, cb), s"window bound violated for ($a,$b)")
      // pmi is a pure function of the emitted exact integers
      val want = math.log(cab.toDouble * nTokens.toDouble * nTokens.toDouble /
        (mPairs.toDouble * ca.toDouble * cb.toDouble))
      assert(math.abs(r.getAs[Double]("pmi") - want) <=
        1e-9 * math.max(1.0, math.abs(want)), s"pmi drifted for ($a,$b)")
    }
    val again = TextAnalysis.textPmi(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("text_ccnet: per-language LM bits and terciles match a driver recompute") {
    import spark.implicits._
    // the sf0.001 corpus is monolingual — inject documents in the
    // other marker languages so the PER-LANGUAGE semantics (separate
    // LM, separate terciles) are actually exercised
    val injected = Seq(
      (-1L, "le chat est sur la table et le chien est pour une la les de un"),
      (-2L, "la table est pour le chat et les chiens de la maison est une place"),
      (-3L, "le vin et le pain pour la table les amis de une soiree est bon"),
      (-4L, "der hund und die katze ist nicht ein eine mit von der die das und"),
      (-5L, "das haus ist mit der katze und die hunde von ein eine nicht da"),
      (-6L, "die sonne und der mond ist das licht mit von ein eine nicht hier"),
      (-7L, "el perro y los gatos es un una que por para el los las y es"),
      (-8L, "las casas y el sol es para los gatos que un una por el dia"),
      (-9L, "汉字文本分析 语言识别测试 数据处理"),
      (-10L, "中文文档去重 模型训练语料 质量评估"))
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "text")
      .union(injected.toDF("doc_id", "text"))
    val res = TextAnalysis.ccnetFromDocs(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4), r.getString(5)))
    val docs = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(res.length == docs.length)
    assert(res.map(_._2).distinct.length > 1, "corpus must exercise >1 language")
    // independent driver-side language ID: the langid marker regexes
    // replicated verbatim, max count with earliest-marker tie-break
    val markers = Seq(
      "en" -> "\\b(the|and|of|is|to|in|that|it|was|for)\\b",
      "fr" -> "\\b(le|la|les|et|de|un|une|est|que|pour)\\b",
      "de" -> "\\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\\b",
      "es" -> "\\b(el|los|las|y|es|un|una|que|por|para)\\b",
      "zh" -> "[\\x{4e00}-\\x{9fff}]")
    def predLang(text: String): String = {
      val scores = markers.map { case (l, re) =>
        l -> re.r.findAllMatchIn(text.toLowerCase).size }
      val mx = scores.map(_._2).max
      scores.find(_._2 == mx).get._1
    }
    val langs = docs.map { case (id, t) => id -> predLang(t) }.toMap
    val toks = docs.map { case (id, t) =>
      (id, t.trim.toLowerCase.split("\\s+").toSeq) }.toMap
    // per-language add-one unigram LM, recomputed on the driver
    val bitsByDoc = docs.groupBy { case (id, _) => langs(id) }
      .iterator.flatMap { case (_, ds) =>
        val c = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        ds.foreach { case (id, _) => toks(id).foreach(t => c(t) += 1) }
        val nTotal = c.values.sum
        val v = c.size
        ds.map { case (id, _) =>
          val tf = toks(id).groupBy(identity).view.mapValues(_.size).toMap
          val sumlog = tf.map { case (t, f) =>
            f.toDouble * math.log(c(t) + 1.0) }.sum
          id -> ((math.log(nTotal.toDouble + v.toDouble) -
            sumlog / toks(id).size) / math.log(2.0))
        }
      }.toMap
    res.foreach { case (id, lang, nTok, bits, _, _) =>
      assert(lang == langs(id), s"doc $id lang $lang vs ${langs(id)}")
      assert(nTok == toks(id).size)
      val exp = bitsByDoc(id)
      assert(math.abs(bits - exp) <= 1e-9 * math.max(1.0, math.abs(exp)),
        s"doc $id bits $bits vs $exp")
    }
    // tercile + action re-derived from the EMITTED bits, per language
    res.groupBy(_._2).foreach { case (lang, g) =>
      val sorted = g.sortBy(r => (r._4, r._1))
      val n = sorted.length
      sorted.zipWithIndex.foreach { case ((id, _, _, _, terc, action), i) =>
        val expT = (math.floor(i.toDouble * 3 / n) + 1).toInt
        assert(terc == expT, s"[$lang] doc $id tercile $terc vs $expT")
        val expA = expT match {
          case 1 => "keep"; case 2 => "resample"; case _ => "drop" }
        assert(action == expA)
      }
    }
  }

  test("mm_phash_clusters: labels equal a driver-local union-find closure") {
    val pairs = Multimodal.mmPhash(spark, sfDir).filter(col("is_dup"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect()
      .map(_.getLong(0))
    // min-label union-find: attaching the larger root under the
    // smaller keeps every root the component minimum
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Multimodal.mmPhashClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "cluster labels diverged from the local closure")
    if (pairs.nonEmpty)
      assert(got.values.toSet.size < ids.length, "pairs present but no merge")
  }
}
