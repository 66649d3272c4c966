package graft

import org.apache.spark.sql.functions._

import graft.functions.Chunker
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("chunker: deterministic, covers input, respects min/max") {
    val text = ("the quick brown fox jumps over the lazy dog " * 30).trim
    val c1 = Chunker.chunkText(text)
    val c2 = Chunker.chunkText(text)
    assert(c1 == c2)
    assert(c1.map(_.length).sum == text.getBytes("UTF-8").length)
    assert(c1.head.offset == 0)
    c1.sliding(2).foreach {
      case Seq(a, b) => assert(b.offset == a.offset + a.length)
      case _ =>
    }
    c1.dropRight(1).foreach(c => assert(c.length >= 32 && c.length <= 256))
    // repeating content must produce repeated chunk hashes (the whole
    // point of content-defined chunking — reference encoder.c:825)
    assert(c1.map(_.chunk_sha).distinct.size < c1.size)
  }

  test("chunker: identical tails chunk identically after an edit (CDC property)") {
    val r = new scala.util.Random(7)
    val base = Seq.fill(300)(r.alphanumeric.take(r.nextInt(8) + 2).mkString).mkString(" ")
    val edited = "XXX" + base
    val a = Chunker.chunkText(base).map(_.chunk_sha)
    val b = Chunker.chunkText(edited).map(_.chunk_sha)
    // all but a bounded prefix of chunks survive the edit
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("dedup_exact: finds injected duplicates") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val dups = docs.limit(5).withColumn("doc_id", col("doc_id") + 1000000)
    docs.union(dups).createOrReplaceTempView("docs_with_dups")
    val res = spark.table("docs_with_dups")
      .groupBy(sha2(col("text").cast("binary"), 256).as("content_sha"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    assert(res.filter($"n_copies" >= 2).count() == 5)
    // and on the pristine table every doc is unique
    val base = Dedup.dedupExact(spark, sfDir)
    assert(base.filter($"n_copies" > 1).count() == 0)
    assert(base.count() == docs.count())
  }

  test("dedup_minhash: near-identical docs collide and verify high") {
    val res = Dedup.dedupMinhash(spark, sfDir).cache()
    assert(res.count() > 0)
    // every reported jaccard is in [0,1]
    assert(res.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    // banding with r=8 should surface the very-similar pairs: every
    // pair with jaccard >= 0.9 per exact computation must be found
    val exact = Dedup.dedupNgramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.9)
    val found = res.filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")
    val missed = exact.select("doc_a", "doc_b").except(found).count()
    assert(missed == 0, s"minhash missed $missed same-source pairs with J>=0.9")
    res.unpersist()
  }

  test("dedup_minhash: shared signature store equals fresh computation") {
    // dedup_minhash now probes the session-scoped parquet signature
    // store; this recomputes the pair table from scratch (tokenize →
    // sign → band → verify, the pre-store formulation) and demands
    // identical output — pinning the parquet round trip (element
    // nullability re-tightening, fingerprint keying) as an identity
    val fromStore = Dedup.dedupMinhash(spark, sfDir)
      .select("doc_a", "doc_b", "jaccard")
    val par = spark.sparkContext.defaultParallelism
    val fresh = Dedup.minhashPairs(
        Dedup.hashSetsOf(Tables.documents(spark, sfDir), par).localCheckpoint(true))
      .select("doc_a", "doc_b", "jaccard")
    assert(fromStore.exceptAll(fresh).isEmpty && fresh.exceptAll(fromStore).isEmpty,
      "signature-store path diverged from fresh computation")
  }

  test("dedup_ngram_jaccard: shared edge store equals fresh computation") {
    // the five edge-list consumers (ngram_jaccard, clusters, hubs,
    // pagerank, triangles) now read a session-scoped parquet store;
    // recompute the edge list from scratch and demand identity
    val fromStore = Dedup.dedupNgramJaccard(spark, sfDir)
    val fresh = Dedup.dedupNgramJaccardFresh(spark, sfDir)
    assert(fromStore.exceptAll(fresh).isEmpty && fresh.exceptAll(fromStore).isEmpty,
      "edge-store path diverged from fresh computation")
  }

  test("dedup_simhash: candidates carry correct hamming bound") {
    val res = Dedup.dedupSimhash(spark, sfDir).cache()
    assert(res.count() > 0)
    assert(res.filter(col("hamming") < 0 || col("hamming") > 64).count() == 0)
    // band collision guarantees at least one 16-bit block equal →
    // hamming <= 48 always
    assert(res.filter(col("hamming") > 48).count() == 0)
    res.unpersist()
  }

  test("dedup_embedding: pairs carry exact cosine in [-1,1]") {
    val res = Dedup.dedupEmbedding(spark, sfDir).cache()
    assert(res.count() > 0)
    assert(res.filter(col("cos") > 1.000001 || col("cos") < -1.000001).count() == 0)
    res.unpersist()
  }

  test("dedup_restore: every document round-trips byte-exactly") {
    val res = Dedup.dedupRestore(spark, sfDir)
    assert(res.filter(col("restored_ok") =!= 1).count() == 0)
    assert(res.count() == Tables.documents(spark, sfDir).count())
  }

  test("dedup_chunk_check: chunks cover every document contiguously") {
    val res = Dedup.dedupChunkCheck(spark, sfDir).cache()
    assert(res.filter(col("covered_ok") =!= 1).count() == 0)
    val withDocs = res.join(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).as("len")),
      "doc_id")
    assert(withDocs.filter(col("n_bytes") =!= col("len")).count() == 0)
    res.unpersist()
  }

  test("dedup_chunk_stats chunks ONCE (single graft_chunk Generate in the plan)") {
    // r7 forked the chunk table into per-sha and totals branches,
    // re-running the chunk Generator for each; the single-aggregate
    // formulation must keep exactly one Generator in the plan
    val plan = Dedup.dedupChunkStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("graft_chunk\\(".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  test("chunk value-oracle precondition: the test corpus is ASCII") {
    // dedup_chunk's DuckDB oracle addresses chunk bytes with
    // CHARACTER-based substr over byte offsets — valid only while
    // every document is single-byte. The oracle itself now emits a
    // loud sentinel on non-ASCII docs; this pins the precondition so
    // a future multi-byte corpus fails here first, with the reason.
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii non-ASCII documents: dedup_chunk's character-substr oracle would misaddress chunk bytes")
  }

  test("chunk stats and compress are consistent") {
    val stats = Dedup.dedupChunkStats(spark, sfDir).collect().head
    assert(stats.getAs[Long]("n_chunks") >= stats.getAs[Long]("n_unique_chunks"))
    assert(stats.getAs[Long]("total_bytes") >= stats.getAs[Long]("unique_bytes"))
    val comp = Dedup.chunkCompress(spark, sfDir).cache()
    assert(comp.count() == stats.getAs[Long]("n_unique_chunks"))
    assert(comp.filter(col("comp_deflate") <= 0 || col("comp_gzip") <= 0 ||
      col("comp_bzip2") <= 0).count() == 0)
    // gzip = deflate stream + 18 bytes of framing, always
    assert(comp.filter(col("comp_gzip") <= col("comp_deflate")).count() == 0)
    // bzip2 is a hash-prefix SAMPLE (1/16 of unique chunks): sampled
    // rows (chunk_sha starting '0') carry a positive size, every other
    // row is NULL — deterministic, so re-runs sample identically
    val sampled = comp.filter(substring(col("chunk_sha"), 1, 1) === "0")
    assert(sampled.count() > 0)
    assert(sampled.filter(col("comp_bzip2").isNull || col("comp_bzip2") <= 0)
      .count() == 0)
    assert(comp.filter(substring(col("chunk_sha"), 1, 1) =!= "0" &&
      col("comp_bzip2").isNotNull).count() == 0)
    // every codec's ratio column recomputes from its own size column
    assert(comp.filter(abs(col("ratio_bzip2") -
      col("comp_bzip2").cast("double") / col("orig_len").cast("double")) > 1e-12)
      .count() == 0)
    comp.unpersist()
  }

  test("dedup_exact_bucketed: equals dedup_exact with a shuffle-free agg plan") {
    val bucketed = Dedup.dedupExactBucketed(spark, sfDir)
    val plain = Dedup.dedupExact(spark, sfDir)
    assert(bucketed.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    // the whole point: the aggregation runs WITHOUT a shuffle because
    // the bucketed scan already hash-partitions on the group key
    val shuffles = bucketed.queryExecution.executedPlan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"bucketed dedup must not shuffle, found: ${shuffles.map(_.nodeName)}")
  }

  test("emitted near-dup VALUES recompute from raw text on the driver") {
    // end-to-end value check, independent of TextFns and every native
    // kernel: tokenize + hash + jaccard/simhash reimplemented here
    // from first principles (catalyst's XXH64 statics, driver Set
    // ops), applied to the pairs the operators actually emitted
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val text = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Set[Long] =
      t.trim.toLowerCase.split("\\s+").distinct
        .map(w => XXH64.hashUTF8String(UTF8String.fromString(w), 42L)).toSet
    def jac(a: Set[Long], b: Set[Long]): Double = {
      val u = (a ++ b).size
      if (u == 0) 0.0 else a.intersect(b).size.toDouble / u
    }
    val mh = Dedup.dedupMinhash(spark, sfDir).collect()
    assert(mh.nonEmpty)
    mh.foreach { r =>
      val want = jac(toks(text(r.getAs[Long]("doc_a"))),
        toks(text(r.getAs[Long]("doc_b"))))
      assert(r.getAs[Double]("jaccard") == want,
        s"minhash pair (${r.get(0)},${r.get(1)}) jaccard drifted")
    }
    def simhash(a: Set[Long]): Long = {
      var out = 0L
      for (b <- 0 until 64)
        if (a.iterator.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum > 0)
          out |= (1L << b)
      out
    }
    val sh = Dedup.dedupSimhash(spark, sfDir).collect()
    assert(sh.nonEmpty)
    sh.foreach { r =>
      val want = java.lang.Long.bitCount(
        simhash(toks(text(r.getAs[Long]("doc_a")))) ^
          simhash(toks(text(r.getAs[Long]("doc_b")))))
      assert(r.getAs[Int]("hamming") == want,
        s"simhash pair (${r.get(0)},${r.get(1)}) hamming drifted")
    }
  }

  test("emitted embedding near-dup cosines recompute from raw vectors") {
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val pairs = Dedup.dedupEmbedding(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val want = cos(vecs(r.getAs[Long]("vec_a")), vecs(r.getAs[Long]("vec_b")))
      assert(math.abs(r.getAs[Double]("cos") - want) < 1e-9,
        s"pair (${r.get(0)},${r.get(1)}): ${r.getAs[Double]("cos")} vs $want")
    }
  }

  test("near-dup output invariant under corpus duplication (rep layering)") {
    // every doc copied d x with fresh higher ids: the representative
    // layer (exact-dedup-before-near-dup) must make the near-dup pair
    // set IDENTICAL to the pristine corpus — no d^2 re-finds
    import org.apache.spark.sql.functions.lit
    val d = 10
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val dup = (0 until d).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
      .reduce(_ union _)
    val par = spark.sparkContext.defaultParallelism
    def pairs(docs: org.apache.spark.sql.DataFrame) =
      Dedup.minhashPairs(Dedup.hashSetsOf(docs, par).localCheckpoint(true))
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pristine = pairs(base)
    val duplicated = pairs(dup)
    assert(duplicated == pristine,
      s"duplication changed near-dup output: +${duplicated.diff(pristine).size} -${pristine.diff(duplicated).size}")
  }

  test("verifyJaccard: shuffle path (cap=0) matches broadcast path") {
    import graft.functions.TextFns
    val g = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"),
      TextFns.hashedTokenSet(col("text")).as("hset"))
    val ids = g.select("doc_id", "source")
    val cand = ids.as("a").join(ids.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val sets = g.select("doc_id", "hset")
    val bc = Dedup.verifyJaccard(cand, sets).filter(col("jaccard") >= 0.5)
    val sh = Dedup.verifyJaccard(cand, sets, cap = 0L).filter(col("jaccard") >= 0.5)
    assert(bc.except(sh).count() == 0 && sh.except(bc).count() == 0)
    assert(sh.count() > 0)
  }

  test("dedup_chunk_sweep: finer granularity yields more, smaller chunks") {
    val rows = Dedup.dedupChunkSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("mask_bits"))
    assert(rows.length == 3)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("dedup_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      val mean = r.getAs[Double]("mean_chunk_len")
      assert(mean >= 1.0 && mean <= r.getAs[Int]("max_size").toDouble)
    }
    val byBits = rows.map(r => r.getAs[Long]("n_chunks"))
    assert(byBits(0) >= byBits(1) && byBits(1) >= byBits(2),
      s"chunk counts not monotone in granularity: ${byBits.toSeq}")
    // the (32,256,6) cell is the DEFAULT granularity — it must agree
    // column-for-column with dedup_chunk_stats, whose every value is
    // DuckDB-oracled (recomputed from the value-oracled chunk dump):
    // the sweep's middle row is thereby cross-engine-verified too
    val mid = rows.find(r => r.getAs[Int]("min_size") == 32 &&
      r.getAs[Int]("max_size") == 256 && r.getAs[Int]("mask_bits") == 6)
      .getOrElse(fail("sweep grid lost the default-granularity cell"))
    val stats = Dedup.dedupChunkStats(spark, sfDir).collect().head
    stats.schema.fieldNames.foreach { f =>
      assert(mid.getAs[Any](f) == stats.getAs[Any](f),
        s"sweep default cell disagrees with oracled stats on $f")
    }
  }

  test("dedup_minhash_sweep: recall/candidate counts follow the S-curve") {
    val rows = Dedup.dedupMinhashSweep(spark, sfDir).collect()
      .sortBy(-_.getAs[Int]("bands"))
    assert(rows.length == 3)
    // more, shorter bands → S-curve shifts left → more candidates
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    assert(cands(0) >= cands(1) && cands(1) >= cands(2),
      s"candidate counts not monotone in band count: ${cands.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") <= r.getAs[Long]("n_candidates"))
      val p = r.getAs[Double]("precision")
      assert(p >= 0.0 && p <= 1.0)
    }
    // every configuration of the same 128 perms finds the very-similar
    // pairs the default (16x8) banding verifies
    val strong = Dedup.dedupMinhash(spark, sfDir)
      .filter(col("jaccard") >= 0.9).count()
    rows.foreach(r => assert(r.getAs[Long]("n_dups") > 0 || strong == 0))
  }

  test("dedup_banding_pick: no grid cell sits on a 9-dp rounding knife edge (ADVICE r14)") {
    // pCollide rounds Math.pow output HALF_UP to 9 dp while DuckDB
    // rounds libm pow; if a pre-rounding value sat within an ulp of a
    // 5e-10 boundary the two engines could round differently and flip
    // p_collide_* (or a picked flag). Assert every cell is safely
    // distant (> 1e-12) from a boundary and from each recall target,
    // so the grid can never drift onto the knife edge.
    for {
      (b, r) <- Dedup.PickGrid
      sim <- Dedup.PickTargets.map(_._1).distinct :+ 0.3
    } {
      val pre = 1.0 - math.pow(1.0 - math.pow(sim, r.toDouble), b.toDouble)
      // distance to the nearest x.5e-9 HALF_UP boundary, in value units
      val frac = {
        val f = (pre * 1e9) % 1.0
        if (f < 0) f + 1.0 else f
      }
      val boundaryDist = math.abs(frac - 0.5) * 1e-9
      assert(boundaryDist > 1e-12,
        s"cell ($b,$r) at sim=$sim: pre-round value $pre is ${boundaryDist}" +
          " from a 9-dp HALF_UP boundary — cross-engine rounding could flip it")
      // and the rounded value must not sit exactly on a recall target,
      // so the >= pick comparison can't straddle either
      Dedup.PickTargets.map(_._2).distinct.foreach { target =>
        assert(math.abs(Dedup.pCollide(sim, b, r) - target) > 1e-12,
          s"cell ($b,$r) at sim=$sim equals recall target $target")
      }
    }
  }

  test("dedup_banding_pick: analytic curve exact, picks are the fewest-bands qualifying cells") {
    val rows = Dedup.dedupBandingPick(spark, sfDir).collect()
    assert(rows.length == Dedup.PickTargets.size * Dedup.PickGrid.size)
    // the analytic columns ARE the formula (both engines recompute it;
    // this pins the Spark side against a direct evaluation)
    rows.foreach { r =>
      val (tau, b, rb) = (r.getAs[Double]("target_tau"),
        r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))
      assert(b * rb == 128, s"grid cell not a 128-perm split: ($b, $rb)")
      assert(r.getAs[Double]("p_collide_tau") == Dedup.pCollide(tau, b, rb))
      assert(r.getAs[Double]("p_collide_low") == Dedup.pCollide(0.3, b, rb))
    }
    // P is monotone in bands at fixed b·r, so the qualifying set is a
    // bands-suffix and each target picks its FEWEST-bands member —
    // exactly one pick per target unless nothing qualifies
    Dedup.PickTargets.foreach { case (tau, target) =>
      val cells = rows.filter(r => r.getAs[Double]("target_tau") == tau &&
        r.getAs[Double]("target_recall") == target)
      val picked = cells.filter(_.getAs[Boolean]("picked"))
      val qualifying = cells.filter(_.getAs[Double]("p_collide_tau") >= target)
      if (qualifying.isEmpty) assert(picked.isEmpty)
      else {
        assert(picked.length == 1, s"($tau,$target): ${picked.length} picks")
        assert(picked.head.getAs[Int]("bands") ==
          qualifying.map(_.getAs[Int]("bands")).min)
      }
    }
    // the production default's own target: τ=0.9 picks (16, 8)
    val prod = rows.find(r => r.getAs[Double]("target_tau") == 0.9 &&
      r.getAs[Boolean]("picked")).get
    assert(prod.getAs[Int]("bands") == 16 && prod.getAs[Int]("rows_per_band") == 8)
    // measured validation cells ride along and equal the sweep's
    val sweep = Dedup.dedupMinhashSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val withMeasured = rows.filter(r => !r.isNullAt(r.fieldIndex("n_candidates")))
    assert(withMeasured.map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))).toSet
      == sweep.keySet)
    withMeasured.foreach { r =>
      val k = (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))
      assert((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_dups")) == sweep(k))
      // measured recall (vs the full-budget dup universe) validates
      // the curve: every dup pair has jaccard ≥ 0.7, and P only rises
      // with s, so the τ=0.7 analytic value is a per-pair floor —
      // the floor claim only holds for the τ=0.7 target rows
      val d16 = sweep((16, 8))._2
      if (d16 > 0 && r.getAs[Double]("target_tau") == 0.7)
        assert(r.getAs[Long]("n_dups").toDouble / d16 >=
          r.getAs[Double]("p_collide_tau") - 1e-9)
    }
  }

  test("dedup_minhash_sweep: no base band bucket reaches the cap at test SF") {
    // the sweep derives longer-band cells from base-band collisions;
    // that derivation is exact as long as no base bucket is dropped by
    // the MaxBucket guard (see the cap-semantics note in the operator)
    import graft.functions.NativeHash
    val hs = Dedup.hashSetsOf(
      Tables.documents(spark, sfDir),
      spark.sparkContext.defaultParallelism)
    val sig = hs.select(col("doc_id"), NativeHash.minhashSig(col("hset"), 128).as("sig"))
    val maxBucket = sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => xxhash64(slice(col("sig"), b * 8 + 1, lit(8))))))
      .toDF("doc_id", "band", "bh")
      .groupBy("band", "bh").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxBucket <= Dedup.MaxBucket,
      s"base bucket of $maxBucket exceeds the cap — derived sweep cells would diverge from direct banding")
  }

  test("dedup_minhash_sweep: (16,8) cell is differentially equal to dedup_minhash") {
    // the shared-verify refactor (one exact-Jaccard join over the
    // distinct pair union instead of one per cell) must not change any
    // cell's numbers — the production-default cell is provable against
    // the standalone operator
    val cell = Dedup.dedupMinhashSweep(spark, sfDir).collect()
      .find(r => r.getAs[Int]("bands") == 16).get
    val mh = Dedup.dedupMinhash(spark, sfDir).cache()
    assert(cell.getAs[Long]("n_candidates") == mh.count())
    assert(cell.getAs[Long]("n_dups") == mh.filter(col("jaccard") >= 0.7).count())
    mh.unpersist()
  }

  test("dedup_incremental: classifies store-dup, batch-dup, and new docs") {
    import spark.implicits._
    // pristine corpus: content is unique, so every batch doc is new
    Dedup.incrementalFromDocs(Tables.documents(spark, sfDir)).collect()
      .foreach { r =>
        assert(r.getAs[Long]("n_dup_store") == 0)
        assert(r.getAs[Long]("n_dup_batch") == 0)
        assert(r.getAs[Long]("n_batch") == r.getAs[Long]("n_new_unique"))
      }
    // injected corpus exercising all three classes — batch membership
    // depends only on md5(doc_id:inc), recomputed here to pick ids
    def isBatch(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:inc".getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.charAt(0) >= 'c'
    }
    val storeId = (0L to 100L).find(id => !isBatch(id)).get
    val Seq(b1, b2, b3) = (0L to 200L).filter(isBatch).take(3).toSeq
    val injected = Seq(
      (storeId, "shared with store", "x"),
      (b1, "shared with store", "x"), // duplicate of the store
      (b2, "fresh content", "x"),     // first occurrence in the batch
      (b3, "fresh content", "x"))     // duplicate within the batch
      .toDF("doc_id", "text", "source")
    val r = Dedup.incrementalFromDocs(injected).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_batch") == 3)
    assert(r.head.getAs[Long]("n_dup_store") == 1)
    assert(r.head.getAs[Long]("n_dup_batch") == 1)
    assert(r.head.getAs[Long]("n_new_unique") == 1)
  }

  test("dedup_incremental_nd: complete per-rep decision table, reps and best well-formed") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = Dedup.dedupIncrementalNd(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // local re-derivation of the split + rep selection
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val isBatch = (id: Long) => md5hex(s"$id:inc").substring(0, 1) >= "c"
    def repsOf(side: Seq[(Long, String)]): Set[Long] =
      side.groupBy(_._2).map { case (_, ds) => ds.map(_._1).min }.toSet
    val batchReps = repsOf(docs.filter(d => isBatch(d._1)).toSeq)
    val storeReps = repsOf(docs.filterNot(d => isBatch(d._1)).toSeq)
    val storeTexts = docs.filterNot(d => isBatch(d._1)).map(_._2).toSet
    val byText = docs.toMap
    // exactly one row group per batch rep; every emitted id is a rep
    assert(rows.map(_.getAs[Long]("batch_doc")).toSet == batchReps)
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(storeReps.contains(r.getAs[Long]("store_doc")))
    }
    // null-pair rows appear exactly once per no-candidate rep
    val byDoc = rows.groupBy(_.getAs[Long]("batch_doc"))
    byDoc.foreach { case (doc, rs) =>
      val nulls = rs.count(_.isNullAt(1))
      if (rs.length == 1 && nulls == 1) () // no candidates — single null row
      else {
        assert(nulls == 0, s"mixed null/pair rows for $doc")
        // exactly one best, and it carries the max jaccard
        val best = rs.filter(_.getAs[Boolean]("is_best"))
        assert(best.length == 1, s"best not unique for $doc")
        val maxJ = rs.map(_.getAs[Double]("jaccard")).max
        assert(best.head.getAs[Double]("jaccard") == maxJ)
      }
      // is_exact_store matches the local text membership
      val want = storeTexts.contains(byText(doc))
      rs.foreach(r => assert(r.getAs[Boolean]("is_exact_store") == want,
        s"is_exact_store wrong for $doc"))
    }
    // exact store copies (if the corpus has any at this SF) must
    // surface their jaccard-1.0 candidate; the UNCONDITIONAL recall
    // assertion lives in the injected-corpus test below
    batchReps.filter(doc => storeTexts.contains(byText(doc))).foreach { doc =>
      val rs = byDoc(doc)
      assert(rs.exists(r => !r.isNullAt(1) && r.getAs[Double]("jaccard") == 1.0),
        s"exact store copy $doc lost its identical candidate — band probe broken")
    }
  }

  test("dedup_prefix_filter: zero false negatives vs brute force within blocks") {
    val rows = Dedup.dedupPrefixFilter(spark, sfDir).collect()
    val flagged = rows.filter(_.getAs[Boolean]("is_dup"))
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // brute-force ground truth: every same-source pair at jaccard ≥ 0.7
    val d = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").trim.toLowerCase.split("\\s+").toSet))
    val truePairs = (for {
      (ia, sa, ta) <- d; (ib, sb, tb) <- d
      if sa == sb && ia < ib
      j = (ta & tb).size.toDouble / (ta | tb).size.toDouble
      if j >= 0.7
    } yield (ia, ib)).toSet
    assert(truePairs.nonEmpty, "corpus must contain same-source near-dups")
    // the recall GUARANTEE: prefix filtering may not miss one
    assert(truePairs.subsetOf(flagged),
      s"prefix filter missed ${(truePairs -- flagged).take(5)}")
    // and flags are honest: every is_dup pair really is ≥ 0.7 locally
    val byId = d.map(x => x._1 -> x._3).toMap
    flagged.foreach { case (a, b) =>
      val j = (byId(a) & byId(b)).size.toDouble / (byId(a) | byId(b)).size.toDouble
      assert(j >= 0.7, s"false positive flagged: ($a,$b) j=$j")
    }
  }

  test("dedup_containment: matches a local recompute exactly, both directions") {
    val rows = Dedup.dedupContainment(spark, sfDir).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b")))).toMap
    // ground truth from raw text, same tokenization contract
    val d = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").trim.toLowerCase.split("\\s+").toSet))
    val expect = (for {
      (ia, sa, ta) <- d; (ib, sb, tb) <- d
      if sa == sb && ia < ib
      inter = (ta & tb).size.toDouble
      ca = inter / ta.size; cb = inter / tb.size
      if math.max(ca, cb) >= 0.8
    } yield ((ia, ib), (ca, cb))).toMap
    assert(expect.nonEmpty, "corpus must contain containment pairs")
    assert(rows.keySet == expect.keySet,
      s"pair sets differ: +${(rows.keySet -- expect.keySet).take(3)} -${(expect.keySet -- rows.keySet).take(3)}")
    rows.foreach { case (k, (ca, cb)) =>
      assert(math.abs(ca - expect(k)._1) < 1e-12 &&
        math.abs(cb - expect(k)._2) < 1e-12, s"$k: ($ca,$cb) vs ${expect(k)}")
    }
    // the asymmetric point: containment is NOT jaccard — at least one
    // retained pair must be invisible to the 0.7 jaccard gate
    // (a contained-but-much-shorter doc), else this operator is
    // redundant with dedup_ngram_jaccard on this corpus
    val byId = d.map(x => x._1 -> x._3).toMap
    val asym = rows.keys.exists { case (a, b) =>
      val j = (byId(a) & byId(b)).size.toDouble / (byId(a) | byId(b)).size.toDouble
      j < 0.7
    }
    assert(asym, "no asymmetric containment pair found in corpus")
  }

  test("dedup_containment_pf: identical result set to the all-pairs generator") {
    // the production prefix-filtered candidate path carries an EXACT
    // recall guarantee (asymmetric prefix theorem), so after the
    // shared ≥0.8 verify its output must equal the oracled B²
    // block's output row for row — not approximately, identically
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b")))).toMap
    val allPairs = keyed(Dedup.dedupContainment(spark, sfDir))
    val pf = keyed(Dedup.dedupContainmentPf(spark, sfDir))
    assert(pf.keySet == allPairs.keySet,
      s"candidate recall broken: missed=${(allPairs.keySet -- pf.keySet).take(3)} " +
        s"extra=${(pf.keySet -- allPairs.keySet).take(3)}")
    pf.foreach { case (k, v) =>
      assert(v == allPairs(k), s"$k: $v vs ${allPairs(k)}")
    }
    assert(pf.nonEmpty, "corpus must contain containment pairs")
  }

  test("dedup_incremental_nd: injected corpus — probe recall is unconditional") {
    import spark.implicits._
    // ids chosen against the md5 ':inc' rule: 1,2,4 are batch; 3,5 store
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = ((1 to 39).map(i => s"w$i") :+ "w99").mkString(" ")
    val other = (101 to 140).map(i => s"v$i").mkString(" ")
    val novel = (201 to 240).map(i => s"u$i").mkString(" ")
    val injected = Seq(
      (3L, base), (5L, other),           // store
      (1L, base), (2L, near), (4L, novel)) // batch
      .toDF("doc_id", "text")
    val rows = Dedup.incrementalNdFromDocs(injected).collect()
      .groupBy(_.getAs[Long]("batch_doc"))
    // identical content ⇒ identical signature ⇒ every band collides:
    // the probe MUST find it (this catches a scrambled/degenerate band
    // table, which the echo oracle cannot — absence is LSH-internal)
    val r1 = rows(1L)
    assert(r1.exists(r => !r.isNullAt(1) &&
      r.getAs[Long]("store_doc") == 3L && r.getAs[Double]("jaccard") == 1.0),
      s"exact copy not recalled: ${r1.toSeq}")
    assert(r1.forall(_.getAs[Boolean]("is_exact_store")))
    // near-dup at jaccard 39/41 must recall, flag, and best-match 3
    val r2 = rows(2L)
    val best2 = r2.filter(_.getAs[Boolean]("is_best"))
    assert(best2.length == 1 && best2.head.getAs[Long]("store_doc") == 3L)
    assert(math.abs(best2.head.getAs[Double]("jaccard") - 39.0 / 41.0) < 1e-12)
    assert(best2.head.getAs[Boolean]("is_nd"))
    assert(r2.forall(!_.getAs[Boolean]("is_exact_store")))
    // novel doc: complete-table null row, nothing flagged
    val r4 = rows(4L)
    assert(r4.length == 1 && r4.head.isNullAt(1) &&
      !r4.head.getAs[Boolean]("is_nd") && !r4.head.getAs[Boolean]("is_exact_store"))
  }
}
