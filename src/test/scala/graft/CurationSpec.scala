package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnalyticsExtras, Curation, Dedup, TextAnalysis}

class CurationSpec extends SparkSpec {

  test("dedup_hubs: top-20 degrees match a driver recompute from the pair table") {
    val hubs = Curation.dedupHubs(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_degree"))
    val pairs = graft.operators.Dedup.dedupNgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (d, o) => d -> o.length.toLong }
    val expect = deg.toSeq.sortBy { case (d, n) => (-n, d) }.take(20)
    assert(hubs.toSeq == expect, s"hubs ${hubs.take(3).toSeq}... vs ${expect.take(3)}")
    assert(hubs.nonEmpty && hubs.forall(_._2 >= 1L))
  }

  test("dedup_clusters: labels are component minima and edges never straddle clusters") {
    val labels = Curation.dedupClusters(spark, sfDir)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(labels.count() == nDocs, "every document gets a cluster")
    // every near-dup edge's endpoints share a cluster
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir).select("doc_a", "doc_b")
    val straddling = pairs
      .join(labels.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), "doc_a")
      .join(labels.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(straddling == 0, "edge endpoints must share a cluster")
    // cluster_id is the min doc_id of its members, and is itself a member
    val badMin = labels.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .filter(col("cluster_id") =!= col("mn")).count()
    assert(badMin == 0, "cluster id must be the component minimum")
  }

  test("dedup_clusters: transitive chains collapse into one cluster") {
    import spark.implicits._
    // a->b, b->c but never a->c directly: label propagation must still
    // put all three in one component (this is what the recursive-CTE
    // oracle checks cross-engine; here we assert it structurally)
    val labels = Curation.dedupClusters(spark, sfDir)
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val adj = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    // reference flood fill on the driver
    val lab = scala.collection.mutable.Map[Long, Long]()
    def component(start: Long): Set[Long] = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty[Long])) -- seen
        seen ++= frontier
      }
      seen
    }
    adj.keys.foreach { k =>
      if (!lab.contains(k)) {
        val comp = component(k); val m = comp.min
        comp.foreach(lab(_) = m)
      }
    }
    val got = labels.as[(Long, Long)].collect().toMap
    lab.foreach { case (d, m) =>
      assert(got(d) == m, s"doc $d: expected component min $m, got ${got(d)}")
    }
  }

  test("dedup_clusters_lsh: LSH-edge clustering matches a driver flood fill") {
    import spark.implicits._
    val labels = Curation.dedupClustersLsh(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("sha"))
      .as[(Long, String)].collect()
    assert(labels.count() == docs.length, "every document gets a label")
    // reference edge set on the driver: the banded-LSH near-dup pairs
    // plus member→representative stitching from the content digest —
    // exactly what the production operator feeds clustersFromPairs
    val near = Dedup.dedupMinhash(spark, sfDir).filter(col("is_dup"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val stitch = docs.groupBy(_._2).values.toSeq.flatMap { g =>
      val ids = g.map(_._1); val m = ids.min
      ids.filter(_ != m).map(m -> _)
    }
    val adj = (near ++ stitch).flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val lab = scala.collection.mutable.Map[Long, Long]()
    adj.keys.foreach { k =>
      if (!lab.contains(k)) {
        var seen = Set(k); var frontier = Set(k)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty[Long])) -- seen
          seen ++= frontier
        }
        val m = seen.min
        seen.foreach(lab(_) = m)
      }
    }
    val got = labels.as[(Long, Long)].collect().toMap
    docs.foreach { case (d, _) =>
      val want = lab.getOrElse(d, d) // edge-less docs keep their own label
      assert(got(d) == want, s"doc $d: expected cluster $want, got ${got(d)}")
    }
    // exact copies can never straddle clusters (stitching guarantees it)
    docs.groupBy(_._2).values.foreach { g =>
      assert(g.map(x => got(x._1)).distinct.size == 1,
        "identical-content documents must share a cluster")
    }
  }

  test("dedup_clusters_knn: mutual-kNN clustering matches a driver flood fill") {
    import spark.implicits._
    val labels = Curation.dedupClustersKnn(spark, sfDir)
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id").as[Long].collect()
    assert(labels.count() == vecs.length, "every vector gets a label")
    // reference edge set on the driver: the MUTUAL kNN edges — exactly
    // what the production operator feeds clustersFromPairs
    val mutual = graft.operators.Similarity.annKnnGraph(spark, sfDir)
      .filter(col("is_mutual") && col("query_id") < col("vec_id"))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    val adj = mutual.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val lab = scala.collection.mutable.Map[Long, Long]()
    adj.keys.foreach { k =>
      if (!lab.contains(k)) {
        var seen = Set(k); var frontier = Set(k)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty[Long])) -- seen
          seen ++= frontier
        }
        val m = seen.min
        seen.foreach(lab(_) = m)
      }
    }
    val got = labels.as[(Long, Long)].collect().toMap
    vecs.foreach { v =>
      val want = lab.getOrElse(v, v) // edge-less vectors keep their own label
      assert(got(v) == want, s"vec $v: expected cluster $want, got ${got(v)}")
    }
    // mutuality filter is real: at least one one-directional edge was
    // dropped, and clusters are strictly coarser than singletons
    assert(got.values.toSet.size < vecs.length, "kNN graph produced no merges")
    // determinism: a second invocation yields identical labels
    val again = Curation.dedupClustersKnn(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(again == got, "dedup_clusters_knn is not deterministic")
  }

  test("dedup_semantic_knn: keeps are cluster hubs, weights carry mass 1 per cluster") {
    import spark.implicits._
    val rows = Curation.dedupSemanticKnn(spark, sfDir).collect()
    val labels = Curation.dedupClustersKnn(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(rows.length == labels.size, "every labeled vector gets a decision row")
    val mutual = graft.operators.Similarity.annKnnGraph(spark, sfDir)
      .filter(col("is_mutual") && col("query_id") < col("vec_id"))
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    val deg = mutual.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (v, o) => v -> o.length.toLong }
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.keySet == labels.values.toSet)
    byCluster.foreach { case (cid, rs) =>
      val size = rs.head.getAs[Long]("cluster_size")
      assert(rs.length == size, s"cluster_size drifted for $cid")
      // every member carries the recomputed degree and weight 1/size
      rs.foreach { r =>
        val v = r.getAs[Long]("vec_id")
        assert(labels(v) == cid)
        assert(r.getAs[Long]("degree") == deg.getOrElse(v, 0L), s"degree drifted for $v")
        assert(math.abs(r.getAs[Double]("weight") - 1.0 / size) < 1e-15)
      }
      assert(math.abs(rs.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
      // exactly one keep: the (max degree, min vec_id) hub
      val keeps = rs.filter(_.getAs[Boolean]("keep"))
      assert(keeps.length == 1, s"cluster $cid kept ${keeps.length}")
      val hub = rs.map(r => (-r.getAs[Long]("degree"), r.getAs[Long]("vec_id"))).min._2
      assert(keeps.head.getAs[Long]("vec_id") == hub, s"cluster $cid kept a non-hub")
      // a mutual edge inside the cluster implies positive degree on both ends
      if (size > 1) assert(rs.forall(_.getAs[Long]("degree") >= 1),
        s"multi-member cluster $cid has an edge-less member")
    }
    // mass conservation corpus-wide: Σweight = #clusters
    val total = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - byCluster.size) < 1e-6)
  }

  test("clustersFromPairs: no edges → every node is its own cluster") {
    import spark.implicits._
    val nodes = Seq(5L, 9L, 2L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Curation.clustersFromPairs(nodes, noPairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 9L -> 9L, 2L -> 2L))
  }

  test("clustersFromPairs: a long path graph collapses to the chain minimum") {
    // deterministic multi-round case (ADVICE r13): the sf corpora
    // happen to produce star-shaped duplicate clusters that converge
    // in one hook round, so nothing exercised the pointer-doubling
    // shortcut branch (round >= 1). A 33-node path graph contracts to
    // a 32-node path whose diameter forces several hook+shortcut
    // rounds — a regression in the self-join composition (wrong key,
    // lost coalesce, non-monotone label) cannot collapse it to the
    // single label this asserts.
    import spark.implicits._
    val n = 33
    val nodes = (1 to n).map(_.toLong).toDF("doc_id")
    val chain = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val got = Curation.clustersFromPairs(nodes, chain)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (1 to n).map(_.toLong).toSet)
    assert(got.values.toSet == Set(1L), s"expected one cluster rooted at 1, got ${got.values.toSet}")
  }

  test("dedup_weights: mass 1 per cluster, ranks a permutation, Σweight = #clusters") {
    val rows = Curation.dedupWeights(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rs) =>
      val size = rs.head.getAs[Long]("cluster_size")
      assert(rs.length == size, s"cluster_size drifted for $cid")
      // each cluster carries total sampling mass exactly 1
      assert(math.abs(rs.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
      // ranks are the permutation 1..size
      assert(rs.map(_.getAs[Long]("dup_rank")).sorted.toSeq ==
        (1L to size).toSeq)
    }
    val sumW = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(sumW - byCluster.size) < 1e-6,
      "Σweight must equal the number of clusters (effective corpus size)")
  }

  test("dedup_canonical: picks the highest-quality member of each cluster") {
    val canon = Curation.dedupCanonical(spark, sfDir)
    val labels = Curation.dedupClusters(spark, sfDir)
    assert(canon.count() == labels.select("cluster_id").distinct().count())
    // canonical quality is the cluster max
    val quality = graft.Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
    val maxQ = labels.join(quality, "doc_id")
      .groupBy("cluster_id").agg(max("q").as("max_q"))
    val mismatch = canon.join(maxQ, "cluster_id")
      .filter(col("canon_quality") < col("max_q")).count()
    assert(mismatch == 0, "canonical doc must have the cluster's max quality")
    // members count reconciles
    val total = canon.agg(sum("n_members")).first().getLong(0)
    assert(total == labels.count())
  }

  test("text_pipeline: funnel counts are consistent per source") {
    val r = Curation.textPipeline(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_docs")
      val q = row.getAs[Long]("n_quality")
      val e = row.getAs[Long]("n_lang_en")
      val k = row.getAs[Long]("n_kept")
      val u = row.getAs[Long]("n_unique_kept")
      assert(q <= n && e <= n && k <= math.min(q, e) && u <= k,
        s"inconsistent funnel: $row")
    }
  }

  test("dedup_embedding_exact ⊇ sampled LSH pairs; nd_recall in [0,1]") {
    val exact = Curation.dedupEmbeddingExact(spark, sfDir)
    assert(exact.filter(col("cos") < 0.4).count() == 0)
    val rec = Curation.dedupNdRecall(spark, sfDir).collect().head
    val (nExact, nHit, recall) = (rec.getAs[Long]("n_exact"),
      rec.getAs[Long]("n_hit"), rec.getAs[Double]("recall"))
    assert(nHit <= nExact)
    assert(recall >= 0.0 && recall <= 1.0)
    // HARD floor on the near-dup quality gate (not just range
    // well-formedness): the banded-LSH candidate path must keep
    // finding the exact baseline's pairs — a broken minhash seed or
    // banding split would sail through every structural check. The
    // floor is a collapse detector with ~30% headroom below the
    // shipped banding's measured 0.53 at this SF; a broken seed → ~0.
    info(f"nd recall $recall%.3f ($nHit/$nExact)")
    assert(nExact == 0 || recall >= 0.35,
      s"near-dup recall floor breached: $recall < 0.35 ($nHit/$nExact)")
    // LSH near-dup pairs on the sample window must be TRUE pairs too
    // (the verify stage filters on exact cosine, so no false positives)
    assert(rec.getAs[Long]("n_lsh") == nHit,
      "every sampled LSH pair above threshold must appear in the exact baseline")
  }

  test("dedup_semantic: SemDeDup invariants — keeps, clusters, thresholds") {
    val rows = Curation.dedupSemantic(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // candidate floor and dup threshold are honored on every row
    rows.foreach { r =>
      val cos = r.getAs[Double]("cos")
      assert(cos >= 0.2 - 1e-12)
      assert(r.getAs[Boolean]("is_dup") == (cos >= 0.4))
    }
    // keep flags are consistent per vec across all rows it appears in
    val keepOf = scala.collection.mutable.Map[Long, Boolean]()
    val ccOf = scala.collection.mutable.Map[Long, Double]()
    rows.foreach { r =>
      for ((idCol, kCol, cCol) <- Seq(("vec_a", "keep_a", "cc_a"),
                                      ("vec_b", "keep_b", "cc_b"))) {
        val id = r.getAs[Long](idCol)
        val k = r.getAs[Boolean](kCol)
        val c = r.getAs[Double](cCol)
        assert(keepOf.getOrElseUpdate(id, k) == k, s"inconsistent keep for $id")
        assert(ccOf.getOrElseUpdate(id, c) == c, s"inconsistent cc for $id")
      }
    }
    // the core SemDeDup guarantee: no semantic-duplicate pair survives
    // with BOTH members kept
    rows.filter(_.getAs[Boolean]("is_dup")).foreach { r =>
      assert(!(r.getAs[Boolean]("keep_a") && r.getAs[Boolean]("keep_b")),
        s"dup pair ${r.getAs[Long]("vec_a")}-${r.getAs[Long]("vec_b")} fully kept")
    }
    // driver flood fill over dup pairs → exactly one keep per cluster,
    // and it is the farthest-from-centroid member (lowest cc, tie → id)
    val dupPairs = rows.filter(_.getAs[Boolean]("is_dup"))
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    dupPairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val members = keepOf.keys.filter(id => parent.contains(id))
      .groupBy(find).values
    members.foreach { g =>
      val kept = g.filter(keepOf)
      assert(kept.size == 1, s"cluster $g kept ${kept.size}")
      val want = g.minBy(id => (ccOf(id), id))
      assert(kept.head == want,
        s"cluster kept ${kept.head}, expected farthest-from-centroid $want")
    }
  }

  test("text_fingerprint: order-sensitive, deterministic, empty → 0") {
    import spark.implicits._
    val fp = TextAnalysis.textFingerprint(spark, sfDir)
    assert(fp.filter(col("fingerprint") < 0).count() == 0, "mod keeps it non-negative")
    // order sensitivity via the same expression over literal rows
    val two = Seq(("ab cd", 1L), ("cd ab", 2L), ("", 3L)).toDF("text", "doc_id")
    val vals = two.select(col("doc_id"),
        when(length(col("text")) === 0, lit(0L)).otherwise(
          aggregate(transform(split(col("text"), ""), c => ascii(c).cast("long")),
            lit(0L), (acc, x) => (acc * 31 + x) % 2147483647L)).as("f"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("f")).toMap
    assert(vals(1L) != vals(2L), "token order must change the fingerprint")
    assert(vals(3L) == 0L)
  }

  test("text_tfidf: rank bounded, scores consistent with tf/df") {
    val r = TextAnalysis.textTfidf(spark, sfDir)
    assert(r.filter(col("rank") > 5).count() == 0)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val bad = r.filter(col("df") > nDocs || col("df") < 1).count()
    assert(bad == 0)
    // score recomputes from its own row
    val wrong = r.filter(abs(col("score") -
      col("tf").cast("double") * lit((nDocs + 1).toDouble) /
        (col("df") + lit(1)).cast("double")) > 1e-12).count()
    assert(wrong == 0)
  }

  test("q_histogram: buckets partition the table") {
    val h = AnalyticsExtras.qHistogram(spark, sfDir)
    val total = h.agg(sum("n_items")).first().getLong(0)
    assert(total == graft.Tables.lineitem(spark, sfDir).count())
    val bad = h.filter(col("min_price") < col("lo") ||
      col("max_price") >= col("lo") + 5000.0).count()
    assert(bad == 0, "bucket bounds must contain their min/max")
  }

  test("q_stats: moments match a driver-side reference computation") {
    val r = AnalyticsExtras.qStats(spark, sfDir).collect()
      .map(x => x.getAs[String]("l_returnflag") -> x).toMap
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    rows.groupBy(_.getString(0)).foreach { case (flag, rs) =>
      val xs = rs.map(_.getDouble(1)); val ys = rs.map(_.getDouble(2))
      val n = xs.length.toDouble
      val mx = xs.sum / n
      val vx = xs.map(x => (x - mx) * (x - mx)).sum / (n - 1)
      val got = r(flag)
      assert(math.abs(got.getAs[Double]("mean_qty") - mx) < 1e-9 * math.abs(mx))
      assert(math.abs(got.getAs[Double]("var_qty") - vx) < 1e-6 * math.abs(vx),
        s"$flag var: got ${got.getAs[Double]("var_qty")} want $vx")
      val my = ys.sum / n
      val cxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val corr = cxy / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
      assert(math.abs(got.getAs[Double]("corr_qty_price") - corr) < 1e-6,
        s"$flag corr: got ${got.getAs[Double]("corr_qty_price")} want $corr")
    }
  }
}
