package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GraphOps}

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Local replay of the integer PageRank recurrence — independent of
    * every Spark kernel (plain Scala maps). */
  private def pagerankReference(pairs: Seq[(Long, Long)])
    : Map[Long, (Long, Long)] = {
    val ud = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = ud.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.map { case (n, _) => n -> 1000000000L }
    for (_ <- 1 to 6) {
      val inflow = ud.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          (85L * rank(src)) / (100L * deg(src))
        }.sum
      }
      rank = deg.map { case (n, _) => n -> (150000000L + inflow(n)) }
    }
    deg.map { case (n, d) => n -> (d, rank(n)) }
  }

  test("graph_pagerank: matches the local integer replay on a synthetic graph") {
    // a chain, a triangle, and a star — distinct shapes with known
    // rank orderings (hub > leaves, triangle symmetric, chain middle
    // > ends)
    val pairs = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L),                     // chain 1-2-3
      (10L, 11L), (11L, 12L), (10L, 12L),     // triangle
      (20L, 21L), (20L, 22L), (20L, 23L))     // star around 20
    val got = GraphOps.pagerankFromPairs(
      pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("rank"))).toMap
    assert(got == pagerankReference(pairs))
    // shape sanity: the star hub outranks its leaves, the chain middle
    // its ends, and the triangle is exactly symmetric
    assert(got(20L)._2 > got(21L)._2)
    assert(got(2L)._2 > got(1L)._2)
    assert(got(10L)._2 == got(11L)._2 && got(11L)._2 == got(12L)._2)
  }

  test("graph_pagerank: corpus run matches the replay over the real edge list") {
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val want = pagerankReference(pairs)
    val got = GraphOps.graphPagerank(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("rank"))).toMap
    assert(got == want)
    // every node keeps at least the teleport mass
    got.values.foreach { case (_, r) => assert(r >= 150000000L) }
  }

  test("graph_triangles: matches a brute-force count over the real edge list") {
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val edgeSet = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val triCount = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for {
      (a, b) <- pairs
      c <- nodes if c > b
      if edgeSet.contains((b, c)) && edgeSet.contains((a, c))
    } {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val degRef = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphOps.graphTriangles(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("n_tri"))).toMap
    assert(got.keySet == degRef.keySet)
    got.foreach { case (n, (d, t)) =>
      assert(d == degRef(n), s"degree mismatch at $n")
      assert(t == triCount(n), s"triangle count mismatch at $n")
    }
    // the near-dup graph is clique-heavy: triangles must exist
    assert(got.values.map(_._2).sum > 0)
  }

  test("graph_triangles: adjacency-intersection ≡ the wedge-join formulation (differential)") {
    // the r15 plan closes each oriented edge by array_intersect over
    // the node-sized adjacency table; this re-runs the retired 28M-row
    // wedge-join plan on the same edges and demands identical rows
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir).select("doc_a", "doc_b")
    val fast = GraphOps.trianglesFromPairs(pairs)
    val wedge = GraphOps.trianglesFromPairsWedge(pairs)
    assert(fast.count() > 0)
    assert(fast.exceptAll(wedge).isEmpty && wedge.exceptAll(fast).isEmpty)
  }

  test("graph_triangles_approx: DOULION estimator tracks the exact count on a clique-plus-chain graph") {
    import spark.implicits._
    // K16 (560 triangles) + a triangle-free chain: structure the
    // estimator must preserve (mass on the clique, zeros on the chain)
    val clique = for { a <- 0L until 16L; b <- (a + 1) until 16L } yield (a, b)
    val chain = (16L until 48L).map(i => (i, i + 1))
    val pairs = (clique ++ chain).toDF("doc_a", "doc_b")
    val exactTotal = GraphOps.trianglesFromPairs(pairs)
      .agg(sum("n_tri")).as[Long].head() // 3 × 560
    val approx = GraphOps.trianglesApproxFromPairs(pairs).collect()
    val degRef = (clique ++ chain).flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every node appears with its FULL-graph degree, and the scaled
    // column is exactly 1/p³ × the sampled count
    assert(approx.map(_.getAs[Long]("doc_id")).toSet == degRef.keySet)
    approx.foreach { r =>
      assert(r.getAs[Long]("deg") == degRef(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_tri_est") ==
        GraphOps.TriSampleScale * r.getAs[Long]("n_tri_sampled"))
    }
    // the deterministic coin makes this a fixed draw, not a flake: the
    // estimate must land in a generous concentration band of the truth
    // and put zero mass on the triangle-free chain
    val estTotal = approx.map(_.getAs[Long]("n_tri_est")).sum
    assert(estTotal > 0, "sampled graph lost every triangle — cut too aggressive for test scale")
    assert(estTotal >= exactTotal / 3 && estTotal <= exactTotal * 3,
      s"estimate $estTotal vs exact $exactTotal out of band")
    approx.filter(_.getAs[Long]("doc_id") > 16L).foreach { r =>
      assert(r.getAs[Long]("n_tri_est") == 0L, s"chain node ${r.getAs[Long]("doc_id")} credited a triangle")
    }
  }

  test("graph *_lsh twins: same loops, banded-LSH edge source, replay-exact") {
    // the production edge wiring (verdict r11 #6): the registered
    // twins must consume dedupMinhash's verified pairs — prove it by
    // replaying pagerank over exactly that edge list and comparing
    val pairs = Dedup.dedupMinhash(spark, sfDir)
      .filter(col("is_dup")).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty, "corpus must contain minhash near-dup pairs")
    val want = pagerankReference(pairs)
    val got = GraphOps.graphPagerankLsh(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("rank"))).toMap
    assert(got == want)
    // triangles twin: degrees follow the mutual top-KnnD
    // sparsification of the SAME edges (raw cliques are infeasible
    // to enumerate at scale — the registered form is the kNN graph)
    val ej = Dedup.dedupMinhash(spark, sfDir)
      .filter(col("is_dup")).select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    val ud = ej.flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
    val top = ud.groupBy(_._1).toSeq.flatMap { case (u, nbrs) =>
      nbrs.sortBy(t => (-t._3, t._2)).take(GraphOps.KnnD).map(t => (u, t._2))
    }.toSet
    val mutual = top.filter { case (u, v) => u < v && top.contains((v, u)) }
    val degRefK = mutual.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = GraphOps.graphTrianglesLsh(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("deg")).toMap
    assert(tri == degRefK)
    // bfs twin rides the FULL lsh edge set (linear in m): dist 0
    // exactly at the 8 lowest node ids of that graph
    val nodesFull = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val seeds = nodesFull.sorted.take(8).toSet
    val bfs = GraphOps.graphBfsLsh(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dist")).toMap
    assert(bfs.filter(_._2 == 0L).keySet == seeds)
    assert(bfs.keySet == nodesFull.toSet)
  }

  test("graph_bfs: seeds at zero, the BFS triangle inequality holds edge-by-edge") {
    val dist = GraphOps.graphBfs(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dist")).toMap
    val edges = Dedup.dedupNgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(dist.keySet == nodes.toSet, "every graph node must be reported")
    val seeds = nodes.sorted.take(8).toSet
    seeds.foreach(s => assert(dist(s) == 0L, s"seed $s not at distance 0"))
    // BFS correctness without recomputing BFS: along every undirected
    // edge, |d(u) − d(v)| ≤ 1 when both reachable, and a reachable
    // node can never neighbor an unreachable one
    edges.foreach { case (u, v) =>
      (dist(u), dist(v)) match {
        case (-1L, -1L) => ()
        case (du, dv) =>
          assert(du != -1L && dv != -1L,
            s"reachable/unreachable nodes adjacent: $u=$du $v=$dv")
          assert(math.abs(du - dv) <= 1L, s"BFS gap > 1 across edge ($u,$v)")
      }
    }
    // every non-seed reachable node has a parent one hop closer
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    dist.foreach { case (n, d) =>
      if (d > 0) assert(adj(n).exists(dist(_) == d - 1),
        s"node $n at dist $d has no parent at ${d - 1}")
    }
    val again = GraphOps.graphBfs(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dist")).toMap
    assert(again == dist)
  }

  test("graph_bfs: local-collapse tail ≡ fully-distributed traversal (differential)") {
    // a deep graph (60-node chain with sparse shortcuts plus a
    // disconnected pair) so the switchover is exercised MID-traversal:
    // the entry cap at half the adjacency forces distributed rounds to
    // settle roughly half the chain before the local pass finishes it
    val chain = (0L until 40L).sliding(2).map(w => (w(0), w(1))).toSeq
    val shortcuts = (0L until 36L by 7L).map(i => (i, i + 3L))
    val pairs = ((chain ++ shortcuts).distinct ++ Seq((900L, 901L)))
      .toDF("doc_a", "doc_b")
    def run(collapse: Boolean, entryCap: Long): Map[Long, Long] = {
      val rows = GraphOps.bfsFromPairs(pairs, localCollapse = collapse,
          nodeCap = 1000000L, entryCap = entryCap).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dist")).toSeq
      // EXACTLY one row per node — a .toMap alone would silently
      // dedup a duplicate-emission bug (the r16 review caught the
      // mid-traversal collapse emitting an interior node twice with
      // conflicting dists; this assertion is what makes the
      // differential actually sensitive to it)
      assert(rows.map(_._1).distinct.size == rows.size,
        s"duplicate doc_id rows: ${rows.groupBy(_._1).filter(_._2.size > 1)}")
      rows.toMap
    }
    val full = run(collapse = false, entryCap = 0L)
    val totalEntries = 2L * pairs.count()
    // mid-traversal switchover (cap at half the adjacency)
    assert(run(collapse = true, entryCap = totalEntries / 2) == full)
    // immediate collapse (cap above the whole graph — the sf0.1 shape)
    assert(run(collapse = true, entryCap = totalEntries + 1) == full)
    // unreachable component reported as -1 in every mode
    assert(full(900L) == -1L && full(901L) == -1L)
    // real depth: the chain end is many hops out, within the cap
    assert(full(39L) > 5L)
  }
}
