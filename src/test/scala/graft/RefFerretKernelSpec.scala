package graft

import org.apache.spark.sql.functions._

/** Unit-level differential proof for [[FerretProbeRank]] — the fused
  * probe+rank kernel behind the RefFerret dist default. The corpus
  * run proved it bit-identical to the declarative plan once
  * (REFBENCH r14, 50k rows, 0 diffs); this spec pins the same
  * semantics on a synthetic index with an INDEPENDENT in-test
  * reimplementation (plain Scala: z-score → LshProbeKernel probe
  * enumeration → postings walk → cross-table dedup → top-depth by
  * (d2, id)), so a future kernel regression fails in the suite
  * instead of waiting for the next REFBENCH session. */
class RefFerretKernelSpec extends SparkSpec {

  private val Dim = graft.functions.Srm.Dim
  private val Seed = 7L
  private val Tables = 3
  private val Bits = 6
  private val Probes = 4
  private val Depth = 5

  // deterministic synthetic region vectors in the SRM descriptor's
  // wildly-varying per-dim scale class (the z-score's reason to exist)
  private def vec(id: Int): Array[Double] =
    Array.tabulate(Dim) { d =>
      val h = (id * 31 + d * 131) % 97
      (h - 48) * math.pow(10.0, (d % 5) - 2)
    }

  private val nDb = 60
  private val dbVecs = (0 until nDb).map(vec)
  private val mu = Array.tabulate(Dim)(d => dbVecs.map(_(d)).sum / nDb)
  private val sd = Array.tabulate(Dim) { d =>
    val m = mu(d)
    math.max(math.sqrt(dbVecs.map(v => (v(d) - m) * (v(d) - m)).sum / nDb), 1e-12)
  }

  private def zOf(v: Array[Double]): Array[Double] =
    Array.tabulate(Dim)(d => (v(d) - mu(d)) / sd(d))

  private def bucketsOf(v: Array[Double], nProbes: Int): Seq[(Int, Long)] = {
    val ids = graft.functions.LshProbeKernel.probes(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(zOf(v)), false,
      Seed, Tables, Bits, Dim, nProbes)
    val stride = nProbes + 1
    (0 until ids.numElements()).map(i => (i / stride, ids.getLong(i)))
  }

  // the index: every db region posted under its base bucket per table
  private val postings: Map[Long, Array[Int]] =
    (0 until nDb).flatMap { id =>
      bucketsOf(dbVecs(id), 0).map { case (t, b) => ((t.toLong << 32) | b, id) }
    }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted.toArray }

  /** Independent reimplementation of the kernel's contract. */
  private def expected(q: Array[Double]): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[Int]
    val cands = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    bucketsOf(q, Probes).foreach { case (t, b) =>
      postings.getOrElse((t.toLong << 32) | b, Array.empty[Int]).foreach { id =>
        if (seen.add(id)) {
          val d = (0 until Dim).map(k => { val x = q(k) - dbVecs(id)(k); x * x }).sum
          cands += ((d, id))
        }
      }
    }
    cands.sortBy(identity).take(Depth).toSeq.map { case (_, id) => f"img_$id%03d" }
  }

  test("FerretProbeRank matches an independent probe+rank reimplementation") {
    import spark.implicits._
    val index = spark.sparkContext.broadcast(FerretRegionIndex(
      (0 until nDb).map(i =>
        org.apache.spark.unsafe.types.UTF8String.fromString(f"img_$i%03d")).toArray,
      Array.fill(nDb)(0),
      dbVecs.toArray,
      postings))
    val queries = (100 until 140).map(qid => (qid, vec(qid).toSeq))
    val got = queries.toDF("qid", "v")
      .select(col("qid"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(FerretProbeRank(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
          index, mu, sd, Seed, Tables, Bits, Dim, Probes, Depth)).as("cands"))
      .as[(Int, Seq[String])].collect().toMap
    var nonEmpty = 0
    queries.foreach { case (qid, _) =>
      val want = expected(vec(qid)).toSet
      assert(got(qid).toSet == want,
        s"query $qid: kernel=${got(qid).sorted} expected=${want.toSeq.sorted}")
      if (want.nonEmpty) nonEmpty += 1
    }
    // the synthetic index must actually exercise the path — if every
    // probe went candidate-dark the equality above proves nothing
    assert(nonEmpty >= queries.size / 2,
      s"only $nonEmpty/${queries.size} queries found candidates — index too sparse to test")
  }

  test("FerretProbeRank dedups candidates across tables and respects the depth cut") {
    // one db region posted under EVERY probed bucket of a query →
    // the kernel must emit it once, and never more than depth entries
    val q = vec(7)
    val everywhere = bucketsOf(q, Probes)
      .map { case (t, b) => ((t.toLong << 32) | b) -> Array(0) }.toMap
    val index = spark.sparkContext.broadcast(FerretRegionIndex(
      Array(org.apache.spark.unsafe.types.UTF8String.fromString("dup_img")),
      Array(0), Array(vec(500)), everywhere))
    import spark.implicits._
    val out = Seq(q.toSeq).toDF("v")
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(FerretProbeRank(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
        index, mu, sd, Seed, Tables, Bits, Dim, Probes, Depth)).as("cands"))
      .as[Seq[String]].collect().head
    assert(out == Seq("dup_img"), s"cross-table dedup broken: $out")
  }
}
