package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns

class VectorExprSpec extends SparkSpec {

  test("native dot matches HOF formulation bitwise on the embeddings table") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    val diff = emb.select(
        VectorFns.dot(col("v"), col("v")).as("native"),
        VectorFns.dotHof(col("v"), col("v")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("native cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFns.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0 && got(2) == 0.0)
  }

  test("two instances of a vector kernel compile in ONE codegen stage") {
    // regression: doGenCode used fixed local names (n/i/sum/dot/...),
    // so a projection containing the expression twice generated
    // redefined variables — janino failed and the whole stage fell
    // back to the interpreted path. fallback=false turns that silent
    // 10× slowdown into a test failure.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(5.0f, 6.0f)))
        .toDF("a", "b", "c")
      val r = df.select(
        VectorFns.dot(col("a"), col("b")).as("d1"),
        VectorFns.dot(col("a"), col("c")).as("d2"),
        VectorFns.cosine(col("a"), col("b")).as("c1"),
        VectorFns.cosine(col("a"), col("c")).as("c2")).collect().head
      assert(math.abs(r.getDouble(0) - 11.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 17.0) < 1e-12)
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("mixed float/double children are accepted") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("f", "d")
    val v = df.select(VectorFns.dot(col("f"), col("d"))).collect().head.getDouble(0)
    assert(v == 11.0)
  }

  test("lsh buckets kernel bit-identical to composed per-plane formulation") {
    import org.apache.spark.sql.functions.{array, posexplode}
    val nTables = 12; val bits = 6; val dim = 64; val seed = 42L
    val planes = VectorFns.hyperplanes(nTables * bits, dim, seed)
    val emb = Tables.embeddings(spark, sfDir).limit(200)
      .select(col("vec_id"), col("embedding").as("v"))
    val composed = emb.select(col("vec_id"),
        posexplode(array((0 until nTables).map { t =>
          VectorFns.lshBucket(col("v"), planes.slice(t * bits, (t + 1) * bits).toSeq)
        }: _*))).toDF("vec_id", "tbl", "bucket")
    val kernel = emb.select(col("vec_id"),
        posexplode(graft.functions.NativeVector.lshBuckets(col("v"), seed, nTables, bits, dim)))
      .toDF("vec_id", "tbl", "bucket")
    assert(composed.except(kernel).count() == 0 && kernel.except(composed).count() == 0)
    assert(kernel.count() == 200L * nTables)
  }

  test("lsh probe kernel: base matches lshBuckets; probes are the ascending-score boundary perturbations") {
    import spark.implicits._
    val nTables = 3; val bits = 6; val dim = 64; val seed = 42L; val nProbes = 10
    val emb = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), col("embedding").as("v"))
    val got = emb.select(col("vec_id"),
        graft.functions.NativeVector.lshProbeBuckets(col("v"), seed, nTables, bits, dim, nProbes))
      .as[(Long, Seq[Long])].collect().toMap
    val base = emb.select(col("vec_id"),
        graft.functions.NativeVector.lshBuckets(col("v"), seed, nTables, bits, dim))
      .as[(Long, Seq[Long])].collect().toMap
    val vecs = emb.as[(Long, Seq[Float])].collect().toMap
    val planes = VectorFns.hyperplanes(nTables * bits, dim, seed)
    val stride = nProbes + 1
    got.foreach { case (id, flat) =>
      assert(flat.length == nTables * stride)
      val v = vecs(id)
      (0 until nTables).foreach { t =>
        // element 0 of each stride IS the plain kernel's bucket
        assert(flat(t * stride) == base(id)(t), s"vec $id tbl $t base drifted")
        // driver recompute: margins per bit, every non-empty flip mask
        // scored by sum of squared flipped margins — the emitted
        // probes must be the nProbes cheapest, in ascending order
        val margins = (0 until bits).map { b =>
          planes(t * bits + b).zip(v).map { case (p, x) => p * x.toDouble }.sum
        }
        val expect = (1L until (1L << bits)).map { mask =>
          val score = (0 until bits).filter(b => (mask & (1L << b)) != 0)
            .map(b => margins(b) * margins(b)).sum
          (score, mask)
        }.sorted.take(nProbes).map { case (_, mask) => base(id)(t) ^ mask }
        val probes = (1 to nProbes).map(i => flat(t * stride + i))
        assert(probes == expect, s"vec $id tbl $t: $probes vs $expect")
        // probes are distinct and never re-emit the base
        assert((probes :+ flat(t * stride)).distinct.size == stride)
      }
    }
  }

  test("graft_srm_vecset expression matches the driver-side decode+SRM path") {
    import spark.implicits._
    val ids = Seq(3L, 17L, 42L)
    val got = ids.map(id => Tuple1(RefFerret.synthImage(id))).toDF("bytes")
      .select(graft.functions.NativeVector.srmVecset(col("bytes")).as("s"))
      .select(col("s.vset"), col("s.wset"))
      .as[(Seq[Seq[Double]], Seq[Double])].collect()
    val expect = ids.map { id =>
      val img = graft.functions.JpegCodec.decodeJpeg(RefFerret.synthImage(id))
      val rs = graft.functions.Srm.segmentAndDescribe(img).take(16)
      (rs.map(_.descriptor.toSeq).toSeq, rs.map(_.weight).toSeq)
    }
    assert(got.toSeq == expect, "expression drifted from the kernel path")
    assert(got.forall(_._1.nonEmpty))
  }

  // independent reference EMD: exhaustive permutations, plain Scala
  private def refEmd(a: Array[Array[Double]], b: Array[Array[Double]]): Double = {
    def l2(x: Array[Double], y: Array[Double]): Double =
      math.sqrt(x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum)
    b.indices.permutations
      .map(p => p.zipWithIndex.map { case (j, i) => l2(a(i), b(j)) }.sum)
      .min / a.length
  }

  test("graft_emd matches exhaustive-permutation reference on random sets") {
    import spark.implicits._
    val r = new scala.util.Random(13)
    val cases = Seq.fill(25)(
      (Array.fill(4)(Array.fill(8)(r.nextGaussian())),
        Array.fill(4)(Array.fill(8)(r.nextGaussian()))))
    val got = cases.toDF("a", "b")
      .select(graft.functions.NativeVector.emd(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(math.abs(g - refEmd(a, b)) < 1e-9, s"emd mismatch: $g vs ${refEmd(a, b)}")
    }
  }

  test("graft_emd: zero self-distance, symmetric, float sets accepted") {
    import spark.implicits._
    val r = new scala.util.Random(17)
    val sets = Seq.fill(10)(Array.fill(4)(Array.fill(8)(r.nextFloat())))
    val df = sets.zip(sets.reverse).toDF("a", "b")
    val rows = df.select(
      graft.functions.NativeVector.emd(col("a"), col("a")).as("self"),
      graft.functions.NativeVector.emd(col("a"), col("b")).as("ab"),
      graft.functions.NativeVector.emd(col("b"), col("a")).as("ba")).collect()
    rows.foreach { row =>
      assert(row.getDouble(0) == 0.0)
      assert(math.abs(row.getDouble(1) - row.getDouble(2)) < 1e-12)
      assert(row.getDouble(1) >= 0.0)
    }
  }

  test("graft_emd_w degenerates to the uniform equal-size kernel") {
    import spark.implicits._
    val r = new scala.util.Random(29)
    val cases = Seq.fill(20)(
      (Array.fill(4)(Array.fill(8)(r.nextGaussian())),
        Array.fill(4)(0.25),
        Array.fill(4)(Array.fill(8)(r.nextGaussian())),
        Array.fill(4)(0.25)))
    val rows = cases.toDF("a", "aw", "b", "bw").select(
      graft.functions.NativeVector.emdWeighted(
        col("a"), col("aw"), col("b"), col("bw")).as("w"),
      graft.functions.NativeVector.emd(col("a"), col("b")).as("u"))
      .collect()
    rows.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-9,
        s"weighted ${row.getDouble(0)} vs uniform ${row.getDouble(1)}")
    }
  }

  test("graft_emd_w matches the 2x2 transportation polytope endpoints") {
    import spark.implicits._
    // a balanced 2x2 transportation LP attains its optimum at an
    // endpoint of the single free variable f11 ∈ [max(0,w1+v1-1),
    // min(w1,v1)] — brute-force both endpoints
    val r = new scala.util.Random(31)
    val cases = Seq.fill(30) {
      val w1 = 0.1 + 0.8 * r.nextDouble()
      val v1 = 0.1 + 0.8 * r.nextDouble()
      (Array.fill(2)(Array.fill(6)(r.nextGaussian())), Array(w1, 1 - w1),
        Array.fill(2)(Array.fill(6)(r.nextGaussian())), Array(v1, 1 - v1))
    }
    val got = cases.toDF("a", "aw", "b", "bw").select(
      graft.functions.NativeVector.emdWeighted(
        col("a"), col("aw"), col("b"), col("bw"))).collect().map(_.getDouble(0))
    def l2(x: Array[Double], y: Array[Double]) =
      math.sqrt(x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum)
    cases.zip(got).foreach { case ((a, aw, b, bw), g) =>
      val d = Array.tabulate(2, 2)((i, j) => l2(a(i), b(j)))
      def costAt(f11: Double) =
        f11 * d(0)(0) + (aw(0) - f11) * d(0)(1) +
          (bw(0) - f11) * d(1)(0) + (1 - aw(0) - bw(0) + f11) * d(1)(1)
      val lo = math.max(0.0, aw(0) + bw(0) - 1.0)
      val hi = math.min(aw(0), bw(0))
      val want = math.min(costAt(lo), costAt(hi))
      assert(math.abs(g - want) < 1e-9, s"emd_w $g vs LP endpoint $want")
    }
  }

  test("graft_emd_w: unequal cardinalities and unequal totals") {
    import spark.implicits._
    // 1 source vs 3 sinks, balanced: closed form Σ wⱼ·dⱼ
    val a = Array(Array(0.0, 0.0))
    val b = Array(Array(3.0, 4.0), Array(0.0, 1.0), Array(6.0, 8.0))
    val bw = Array(0.5, 0.3, 0.2)
    val df1 = Seq((a, Array(1.0), b, bw)).toDF("a", "aw", "b", "bw")
    val g1 = df1.select(graft.functions.NativeVector.emdWeighted(
      col("a"), col("aw"), col("b"), col("bw"))).collect().head.getDouble(0)
    assert(math.abs(g1 - (0.5 * 5 + 0.3 * 1 + 0.2 * 10)) < 1e-9)
    // unequal totals: only min(Σw1, Σw2) mass moves, normalized by it
    // (emd.c:150,192) — 0.5 total demand against the nearest sink mix
    val df2 = Seq((a, Array(1.0), b, Array(0.25, 0.25, 0.0)))
      .toDF("a", "aw", "b", "bw")
    val g2 = df2.select(graft.functions.NativeVector.emdWeighted(
      col("a"), col("aw"), col("b"), col("bw"))).collect().head.getDouble(0)
    assert(math.abs(g2 - (0.25 * 5 + 0.25 * 1) / 0.5) < 1e-9)
    // self-distance zero with ragged weights
    val df3 = Seq((b, bw, b, bw)).toDF("a", "aw", "b", "bw")
    val g3 = df3.select(graft.functions.NativeVector.emdWeighted(
      col("a"), col("aw"), col("b"), col("bw"))).collect().head.getDouble(0)
    assert(g3 == 0.0)
  }

  test("graft_emd rejects flat (non-nested) arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.NativeVector.emd(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_emd"))
  }
}
