package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.functions.EmdWeightedKernel

/** The EMD optimality certificate (EmdWeightedKernel.certificate +
  * the emd_check operator): the same three arithmetic facts the
  * DuckDB oracle checks — primal feasibility, dual feasibility,
  * strong duality — verified here on seeded random instances across
  * all three mass regimes (Σs > Σd, Σs < Σd, Σs = Σd), plus
  * agreement with the scalar kernel and the DataFrame-level contract
  * against ferret_emd. Strong duality is the LP proof that the
  * emitted flow is OPTIMAL, not merely feasible. */
class EmdCertificateSpec extends SparkSpec {

  private def l2(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < math.min(x.length, y.length)) { val d = x(i) - y(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  private def randInstance(rnd: scala.util.Random, dim: Int)
      : (Array[Array[Double]], Array[Double], Array[Array[Double]], Array[Double]) = {
    def side(n: Int) = (
      Array.fill(n)(Array.fill(dim)(rnd.nextDouble() * 10 - 5)),
      Array.fill(n)(rnd.nextDouble() * 3 + 0.1))
    val (va, wa) = side(1 + rnd.nextInt(6))
    val (vb, wb) = side(1 + rnd.nextInt(6))
    (va, wa, vb, wb)
  }

  private def checkCertificate(va: Array[Array[Double]], wa: Array[Double],
                               vb: Array[Array[Double]], wb: Array[Double]): Unit = {
    val cert = EmdWeightedKernel.certificate(va, wa, vb, wb)
    val n1 = va.length
    val n2 = vb.length
    val sTot = wa.sum
    val dTot = wb.sum
    // primal feasibility
    var moved = 0.0
    var cost = 0.0
    for (i <- 0 until n1; j <- 0 until n2) {
      assert(cert.flow(i)(j) >= -1e-9, s"negative flow at ($i,$j)")
      moved += cert.flow(i)(j)
      cost += cert.flow(i)(j) * l2(va(i), vb(j))
    }
    for (i <- 0 until n1)
      assert(cert.flow(i).sum <= wa(i) + 1e-9, s"row $i exceeds supply")
    for (j <- 0 until n2)
      assert((0 until n1).map(cert.flow(_)(j)).sum <= wb(j) + 1e-9, s"col $j exceeds demand")
    assert(math.abs(moved - math.min(sTot, dTot)) < 1e-9, "under-moved mass")
    assert(math.abs(cert.totalFlow - moved) < 1e-9)
    // the claimed distance is the flow's normalized cost
    assert(math.abs(cert.emd - cost / cert.totalFlow) < 1e-9,
      s"emd ${cert.emd} vs flow cost ${cost / cert.totalFlow}")
    // dual feasibility on the FULL grid + the heavier side's sign
    for (i <- 0 until n1; j <- 0 until n2)
      assert(cert.q(j) - cert.p(i) <= l2(va(i), vb(j)) + 1e-9,
        s"dual infeasible at ($i,$j)")
    if (sTot > dTot + 1e-9) assert(cert.p.min >= -1e-9, "supply dual sign")
    if (dTot > sTot + 1e-9) assert(cert.q.max <= 1e-9, "demand dual sign")
    // strong duality: dual objective == primal cost ⇒ flow is OPTIMAL
    val dual = wb.indices.map(j => wb(j) * cert.q(j)).sum -
      wa.indices.map(i => wa(i) * cert.p(i)).sum
    assert(math.abs(dual - cost) < 1e-6, s"duality gap: dual=$dual cost=$cost")
  }

  test("certificate proves optimality on seeded random instances (all mass regimes)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val (va, wa, vb, wb) = randInstance(rnd, dim = 3)
      checkCertificate(va, wa, vb, wb)
    }
    // exact equal-mass instances (no dummy node in the dual recovery)
    for (_ <- 1 to 50) {
      val (va, wa, vb, _) = randInstance(rnd, dim = 3)
      val wb2 = Array.fill(vb.length)(wa.sum / vb.length)
      checkCertificate(va, wa, vb, wb2)
    }
  }

  test("certificate emd equals the scalar kernel bitwise") {
    val rnd = new scala.util.Random(7)
    def ad(v: Array[Array[Double]]) =
      new GenericArrayData(v.map(new GenericArrayData(_)).toArray[Any])
    for (_ <- 1 to 50) {
      val (va, wa, vb, wb) = randInstance(rnd, dim = 4)
      val cert = EmdWeightedKernel.certificate(va, wa, vb, wb)
      val scalar = EmdWeightedKernel.emd(
        ad(va), new GenericArrayData(wa), ad(vb), new GenericArrayData(wb),
        aFloat = false, bFloat = false, awFloat = false, bwFloat = false)
      assert(cert.emd == scalar, s"certificate ${cert.emd} != scalar $scalar")
    }
  }

  test("emd_check covers ferret_emd's pairs with complete grids and identical distances") {
    val check = operators.Similarity.emdCheck(spark, sfDir).cache()
    val ranked = operators.Similarity.ferretEmd(spark, sfDir)
      .select(col("query_img"), col("cand_img"), col("emd").as("ranked_emd"))
    try {
      assert(check.count() > 0)
      // one row per grid cell, n1*n2 of them per pair
      val badGrid = check.groupBy("query_img", "cand_img")
        .agg(count(lit(1)).as("cells"), max(col("n1") * col("n2")).as("want"))
        .filter(col("cells") =!= col("want")).count()
      assert(badGrid == 0, "incomplete certificate grid")
      // the certified pairs are EXACTLY ferret_emd's ranked pairs, with
      // bitwise-identical distances (same solver on both paths)
      val pairs = check.select("query_img", "cand_img", "emd").distinct()
      assert(pairs.join(ranked, Seq("query_img", "cand_img"), "full")
        .filter(col("emd").isNull || col("ranked_emd").isNull ||
          col("emd") =!= col("ranked_emd")).count() == 0)
    } finally { check.unpersist(): Unit }
  }
}
