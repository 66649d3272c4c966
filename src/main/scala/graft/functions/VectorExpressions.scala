package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`)
  * is interpreted per element with boxing; these expressions compile
  * to a tight primitive loop inside whole-stage codegen — the
  * difference is ~10× on the ANN/near-dup candidate scoring stages,
  * which at 100 TB is the dominant CPU cost.
  *
  * Both accept `array<float>` and `array<double>` children (floats
  * are widened per element, so results are exact doubles). Null
  * elements are not expected (embedding columns are dense).
  */
trait VectorLoopCodegen { self: BinaryExpression =>

  private def getterFor(dt: DataType): String = dt match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }
  protected def leftGetter: String = getterFor(left.dataType)
  protected def rightGetter: String = getterFor(right.dataType)

  protected def elemAt(dt: DataType, a: ArrayData, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} expects array<float>/array<double> columns, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ over the common prefix length. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with VectorLoopCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i); i += 1 }
    s
  }

  // all locals freshName'd: two instances of this expression can land
  // in ONE codegen function (e.g. a projection scoring against two
  // columns) — fixed names redefine and knock the whole stage back to
  // the interpreted path
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gl = leftGetter; val gr = rightGetter
      val n = ctx.freshName("n"); val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double)$a.$gl($i) * (double)$b.$gr($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) in one pass; 0.0 when either norm is zero. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with VectorLoopCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = elemAt(left.dataType, x, i); val yv = elemAt(right.dataType, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  // freshName'd locals — see DotProduct.doGenCode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gl = leftGetter; val gr = rightGetter
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double)$a.$gl($i);
         |  double $yv = (double)$b.$gr($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $denom == 0.0 ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All LSH bucket ids of a vector in ONE kernel pass.
  *
  * The composed formulation (`lshBucket` per table = bits × dot
  * Expressions per row) pays per-plane expression overhead 64-72
  * times per row on the candidate-generation hot path; this kernel
  * walks the plane matrix once. Bit packing is IDENTICAL to
  * `VectorFns.lshBucket` over `hyperplanes(nTables*bits, dim, seed)`
  * slices — same dot accumulation order, same `> 0.0` sign rule, so
  * bucket ids are bit-for-bit unchanged (differential spec). Planes
  * regenerate deterministically from (seed, count, dim) on each
  * executor and cache statically.
  */
object LshBucketKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  def planes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, nPlanes, dim),
      _ => VectorFns.hyperplanes(nPlanes, dim, seed))

  def buckets(v: org.apache.spark.sql.catalyst.util.ArrayData, vFloat: Boolean,
              seed: Long, nTables: Int, bits: Int, dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val ps = planes(seed, nTables * bits, dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val p = ps(t * bits + b)
        val n = math.min(v.numElements(), p.length)
        var s = 0.0
        var i = 0
        while (i < n) {
          s += (if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)) * p(i)
          i += 1
        }
        if (s > 0.0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Decode-JPEG → SRM-segment → extract as ONE Catalyst expression
  * (struct(vset: array<array<double>>, wset: array<double>), capped
  * at 16 regions — the EMD kernel bound): expressing the per-image
  * kernel as an expression instead of Dataset.mapPartitions keeps
  * the plan attribute lineage intact, so an upstream
  * repartition-by-image survives THROUGH the decode and every
  * downstream per-image groupBy/window needs no further exchange —
  * the whole query-side ferret pipeline fuses into one stage.
  * CodegenFallback: the decode+SRM kernel dominates the eval cost by
  * orders of magnitude. */
case class SrmVecset(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("vset", ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false), nullable = false),
    StructField("wset", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_srm_vecset"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary (JPEG bytes) column, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val img = JpegCodec.decodeJpeg(input.asInstanceOf[Array[Byte]])
    val rs = Srm.segmentAndDescribe(img).take(16)
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        rs.map(r => new org.apache.spark.sql.catalyst.util.GenericArrayData(r.descriptor): Any)),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rs.map(_.weight)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Multi-probe bucket ids: per table, the base bucket FOLLOWED by the
  * `nProbes` nearest-boundary perturbed buckets — the standard
  * memory/recall trade (Lv et al., "Multi-Probe LSH", VLDB 2007; the
  * reference's gen_perturb_set / LSH_query_probe,
  * apps/ferret/src/src/lsh/LSH_query.c:59,281 with T=20): instead of
  * multiplying TABLES to recover recall, a query also probes the
  * buckets it ALMOST hashed to. For sign-LSH the boundary distance of
  * bit b is the |projection| margin onto plane b, so perturbation
  * sets (bit-flip masks) are enumerated in ascending
  * sum-of-squared-margins order via the classic shift/expand heap
  * over the margin-sorted bit list — each set generated exactly once,
  * ties broken by flip mask so the emission order is engine- and
  * heap-implementation-independent.
  *
  * Plane matrix, dot order, and sign rule are IDENTICAL to
  * [[LshBucketKernel]] (same cache), so element 0 of every table
  * stride equals the `lshBuckets` id bit-for-bit (differential spec).
  * Layout: flat array, element i ⇒ table i / (nProbes+1), base-first.
  */
object LshProbeKernel {
  def probes(v: org.apache.spark.sql.catalyst.util.ArrayData, vFloat: Boolean,
             seed: Long, nTables: Int, bits: Int, dim: Int,
             nProbes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(nProbes >= 0 && nProbes < (1 << bits),
      s"graft_lsh_probes: nProbes must be < 2^bits distinct perturbations (got $nProbes at $bits bits)")
    val ps = LshBucketKernel.planes(seed, nTables * bits, dim)
    val stride = nProbes + 1
    val out = new Array[Long](nTables * stride)
    val margins = new Array[Double](bits)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val p = ps(t * bits + b)
        val n = math.min(v.numElements(), p.length)
        var s = 0.0
        var i = 0
        while (i < n) {
          s += (if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)) * p(i)
          i += 1
        }
        if (s > 0.0) bucket |= (1L << b)
        margins(b) = math.abs(s)
        b += 1
      }
      out(t * stride) = bucket
      if (nProbes > 0) {
        // bits by distance-to-boundary ascending: flipping order(0)
        // is the cheapest single-bit perturbation
        val order = Array.range(0, bits).sortBy(i => (margins(i), i))
        val sq = order.map(i => margins(i) * margins(i))
        def maskOf(set: List[Int]): Long = {
          var m = 0L
          set.foreach(i => m |= (1L << order(i)))
          m
        }
        // ascending-score set enumeration: sets carry their max
        // element at the head; {m::rest} yields shift (m→m+1) and
        // expand (+(m+1)) — the classic generation, each set once
        val pq = collection.mutable.PriorityQueue.empty[(Double, Long, List[Int])](
          Ordering.by[(Double, Long, List[Int]), (Double, Long)](e => (e._1, e._2)).reverse)
        pq.enqueue((sq(0), maskOf(List(0)), List(0)))
        var emitted = 0
        while (emitted < nProbes && pq.nonEmpty) {
          val (score, mask, set) = pq.dequeue()
          out(t * stride + 1 + emitted) = bucket ^ mask
          emitted += 1
          val m = set.head
          if (m + 1 < bits) {
            val shifted = (m + 1) :: set.tail
            val expanded = (m + 1) :: set
            pq.enqueue((score - sq(m) + sq(m + 1), maskOf(shifted), shifted))
            pq.enqueue((score + sq(m + 1), maskOf(expanded), expanded))
          }
        }
        // nProbes < 2^bits - 1 sets always exist, so emitted == nProbes
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class LshProbeBuckets(child: Expression, seed: Long, nTables: Int,
                           bits: Int, dim: Int, nProbes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_probes"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float|double> column, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    LshProbeKernel.probes(input.asInstanceOf[ArrayData], isFloat,
      seed, nTables, bits, dim, nProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshProbeKernel.probes($c, $isFloat, ${seed}L, $nTables, $bits, $dim, $nProbes)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class LshBuckets(child: Expression, seed: Long, nTables: Int,
                      bits: Int, dim: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float|double> column, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    LshBucketKernel.buckets(input.asInstanceOf[ArrayData], isFloat,
      seed, nTables, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBucketKernel.buckets($c, $isFloat, ${seed}L, $nTables, $bits, $dim)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** p-stable (Euclidean) E2LSH bucket kernel — the reference ferret
  * index's literal hash family, re-expressed from its public form
  * (Datar-Indyk-Immorlica-Mirrokni p-stable LSH; reference
  * apps/ferret/src/src/lsh/LSH.c:143 LSH_hash — h_ij =
  * floor((α_ij·v + β_ij)/w) with α ~ N(0,1), β ~ U[0,w); LSH.c:129
  * LSH_hash2 — bucket_i = Σ_j rnd_ij·h_ij mod H; benchmark/mkdb:30
  * parameterization `-L 12 -M 17 -w 4.0708 -H 19697`). SPEC-ONLY
  * contrast baseline (r15 verdict #7): the registered family
  * everywhere is sign-LSH + multiprobe (ann_lsh_multiprobe), which
  * measures HIGHER recall against the exact truth — this twin exists
  * so REFBENCH's index-family row is apples-to-apples. Draw order
  * (all L·M α rows, then all L·M β, then the L·M second-level
  * multipliers) mirrors LSH.c's init; the RNG is java.util.Random
  * (seeded, algorithm fixed by its spec) rather than gsl, and the
  * second-level sum runs in exact Long arithmetic mod H rather than
  * wrapping uint32 — family-identical semantics, not a bit-clone of
  * one gsl seed stream. */
object E2lshKernel {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Long, Int, Int, Double, Int),
    (Array[Array[Double]], Array[Double], Array[Array[Long]])]()

  def params(seed: Long, nTables: Int, m: Int, w: Double, dim: Int)
      : (Array[Array[Double]], Array[Double], Array[Array[Long]]) =
    cache.computeIfAbsent((seed, nTables, m, w, dim), _ => {
      val rng = new java.util.Random(seed)
      val alphas = Array.fill(nTables * m)(Array.fill(dim)(rng.nextGaussian()))
      val betas = Array.fill(nTables * m)(rng.nextDouble() * w)
      val rnd = Array.fill(nTables)(Array.fill(m)(
        (rng.nextInt(Int.MaxValue - 1) + 1).toLong))
      (alphas, betas, rnd)
    })

  def buckets(v: org.apache.spark.sql.catalyst.util.ArrayData, vFloat: Boolean,
              seed: Long, nTables: Int, m: Int, w: Double, h: Int,
              dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (alphas, betas, rnd) = params(seed, nTables, m, w, dim)
    val out = new Array[Long](nTables)
    // fail-fast on a dim mismatch, matching FerretProbeCore.rankRegion's
    // contract (r16 ADVICE: the old min(numElements, dim) silently
    // truncated long vectors / zero-padded short ones — a malformed
    // descriptor hashed to a wrong-but-plausible bucket with no error)
    require(v.numElements() == dim,
      s"graft_e2lsh_buckets: vector length ${v.numElements()} != dim $dim")
    val n = dim
    var t = 0
    var l = 0
    while (t < nTables) {
      var acc = 0L
      var j = 0
      while (j < m) {
        val a = alphas(l)
        var s = betas(l)
        var i = 0
        while (i < n) {
          s += (if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)) * a(i)
          i += 1
        }
        val hij = math.floor(s / w).toLong
        // exact mod-H accumulation (Math.floorMod keeps it in [0, H))
        acc = Math.floorMod(acc + Math.floorMod(rnd(t)(j) * Math.floorMod(hij, h), h), h)
        j += 1
        l += 1
      }
      out(t) = acc
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** One second-level E2LSH bucket id per table ([[E2lshKernel]]) —
  * array<bigint> of length nTables, values in [0, h). */
case class E2lshBuckets(child: Expression, seed: Long, nTables: Int,
                        m: Int, w: Double, h: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_e2lsh_buckets"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float|double> column, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    E2lshKernel.buckets(input.asInstanceOf[ArrayData], isFloat,
      seed, nTables, m, w, h, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.E2lshKernel.buckets($c, $isFloat, ${seed}L, $nTables, $m, $w, $h, $dim)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Earth Mover's Distance between two small vector SETS — the
  * reference's `emd` vecset distance used by ferret's t_rank stage
  * (ferret-pthreads.c:870 `cass_reg_lookup(&env->vecset_dist, "emd")`).
  *
  * For uniform-weight, equal-cardinality sets the transportation
  * problem degenerates to min-cost perfect matching, solved EXACTLY by
  * branch-and-bound over assignments — regions sets are tiny (n ≤ 8),
  * so the search is a handful of L2 evaluations per pair. Ground
  * distance: Euclidean. Runs only on the over-fetched re-rank set,
  * never the full corpus.
  */
object EmdKernel {

  /** @param aFloat/bFloat element type of the inner vectors (float vs
    *                      double), recorded by the expression */
  def emd(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(n == b.numElements() && n > 0 && n <= 10,
      s"graft_emd expects equal-size non-empty vector sets of <= 10 (got $n vs ${b.numElements()})")
    val cost = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      val av = a.getArray(i)
      var j = 0
      while (j < n) {
        cost(i)(j) = l2Dist(av, b.getArray(j), aFloat, bFloat)
        j += 1
      }
      i += 1
    }
    solveAssignment(cost) / n
  }

  /** Euclidean ground distance, shared with [[EmdWeightedKernel]]. */
  def l2Dist(x: ArrayData, y: ArrayData, xF: Boolean, yF: Boolean): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xF) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yF) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  /** Exact min-cost perfect matching by branch-and-bound (prunes on
    * the running partial cost against the best complete matching). */
  private def solveAssignment(cost: Array[Array[Double]]): Double = {
    val n = cost.length
    val used = new Array[Boolean](n)
    var best = Double.MaxValue
    def rec(i: Int, acc: Double): Unit = {
      if (acc >= best) return
      if (i == n) { best = acc; return }
      var j = 0
      while (j < n) {
        if (!used(j)) {
          used(j) = true
          rec(i + 1, acc + cost(i)(j))
          used(j) = false
        }
        j += 1
      }
    }
    rec(0, 0.0)
    best
  }
}

/** General-weight EMD — the reference's actual `emd` contract
  * (emd.c:104): signatures are (feature, weight) lists with arbitrary
  * positive weights and arbitrary (possibly different) cardinalities;
  * the distance is the minimum-cost transportation of
  * min(Σw₁, Σw₂) mass, normalized by that total flow (emd.c:192
  * `totalCost / w`). The uniform equal-size kernel above is the
  * degenerate case (spec-pinned equal).
  *
  * Solved EXACTLY by successive shortest paths on the bipartite
  * flow network (Bellman-Ford each round — edge costs are plain
  * Euclidean distances, and region sets are ≤ ~8 a side, so each
  * solve is microseconds). Real-valued supplies terminate: every
  * augmentation exhausts a source, a sink, or a residual arc, and
  * an optimal transportation solution uses at most n₁+n₂-1 arcs. */
object EmdWeightedKernel {

  /** Exact transportation solution plus an LP OPTIMALITY CERTIFICATE.
    * `flow` is primal-feasible by construction; `p` (supply duals)
    * and `q` (demand duals) satisfy q(j) - p(i) <= cost(i)(j) on the
    * FULL grid, the heavier side's sign constraint (p >= 0 when
    * supply exceeds demand, q <= 0 when demand exceeds supply), and
    * strong duality Σd·q - Σs·p = Σf·c — three purely arithmetic
    * facts that any third engine can check to confirm the flow is
    * optimal, without re-running a solver (emd_check's DuckDB oracle
    * does exactly that). */
  final case class Certificate(emd: Double, totalFlow: Double,
                               flow: Array[Array[Double]],
                               p: Array[Double], q: Array[Double])

  def emd(a: ArrayData, aw: ArrayData, b: ArrayData, bw: ArrayData,
          aFloat: Boolean, bFloat: Boolean,
          awFloat: Boolean, bwFloat: Boolean): Double = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    def wAt(w: ArrayData, i: Int, f: Boolean): Double =
      if (f) w.getFloat(i).toDouble else w.getDouble(i)
    def vAt(v: ArrayData, i: Int, f: Boolean): Array[Double] = {
      val row = v.getArray(i)
      Array.tabulate(row.numElements())(k =>
        if (f) row.getFloat(k).toDouble else row.getDouble(k))
    }
    require(aw.numElements() == n1 && bw.numElements() == n2,
      s"graft_emd_w weight/vector cardinality mismatch ($n1/${aw.numElements()}, $n2/${bw.numElements()})")
    val (_, _, totalFlow, totalCost) = solveFlow(
      Array.tabulate(n1)(vAt(a, _, aFloat)), Array.tabulate(n1)(wAt(aw, _, awFloat)),
      Array.tabulate(n2)(vAt(b, _, bFloat)), Array.tabulate(n2)(wAt(bw, _, bwFloat)))
    if (totalFlow <= 0) 0.0 else totalCost / totalFlow
  }

  /** [[emd]] on pre-converted plain arrays (both sides) — the ferret
    * re-rank hot path (r16): the query vecset converts ONCE per query
    * and the resident db vecsets convert ONCE at index-build time, so
    * the per-candidate cost is exactly one solveFlow. Same arithmetic
    * as [[emd]] (the conversion is exact), so results are
    * bit-identical. */
  def emdArrays(va: Array[Array[Double]], wa: Array[Double],
                vb: Array[Array[Double]], wb: Array[Double]): Double = {
    require(wa.length == va.length && wb.length == vb.length,
      s"graft_emd_w weight/vector cardinality mismatch (${va.length}/${wa.length}, ${vb.length}/${wb.length})")
    val (_, _, totalFlow, totalCost) = solveFlow(va, wa, vb, wb)
    if (totalFlow <= 0) 0.0 else totalCost / totalFlow
  }

  /** Solve + duals, on plain arrays (the verification path — the hot
    * ranking path goes through [[emd]] and skips the dual pass). */
  def certificate(va: Array[Array[Double]], wa: Array[Double],
                  vb: Array[Array[Double]], wb: Array[Double]): Certificate = {
    val (flow, cost, totalFlow, totalCost) = solveFlow(va, wa, vb, wb)
    val (p, q) = duals(cost, flow, wa, wb)
    Certificate(if (totalFlow <= 0) 0.0 else totalCost / totalFlow,
      totalFlow, flow, p, q)
  }

  private def l2(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { val d = x(i) - y(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** Successive-shortest-paths transportation solve. Returns
    * (flow matrix, cost matrix, total flow, total cost). */
  private def solveFlow(va: Array[Array[Double]], wa: Array[Double],
                        vb: Array[Array[Double]], wb: Array[Double])
      : (Array[Array[Double]], Array[Array[Double]], Double, Double) = {
    val n1 = va.length
    val n2 = vb.length
    require(n1 > 0 && n2 > 0 && n1 <= 16 && n2 <= 16,
      s"graft_emd_w expects non-empty vector sets of <= 16 (got $n1 vs $n2)")
    val supply = wa.clone()
    val demand = wb.clone()
    require(supply.forall(_ >= 0) && demand.forall(_ >= 0),
      "graft_emd_w weights must be non-negative")
    // transport min(Σw1, Σw2) mass (emd.c:150): scale the HEAVIER
    // side down is wrong (it changes per-region weights) — instead
    // cap total moved mass by tracking remaining supply/demand and
    // stopping when the smaller side exhausts
    val totalFlow = math.min(supply.sum, demand.sum)
    val cost = Array.ofDim[Double](n1, n2)
    var i = 0
    while (i < n1) {
      var j = 0
      while (j < n2) {
        cost(i)(j) = l2(va(i), vb(j))
        j += 1
      }
      i += 1
    }
    if (totalFlow <= 0) return (Array.ofDim[Double](n1, n2), cost, 0.0, 0.0)

    // successive shortest paths over the residual network:
    // nodes 0..n1-1 sources, n1..n1+n2-1 sinks
    val flow = Array.ofDim[Double](n1, n2)
    var moved = 0.0
    var totalCost = 0.0
    val eps = 1e-12
    var guard = 0
    while (totalFlow - moved > eps && guard < 4 * (n1 + n2) * (n1 + n2)) {
      guard += 1
      // Bellman-Ford from all sources with remaining supply
      val n = n1 + n2
      val dist = Array.fill(n)(Double.MaxValue)
      val prev = Array.fill(n)(-1)
      i = 0
      while (i < n1) { if (supply(i) > eps) dist(i) = 0.0; i += 1 }
      var changed = true
      var rounds = 0
      while (changed && rounds <= n) {
        changed = false
        i = 0
        while (i < n1) {
          if (dist(i) < Double.MaxValue) {
            var j = 0
            while (j < n2) {
              if (dist(i) + cost(i)(j) < dist(n1 + j) - eps) {
                dist(n1 + j) = dist(i) + cost(i)(j); prev(n1 + j) = i; changed = true
              }
              j += 1
            }
          }
          // residual backward arcs sink j -> source i where flow > 0
          var j = 0
          while (j < n2) {
            if (flow(i)(j) > eps && dist(n1 + j) < Double.MaxValue &&
                dist(n1 + j) - cost(i)(j) < dist(i) - eps) {
              dist(i) = dist(n1 + j) - cost(i)(j); prev(i) = n1 + j; changed = true
            }
            j += 1
          }
          i += 1
        }
        rounds += 1
      }
      // cheapest reachable sink with remaining demand
      var best = -1
      var j = 0
      while (j < n2) {
        if (demand(j) > eps && dist(n1 + j) < Double.MaxValue &&
            (best < 0 || dist(n1 + j) < dist(n1 + best))) best = j
        j += 1
      }
      if (best < 0) // disconnected (cannot happen: complete bipartite)
        throw new IllegalStateException(
          s"graft_emd_w: no augmenting path with ${totalFlow - moved} mass unmoved")
      // walk the path back, find bottleneck
      var amt = math.min(totalFlow - moved, demand(best))
      var node = n1 + best
      while (prev(node) >= 0) {
        val p = prev(node)
        if (node >= n1) { // p -> node is a forward arc from source p
          if (prev(p) < 0) amt = math.min(amt, supply(p))
        } else { // p(=sink) -> node(=source) is a residual arc: capacity = flow(node)(p-n1)
          amt = math.min(amt, flow(node)(p - n1))
        }
        node = p
      }
      // apply augmentation
      node = n1 + best
      while (prev(node) >= 0) {
        val p = prev(node)
        if (node >= n1) flow(p)(node - n1) += amt
        else flow(node)(p - n1) -= amt
        node = p
      }
      supply(node) -= amt
      demand(best) -= amt
      moved += amt
      totalCost = 0.0
      i = 0
      while (i < n1) {
        var jj = 0
        while (jj < n2) { totalCost += flow(i)(jj) * cost(i)(jj); jj += 1 }
        i += 1
      }
    }
    // the augmentation guard above is a termination backstop, not an
    // accepted exit: normalizing totalCost by totalFlow with mass
    // still unmoved would SILENTLY underestimate the distance on the
    // ranking path — fail loudly instead (each augmentation saturates
    // a supply or demand, so the bound is unreachable for n<=16
    // unless the solver itself is broken)
    require(totalFlow - moved <= 1e-9 * math.max(1.0, totalFlow),
      s"graft_emd_w: augmentation guard tripped with ${totalFlow - moved} of $totalFlow mass unmoved")
    (flow, cost, totalFlow, totalCost)
  }

  /** Feasible LP duals for the solved transportation problem,
    * recovered from the FINAL residual network: model the unequal-mass
    * case as an all-equality b-flow by adding a zero-cost dummy node
    * on the heavier side (dummy SINK absorbing unused supply when
    * Σs > Σd, dummy SOURCE feeding unmet demand when Σd > Σs), then
    * Bellman-Ford feasible potentials y from a virtual source
    * 0-connected to every node — optimality of the flow means the
    * residual graph has no negative cycle, so y converges and
    * satisfies y(w) <= y(v) + c(v,w) on every residual arc. Setting
    * p(i) = y(i) - y(t), q(j) = y(n1+j) - y(t) then gives dual
    * feasibility on the full grid (forward arcs are never saturated:
    * capacities are infinite), complementary slackness on flow arcs
    * (their backward residuals force equality), and the heavier
    * side's sign constraint (the dummy's zero-cost arcs). CS +
    * feasibility imply strong duality — which the certificate's
    * consumer re-checks arithmetically rather than trusting this
    * derivation. */
  private def duals(cost: Array[Array[Double]], flow: Array[Array[Double]],
                    s: Array[Double], d: Array[Double])
      : (Array[Double], Array[Double]) = {
    val n1 = s.length
    val n2 = d.length
    val eps = 1e-12
    val sTot = s.sum
    val dTot = d.sum
    val hasDummy = math.abs(sTot - dTot) > eps
    val dummySink = sTot > dTot // unused supply drains to the dummy
    val t = n1 + n2
    val y = new Array[Double](n1 + n2 + 1) // y(t) stays 0 when unused
    val rowSlack = Array.tabulate(n1)(i => s(i) - flow(i).sum)
    val colSlack = Array.tabulate(n2) { j =>
      var acc = d(j); var i = 0
      while (i < n1) { acc -= flow(i)(j); i += 1 }
      acc
    }
    var changed = true
    var rounds = 0
    while (changed && rounds <= n1 + n2 + 1) {
      changed = false
      var i = 0
      while (i < n1) {
        var j = 0
        while (j < n2) {
          if (y(i) + cost(i)(j) < y(n1 + j) - eps) { // forward arc, cap ∞
            y(n1 + j) = y(i) + cost(i)(j); changed = true
          }
          if (flow(i)(j) > eps && y(n1 + j) - cost(i)(j) < y(i) - eps) {
            y(i) = y(n1 + j) - cost(i)(j); changed = true // backward arc
          }
          j += 1
        }
        i += 1
      }
      if (hasDummy && dummySink) {
        var i2 = 0
        while (i2 < n1) {
          if (y(i2) < y(t) - eps) { y(t) = y(i2); changed = true }
          if (rowSlack(i2) > eps && y(t) < y(i2) - eps) { y(i2) = y(t); changed = true }
          i2 += 1
        }
      } else if (hasDummy) {
        var j2 = 0
        while (j2 < n2) {
          if (y(t) < y(n1 + j2) - eps) { y(n1 + j2) = y(t); changed = true }
          if (colSlack(j2) > eps && y(n1 + j2) < y(t) - eps) { y(t) = y(n1 + j2); changed = true }
          j2 += 1
        }
      }
      rounds += 1
    }
    (Array.tabulate(n1)(i => y(i) - y(t)),
      Array.tabulate(n2)(j => y(n1 + j) - y(t)))
  }
}

/** emd(a, b) over array<array<float|double>> region sets. */
case class EmdDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_emd"

  private def innerFloat(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ArrayType(FloatType, _), _) | ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<array<float|double>> columns, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EmdKernel.emd(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      innerFloat(left.dataType), innerFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EmdKernel.emd($a, $b, ${innerFloat(left.dataType)}, ${innerFloat(right.dataType)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** emd((vecs_a, weights_a), (vecs_b, weights_b)) with general
  * positive weights and unequal cardinalities — the full emd.c
  * contract. Children: array<array<float|double>> vec sets,
  * array<float|double> weight lists. */
case class EmdWeightedDistance(first: Expression, second: Expression,
                               third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_emd_w"

  private def innerFloat(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case _ => false
  }
  private def weightFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecs(dt: DataType) = dt match {
      case ArrayType(ArrayType(FloatType, _), _) | ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    def ws(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vecs(first.dataType) && ws(second.dataType) &&
        vecs(third.dataType) && ws(fourth.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<array<num>>, array<num>) pairs, got " +
          s"${children.map(_.dataType.sql).mkString(", ")}")
  }

  override protected def nullSafeEval(a: Any, aw: Any, b: Any, bw: Any): Any =
    EmdWeightedKernel.emd(a.asInstanceOf[ArrayData], aw.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], bw.asInstanceOf[ArrayData],
      innerFloat(first.dataType), innerFloat(third.dataType),
      weightFloat(second.dataType), weightFloat(fourth.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, aw, b, bw) =>
      s"graft.functions.EmdWeightedKernel.emd($a, $aw, $b, $bw, " +
        s"${innerFloat(first.dataType)}, ${innerFloat(third.dataType)}, " +
        s"${weightFloat(second.dataType)}, ${weightFloat(fourth.dataType)})")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Column constructors for the native expressions. */
object NativeVector {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def emd(a: Column, b: Column): Column =
    ColumnBridge.column(EmdDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def emdWeighted(a: Column, aw: Column, b: Column, bw: Column): Column =
    ColumnBridge.column(EmdWeightedDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(aw),
      ColumnBridge.expression(b), ColumnBridge.expression(bw)))
  def lshBuckets(v: Column, seed: Long, nTables: Int, bits: Int, dim: Int): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(v), seed, nTables, bits, dim))
  def lshProbeBuckets(v: Column, seed: Long, nTables: Int, bits: Int, dim: Int,
                      nProbes: Int): Column =
    ColumnBridge.column(LshProbeBuckets(ColumnBridge.expression(v), seed, nTables, bits, dim, nProbes))
  def srmVecset(bytes: Column): Column =
    ColumnBridge.column(SrmVecset(ColumnBridge.expression(bytes)))
  def e2lshBuckets(v: Column, seed: Long, nTables: Int, m: Int, w: Double,
                   h: Int, dim: Int): Column =
    ColumnBridge.column(E2lshBuckets(ColumnBridge.expression(v), seed, nTables, m, w, h, dim))
}
