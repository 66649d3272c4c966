package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Head-to-head harness against the reference's ferret similarity
  * pipeline (apps/ferret — PARSEC ferret under the BenSP harness,
  * benchmark/ferret-pthreads.c): LOAD → SEG → EXTRACT → VEC (LSH
  * probe) → RANK (EMD re-rank) → OUT over a directory of query JPEGs
  * against a pre-built image database.
  *
  * Two subcommands:
  *
  * `corpus <outBase> <nDb> <nQuery>` — writes a deterministic JPEG
  * image corpus: `db/` (the database images the binary imports via
  * its own cass_img_extract + an LSH index build, and graft segments
  * once, untimed) and `queries/` (the timed query set; query i is
  * db image i byte-for-byte, so a correct engine ranks its twin
  * first — a free cross-engine sanity anchor). Band-structured
  * images (2-7 vertical bands + per-block noise) in the reference
  * corpus's size class, so SRM segmentation has real work per image.
  *
  * `run <dbDir> <queryDir> <topK> <passes> [outDir]` — the graft
  * side, measured EXACTLY like the binary measures itself
  * (ferret-pthreads.c:978 "QUERY TIME" — stimer ticks AFTER the
  * database tables are loaded): the database build (decode + SRM
  * segment + extract + LSH bucket table, the analog of the binary's
  * offline mkdb import which is not part of its query_time either)
  * is materialized untimed; each timed pass then runs the full
  * query-side pipeline — read query files, decode, segment, extract
  * (t_seg/t_extract = Srm.segmentAndDescribe, srm.c:251 +
  * extract.c:261), per-region LSH bucket probe (t_vec,
  * LSH_query.c), per-(query,candidate) collision-count merge
  * (cass_result_merge_lists, ferret-pthreads.c:646), exact
  * weighted-EMD re-rank of the 2K over-fetch (t_rank, emd.c:104)
  * — and reports per-pass wall seconds. Pass 1 is cold (codegen +
  * classloading); the median of the warm passes is the headline,
  * mirroring REFBENCH.md's dedup protocol.
  *
  * The last pass also writes `topk/` (query_img, cand_img, emd,
  * rank) so the binary's output.txt can be compared for top-K
  * overlap, not just throughput.
  */
object RefFerret {
  private val Dim = graft.functions.Srm.Dim
  private val LshTables = 12 // mirror the binary's index: mkdb -L 12
  // 14 sign bits/table = 16384 buckets (measured up from 4→10→14:
  // at 4 bits the z-scored SRM descriptors pile into 16 buckets and
  // hit-count ties drown exact twins out of the over-fetch; at 10
  // the probe join still carried 21 M rows; 14 + the hot-bucket cap
  // brings it under 2 M with twin recall 1000/1000 — the recall
  // role the binary's finer E2LSH (M=17, H=19697) + multiprobe
  // plays on its side)
  private val LshBits = 14
  private val BucketSeed = 7L
  private val MaxBucket = 64
  private val JunkBucket = 512

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("corpus") =>
      val outBase = if (args.length > 1) args(1) else "/tmp/refbench/ferret"
      val nDb = if (args.length > 2) args(2).toInt else 2000
      val nQuery = if (args.length > 3) args(3).toInt else 200
      corpus(outBase, nDb, nQuery)
    case Some("run") =>
      val dbDir = if (args.length > 1) args(1) else "/tmp/refbench/ferret/db"
      val queryDir = if (args.length > 2) args(2) else "/tmp/refbench/ferret/queries"
      val topK = if (args.length > 3) args(3).toInt else 50
      val passes = if (args.length > 4) args(4).toInt else 5
      val outDir = if (args.length > 5) args(5) else "/tmp/refbench/ferret/graft_out"
      run(dbDir, queryDir, topK, passes, outDir)
    case Some("truth") =>
      val dbDir = if (args.length > 1) args(1) else "/tmp/refbench/ferret/db"
      val queryDir = if (args.length > 2) args(2) else "/tmp/refbench/ferret/queries"
      val stride = if (args.length > 3) args(3).toInt else 10
      val topK = if (args.length > 4) args(4).toInt else 10
      val outDir = if (args.length > 5) args(5) else "/tmp/refbench/ferret/truth"
      val corelTxt = if (args.length > 6) Some(args(6)) else None
      truth(dbDir, queryDir, stride, topK, outDir, corelTxt)
    case _ =>
      System.err.println("usage: RefFerret corpus <outBase> [nDb] [nQuery] | " +
        "run <dbDir> <queryDir> [topK] [passes] [outDir] | " +
        "truth <dbDir> <queryDir> [stride] [topK] [outDir] [corelTxt]")
      sys.exit(2)
  }

  /** Deterministic band image, scaled to the reference corpus's size
    * class (width 160-216, height 112-152 — corel images are
    * 96×64..384×256). Same recipe as the oracled mm_segment
    * synthesis (Multimodal.synthesizeSegJpeg), just bigger and
    * keyed on the image id alone so the corpus needs no tables. */
  private[graft] def synthImage(id: Long): Array[Byte] = {
    val width = (8 * (20 + id % 8)).toInt
    val height = (8 * (14 + id % 6)).toInt
    val nBands = (2 + id % 6).toInt
    val wb = width / 8
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"ferret:$id".getBytes("UTF-8"))
    val rgb = new Array[Byte](width * height * 3)
    var i = 0
    while (i < rgb.length) {
      val k = i / 3
      val c = i % 3
      val bx = (k % width) / 8
      val by = (k / width) / 8
      val band = bx * nBands / wb
      val base = digest((3 * band + c) % 32) & 0xff
      val noise = (bx * 7 + by * 13) % 5 - 2
      rgb(i) = math.max(0, math.min(255, base + noise)).toByte
      i += 1
    }
    graft.functions.JpegCodec.encodeJpeg(
      graft.functions.ImageCodec.Image(width, height, rgb), quality = 100)
  }

  private def corpus(outBase: String, nDb: Int, nQuery: Int): Unit = {
    val spark = Sessions.contractLocal("graft-refferret-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dbDir = new java.io.File(outBase, "db")
    val qDir = new java.io.File(outBase, "queries")
    dbDir.mkdirs(); qDir.mkdirs()
    val dbPath = dbDir.getAbsolutePath
    val qPath = qDir.getAbsolutePath
    spark.range(nDb).as[Long].foreachPartition { (it: Iterator[Long]) =>
      it.foreach { id =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dbPath, f"img_$id%06d.jpg"), synthImage(id))
      }
    }
    spark.range(nQuery).as[Long].foreachPartition { (it: Iterator[Long]) =>
      it.foreach { id =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(qPath, f"img_$id%06d.jpg"), synthImage(id))
      }
    }
    val dbBytes = Option(dbDir.listFiles).getOrElse(Array.empty).map(_.length).sum
    println(s"""{"corpus":"$outBase","n_db":$nDb,"n_query":$nQuery,"db_bytes":$dbBytes}""")
    spark.stop()
  }

  /** Decode + segment + extract a directory of JPEGs — t_seg +
    * t_extract (and the analog of cass_img_extract for the database
    * side). ONE row per image carrying the weighted vecset in region
    * scan order (capped at 16 regions, the EMD kernel bound; band
    * images produce 1-8) — the per-image grouping happens INSIDE the
    * segmentation task, so neither side ever shuffles to build its
    * vecsets and the timed pass needs no aggregation job before the
    * probe. */
  private def imagesOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.BinaryFiles.readDirDirect(s, dir, "*.jpg")
      .as[(String, Array[Byte])] // readDirDirect already slices across cores
      .mapPartitions { it =>
        it.map { case (file, bytes) =>
          val img = graft.functions.JpegCodec.decodeJpeg(bytes)
          val rs = graft.functions.Srm.segmentAndDescribe(img).take(16)
          (file, rs.map(_.descriptor.toSeq).toSeq, rs.map(_.weight).toSeq)
        }
      }
      .toDF("img", "vset", "wset")
  }

  /** The exploded per-region view of [[imagesOf]] (narrow — no
    * recompute of the decode/SRM pass when the source is
    * checkpointed). */
  private def regionsOf(images: DataFrame): DataFrame =
    images.select(col("img"), posexplode(col("vset")))
      .toDF("img", "ridx", "v")

  /** Per-dimension z-score parameters learned from the database
    * regions at index-build time (the analog of the binary's tuned
    * E2LSH -w quantization width). extract.c's static dimension
    * weights span 1000× (6.0 → 0.007), so raw sign-projections are
    * dominated by two or three dimensions and every image lands in a
    * handful of buckets — standardizing first makes each hyperplane
    * bit carry real information. */
  private def zStats(dbRegions: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = dbRegions.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg("x").as("mu"),
        coalesce(stddev_pop(col("x")), lit(0.0)).as("sd"))
      .collect() // 14 rows — the per-dim moment table, never data-sized
    val mu = new Array[Double](Dim)
    val sd = new Array[Double](Dim)
    rows.foreach { r =>
      mu(r.getInt(0)) = r.getDouble(1)
      sd(r.getInt(0)) = math.max(r.getDouble(2), 1e-12)
    }
    (mu.toSeq, sd.toSeq)
  }

  private def withBuckets(df: DataFrame, mu: Seq[Double], sd: Seq[Double]): DataFrame = {
    val muA = array(mu.map(lit): _*)
    val sdA = array(sd.map(lit): _*)
    val z = zip_with(col("v"), sequence(lit(0), lit(Dim - 1)),
      (x, i) => (x - element_at(muA, i + 1)) / element_at(sdA, i + 1))
    df.select(col("img"), posexplode(graft.functions.NativeVector.lshBuckets(
        z, BucketSeed, LshTables, LshBits, Dim)))
      .toDF("img", "tbl", "bucket")
  }

  /** GROUND-TRUTH cell (r13 verdict item): the exact-EMD top-K over
    * the FULL database for a deterministic query subsample (every
    * `stride`-th query id) — no LSH, no over-fetch, every candidate
    * solved. This is the brute-force path both engines' t_rank
    * (emd.c:104 exact simplex / graft's certificate-checked kernel)
    * already shares semantics with; against it, each engine's
    * RETURNED top-K gets a recall number instead of the
    * engine-vs-engine overlap that left "who is closer to the
    * truth?" unadjudicated (REFBENCH r12).
    *
    * Feature source: by default graft's own decode→SRM→extract
    * vecsets; with `corelTxt` the binary's OWN extraction dump
    * (cass_img_extract output: per image a `name\tn` header then n
    * lines of `weight\t14-dim descriptor`, cass_img_extract.c:78-87)
    * — query i is db image i byte-for-byte, so the twin's db entry
    * IS the binary's query-side vecset. Two truths, two engines →
    * the 2×2 recall matrix localizes any gap to index family vs
    * feature extraction. */
  private def truth(dbDir: String, queryDir: String, stride: Int, topK: Int,
                    outDir: String, corelTxt: Option[String]): Unit = {
    val spark = Sessions.contractLocal("graft-refferret-truth")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nQ = graft.sources.BinaryFiles.readDirDirect(spark, queryDir, "*.jpg").count()
    val qid = regexp_extract(col("img"), "img_(\\d+)", 1).cast("long")
    val t0 = System.nanoTime()
    val (dbV, qV) = corelTxt match {
      case Some(path) =>
        // the binary's own features: bounded 10k-image parse (one row
        // per image), never data-scaled — harness-side by design
        val entries = parseCorel(path)
        val db = entries.toDF("img", "vset", "wset").localCheckpoint(true)
        (db, db.filter(qid < nQ && qid % stride === 0))
      case None =>
        val db = imagesOf(spark, dbDir).localCheckpoint(true)
        (db, imagesOf(spark, queryDir).filter(qid % stride === 0))
    }
    val q = qV.select(col("img").as("query_img"),
      col("vset").as("qset"), col("wset").as("qw"))
    val d = dbV.select(col("img").as("cand_img"),
      col("vset").as("cset"), col("wset").as("cw"))
    // brute force IS the point: db × subsample, every pair solved
    // exactly (10k × nQ/stride EMD solves; the db side carries the
    // parallelism, the query side broadcasts)
    val ranked = d.crossJoin(broadcast(q))
      .select(col("query_img"), col("cand_img"),
        graft.functions.NativeVector.emdWeighted(
          col("qset"), col("qw"), col("cset"), col("cw")).as("emd"))
      .groupBy("query_img")
      .agg(slice(array_sort(collect_list(
          struct(col("emd"), col("cand_img")))), 1, topK).as("top"))
      .select(col("query_img"), posexplode(col("top")))
      .select(col("query_img"),
        col("col").getField("cand_img").as("cand_img"),
        col("col").getField("emd").as("emd"),
        (col("pos") + 1).as("rank"))
    ranked.repartition(1).write.mode("overwrite").parquet(outDir)
    val sec = (System.nanoTime() - t0) / 1e9
    val nSub = spark.read.parquet(outDir).select("query_img").distinct().count()
    println(s"""{"harness":"refferret-truth","features":"${if (corelTxt.isDefined) "binary" else "graft"}",""" +
      s""""n_queries":$nSub,"stride":$stride,"top_k":$topK,"db":"$dbDir",""" +
      s""""wall_sec":${f"$sec%.3f"},"out":"$outDir"}""")
    spark.stop()
  }

  /** Parse cass_img_extract's text dump: `name\tnRegions` headers,
    * then per region `weight` + 14 descriptor dims (the fprintf at
    * cass_img_extract.c:78-87). Names are basenamed to match the
    * RefFerret img keys. */
  private def parseCorel(path: String): Seq[(String, Seq[Seq[Double]], Seq[Double])] = {
    val src = scala.io.Source.fromFile(path)
    try {
      val it = src.getLines()
      val buf = scala.collection.mutable.ArrayBuffer[(String, Seq[Seq[Double]], Seq[Double])]()
      while (it.hasNext) {
        val h = it.next().split("\t")
        require(h.length == 2, s"corel header expected 'name\\tn', got: ${h.mkString("|")}")
        val name = h(0).split("/").last
        val rows = (1 to h(1).trim.toInt).map { _ =>
          it.next().trim.split("\\s+").map(_.toDouble)
        }
        rows.foreach(r => require(r.length == Dim + 1,
          s"corel region row for $name: expected weight+$Dim dims, got ${r.length}"))
        buf += ((name, rows.map(_.drop(1).toSeq), rows.map(_.head)))
      }
      buf.toSeq
    } finally src.close()
  }

  private def run(dbDir: String, queryDir: String, topK: Int,
                  passes: Int, outDir: String): Unit = {
    val spark = Sessions.contractLocal("graft-refferret")
    spark.sparkContext.setLogLevel("ERROR")
    val nQ = graft.sources.BinaryFiles.readDirDirect(spark, queryDir, "*.jpg").count()

    // ---- untimed database build (the binary's mkdb + table load) ----
    val t0 = System.nanoTime()
    val dbImages = imagesOf(spark, dbDir).localCheckpoint(true)
    val dbRegions = regionsOf(dbImages)
    val dbVecsets = dbImages.select(col("img").as("cand_img"),
      col("vset").as("cset"), col("wset").as("cw")).localCheckpoint(true)
    val (mu, sd) = zStats(dbRegions)
    // hot-bucket shaping (index build time): buckets past JunkBucket
    // rows are degenerate speck-region pileups carrying no ranking
    // signal — drop them outright (the E2LSH overflow rule); buckets
    // between MaxBucket and JunkBucket keep a deterministic
    // first-MaxBucket slice (Dedup.capBuckets semantics), so a query
    // whose regions only land in medium-hot buckets never goes
    // candidate-dark
    val rawDb = withBuckets(dbRegions, mu, sd).toDF("cand_img", "tbl", "bucket")
    val wBucket = Window.partitionBy("tbl", "bucket").orderBy(col("cand_img"))
    val dbBuckets = rawDb
      .withColumn("rn", row_number().over(wBucket))
      .withColumn("bn", count(lit(1)).over(
        Window.partitionBy("tbl", "bucket")))
      .filter(col("rn") <= MaxBucket && col("bn") <= JunkBucket)
      .drop("rn", "bn")
      .localCheckpoint(true)
    val dbBuildSec = (System.nanoTime() - t0) / 1e9
    // the db-side checkpoints are the index — they must survive every
    // pass (unpersisting a localCheckpoint is unrecoverable: lineage
    // is truncated). Everything persisted AFTER this point is
    // per-pass residue and safe to free between passes.
    val dbBlockIds = spark.sparkContext.getPersistentRDDs.keySet.toSet

    // ---- timed passes: the binary's query_time window ----
    def pass(writeOut: Option[String]): Double = {
      val t = System.nanoTime()
      val qImages = imagesOf(spark, queryDir)
        .localCheckpoint(true) // segment once; feeds buckets AND vecsets
      val tSeg = (System.nanoTime() - t) / 1e9
      val qVecsets = qImages.select(col("img").as("query_img"),
        col("vset").as("qset"), col("wset").as("qw"))
      val qBuckets = withBuckets(regionsOf(qImages), mu, sd)
        .toDF("query_img", "tbl", "bucket")
      // per-region probes merged per (query, candidate) by collision
      // count — cass_result_merge_lists; 2K over-fetch — t_vec's
      // query.topk = 2*top_K (ferret-pthreads.c:590). ONE exchange for
      // the whole probe+rank tail: hash-partition the collision rows
      // by query_img once — the (query,cand) count, the per-query
      // top-2K slice, the broadcast vecset attach, the EMD kernel and
      // the final top-K all cluster on query_img subsets, so Catalyst
      // reuses the same partitioning end to end (zero further
      // shuffles; verified via .explain: a single Exchange node)
      val joined = dbBuckets.join(broadcast(qBuckets), Seq("tbl", "bucket"))
        .repartition(col("query_img"))
      val cand = joined
        .groupBy("query_img", "cand_img").agg(count(lit(1)).as("hits"))
      if (sys.env.contains("GRAFT_FERRET_DEBUG")) {
        System.err.println(s"[refferret]   DEBUG joined=${joined.count()} pairs=${cand.count()}")
      }
      // over-fetch: 2K per query by default; GRAFT_FERRET_OVERFETCH=regions
      // scales it by the query's region count — the binary's actual
      // semantics (t_vec fetches 2K per REGION and merges,
      // ferret-pthreads.c:590+646), costing proportionally more EMD
      // solves. The speed cells use the per-query default; the quality
      // cell measures both engines at matched candidate-pool depth.
      val perRegions = sys.env.get("GRAFT_FERRET_OVERFETCH").contains("regions")
      val qNr = qImages.select(col("img").as("query_img"),
        size(col("vset")).as("nr"))
      val over = {
        val top = cand
          .groupBy("query_img")
          .agg(array_sort(collect_list(
              struct((-col("hits")).as("nh"), col("cand_img")))).as("top"))
        val sliced =
          if (perRegions) top.join(broadcast(qNr), "query_img")
            .select(col("query_img"),
              slice(col("top"), lit(1), lit(2 * topK) * col("nr")).as("top"))
          else top.select(col("query_img"),
            slice(col("top"), 1, 2 * topK).as("top"))
        sliced.select(col("query_img"),
          explode(transform(col("top"), x => x.getField("cand_img"))).as("cand_img"))
      }
      val ranked = over
        .join(broadcast(dbVecsets), "cand_img")
        .join(broadcast(qVecsets), "query_img")
        .select(col("query_img"), col("cand_img"),
          graft.functions.NativeVector.emdWeighted(
            col("qset"), col("qw"), col("cset"), col("cw")).as("emd"))
        .groupBy("query_img")
        .agg(slice(array_sort(collect_list(
            struct(col("emd"), col("cand_img")))), 1, topK).as("top"))
        .select(col("query_img"), posexplode(col("top")))
        .select(col("query_img"),
          col("col").getField("cand_img").as("cand_img"),
          col("col").getField("emd").as("emd"),
          (col("pos") + 1).as("rank"))
      writeOut match {
        case Some(p) => ranked.repartition(1) // exchange, not coalesce:
          // coalesce(1) would collapse the whole EMD stage into 1 task
          .write.mode("overwrite").parquet(p)
        case None => ranked.write.format("noop").mode("overwrite").save()
      }
      val tAll = (System.nanoTime() - t) / 1e9
      // tSeg is real (the checkpoint is eager); everything after it
      // executes as ONE fused job, so only the combined tail is honest
      System.err.println(
        f"[refferret]   seg+extract $tSeg%.2f s | probe+emd-rank ${tAll - tSeg}%.2f s")
      tAll
    }

    val measured = (1 to passes).map { i =>
      // free the previous pass's eager-checkpoint blocks OUTSIDE the
      // timed section (the Bench.freeBlocks discipline) — otherwise
      // qRegions checkpoints accumulate across passes and later warm
      // passes run against a pressured BlockManager. The db index
      // checkpoints are exempt (see dbBlockIds).
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => dbBlockIds.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      val (sec, env) = EnvTelemetry.measured(
        pass(if (i == passes) Some(s"$outDir/topk") else None))
      System.err.println(
        f"[refferret] pass $i: $sec%.3f s (load ${env.load}%.1f, other_cpu ${env.otherCpuSec}%.1f s, steal ${env.stealSec}%.1f s)")
      (sec, env)
    }
    val times = measured.map(_._1)
    val warm = times.drop(1).sorted
    val median = if (warm.isEmpty) times.head else warm(warm.length / 2)
    val envs = measured.map { case (_, e) =>
      s"""{"load":${f"${e.load}%.2f"},"our_cpu_sec":${f"${e.ourCpuSec}%.1f"},""" +
        s""""other_cpu_sec":${f"${e.otherCpuSec}%.1f"},"steal_sec":${f"${e.stealSec}%.1f"}}"""
    }
    println(s"""{"harness":"refferret","n_queries":$nQ,"top_k":$topK,""" +
      s""""db_build_sec":${f"$dbBuildSec%.3f"},"cold_sec":${f"${times.head}%.3f"},""" +
      s""""warm_secs":[${times.drop(1).map(t => f"$t%.3f").mkString(",")}],""" +
      s""""warm_median_sec":${f"$median%.3f"},""" +
      s""""images_per_sec":${f"${nQ / median}%.1f"},"env":[${envs.mkString(",")}]}""")
    spark.stop()
  }
}
