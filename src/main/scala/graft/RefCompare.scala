package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head throughput harness against the reference's OWN
  * prebuilt pipeline binary (apps/dedup/bin/dedup_pthreads — the
  * BenSP Dedup 5-stage: Fragment → FragmentRefine → Deduplicate →
  * Compress → Reorder, new_dedup.c): both engines process the SAME
  * input folder with the same pipeline shape, and REFBENCH.md records
  * the measured wall-clocks side by side.
  *
  * Pipeline here (scale-shaped — nothing corpus-sized ever funnels
  * through one task or one shuffle of raw bytes, and the corpus is
  * scanned in full exactly ONCE):
  *   1. read the folder with direct java.nio file reads
  *      (BinaryFiles.readDirDirect — one file per task), fused with:
  *   2. CDC-chunking (Buzhash skip-ahead kernel by default, the
  *      reference's Rabin fingerprint via the anchor arg; storage
  *      params min 2 KiB / mask 12 ≈ 4 KiB mean / max 64 KiB) and
  *      the refs-table write — stream-order restoration info (the
  *      Reorder stage's state) plus winner-selection metadata, one
  *      job, no intermediate materialization;
  *   3. global first-occurrence dedup on the 20-byte SHA-1 digests
  *      (a digest-only min-struct hash aggregation over the re-read
  *      columnar chunk table; the reference binary dedups per-FILE
  *      hashtable, new_dedup.c:996 — our global dedup does STRICTLY
  *      more work and still must win);
  *   4. deflate each winner from a RANGED read of its source file
  *      (a few % of the corpus — never a second full scan), winners
  *      locally sorted by (file, offset) so one channel at a time
  *      reads forward;
  *   5. write the pieces table (sha, deflated bytes) — refs + pieces
  *      are jointly the .ddp container's information content.
  *
  * Methodology: pass 1 COLD (includes codegen/classloading, reported
  * separately), then N warm passes with the MEDIAN reported (the
  * reference is AOT-compiled native code, so its measured passes are
  * all "warm"; its own "Time Processing" likewise excludes process
  * setup). Semantic deltas, all documented in REFBENCH.md: Buzhash
  * vs Rabin anchors by default (same mean granularity), zlib-deflate
  * vs gzip framing, global vs per-file dedup, parquet archive vs
  * .ddp container. Chunk identity is SHA-1 like the reference
  * (dedupdef.h); the restore PROOF hashes whole files with SHA-256.
  */
object RefCompare {
  private val MinSize = 2048
  private val MaxSize = 65536
  private val MaskBits = 12

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/tmp/refbench/corpus")
    val outDir = if (args.length > 1) args(1) else "/tmp/refbench/graft_out"
    val glob = if (args.length > 2) args(2) else "*.bin"
    // "global" (default: cross-file dedup — strictly MORE work than the
    // binary's per-file hashtable) or "file" (the binary's exact
    // semantics, new_dedup.c:996 cache_hash_files per file — the
    // equal-work comparison cell; no cross-file digest shuffle needed)
    val scope = if (args.length > 3) args(3) else "global"
    // fail fast: an unrecognized scope (e.g. "perfile") would silently
    // run the global cell while LABELING the artifact with the bogus name
    require(scope == "global" || scope == "file",
      s"scope '$scope' (expected global/file)")
    // optional anchor algorithm (args 5 = warm reps, args 6 = anchor):
    // "buzhash" (repo default) or "rabin" (the reference's own
    // fingerprint, rabin.c — cuts comparable with the binary's .ddp
    // segmentation)
    val anchor = if (args.length > 5) args(5) else "buzhash"
    // optional piece codec (args 7): "deflate" (default — the gzip
    // comparison cells) or "none" — the CODEC-ISOLATED cell pairing
    // the binary's own `-w none` mode, which measures the pure
    // chunk → dedup → reorder pipeline with compression cost removed
    // from BOTH engines
    val codec = if (args.length > 6) args(6) else "deflate"
    require(codec == "deflate" || codec == "none",
      s"codec '$codec' (expected deflate/none)")
    // harness-local tuning (documented deltas from the contract
    // session, which optimizes for the oracled analytic queries):
    // both jobs here have a fixed two-stage shape over known-tiny
    // shuffles, so AQE's per-stage materialize-and-replan barriers
    // are pure driver latency; and the v1 output committer renames
    // every task file serially on the driver at job commit — v2
    // commits on task completion (local FS, no speculative tasks).
    // Routed through Sessions so conf mutation never leaves it.
    val spark = Sessions.contractLocal("graft-refcompare", overrides = Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version" -> "2"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def onePass(tag: String): Map[String, Double] = {
      val out = s"$outDir/$tag"
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      var tPrev = t0
      def lap(stage: String): Unit = {
        val now = System.nanoTime()
        System.err.println(f"[$tag] $stage%-12s ${(now - tPrev) / 1e9}%8.3f s")
        tPrev = now
      }
      // ONE fused job: direct java.nio reads (the binaryFile source's
      // Hadoop local FS layers cost a measured 10× on page-cached
      // reads; the C binary reads with plain fread, so this is the
      // apples-to-apples reader) → CDC chunk → 20-byte binary SHA-1
      // identity (the reference Deduplicate stage's own keying,
      // dedupdef.h SHA1_LEN — half the digest cost of SHA-256 and
      // 3.2× narrower than hex rows; the restore proof below stays
      // SHA-256 over whole files) → the chunk table written straight
      // out as the archive's refs side — stream-order restoration
      // info (the Reorder stage's state) plus the winner-selection
      // metadata. The fused scan (BinaryFiles.chunkDirDirect) keeps
      // payload bytes OUT of Spark's row format: one reused buffer
      // per task, so the corpus is allocated ~0×, not 3× (readAllBytes
      // + UnsafeRow encode + decode), per pass. Pieces are
      // pre-deflated, so parquet recompression is pure waste inside
      // the timed window — both tables raw.
      graft.sources.BinaryFiles
        .chunkDirDirect(spark, inDir, glob, MinSize, MaxSize, MaskBits, anchor)
        .write.mode("overwrite").option("compression", "none").parquet(s"$out/refs")
      lap("chunk+refs")
      // winner selection reads the just-written (small, columnar)
      // chunk table back, never the corpus
      val chunkTbl = spark.read.parquet(s"$out/refs")
      // first-occurrence winner per digest: a hash aggregation with
      // map-side partial min (r9 used row_number over a global sort
      // window — a full sort shuffle for an argmin)
      val winRows =
        if (scope == "file")
          chunkTbl.groupBy("file", "chunk_sha")
            .agg(min(struct(col("chunk_idx"), col("offset"), col("length"))).as("w"))
            .select(col("file"), col("w.offset").as("offset"),
              col("w.length").as("length"), col("chunk_sha"))
        else
          chunkTbl.groupBy("chunk_sha")
            .agg(min(struct(col("file"), col("chunk_idx"), col("offset"),
              col("length"))).as("w"))
            .select(col("w.file").as("file"), col("w.offset").as("offset"),
              col("w.length").as("length"), col("chunk_sha"))
      // compress each unique chunk from a RANGE read of its file —
      // the winner set is a few % of the corpus, so re-scanning every
      // file's full content here (r9 did, via a join back to the
      // binaryFile read) pays 50× the IO this stage needs. A local
      // sort (no shuffle) orders each partition's winners by
      // (file, offset): one open file channel at a time, reads
      // sequential-forward; on an object store this is the
      // ranged-GET pattern.
      winRows
        .sortWithinPartitions("file", "offset")
        .select(col("file"), col("offset"), col("length"), col("chunk_sha"))
        .as[(String, Int, Int, Array[Byte])]
        .mapPartitions { it =>
          var curFile: String = null
          var ch: java.nio.channels.FileChannel = null
          def switchTo(f: String): Unit = {
            if (ch != null) ch.close()
            ch = java.nio.channels.FileChannel.open(
              java.nio.file.Paths.get(s"$inDir/$f"))
            curFile = f
          }
          val mapped = it.map { case (f, off, len, sha) =>
            if (f != curFile) switchTo(f)
            val buf = java.nio.ByteBuffer.allocate(len)
            var pos = off.toLong
            while (buf.hasRemaining) {
              val n = ch.read(buf, pos)
              if (n < 0) throw new java.io.EOFException(
                s"$f truncated at $pos (want $len @ $off)")
              pos += n
            }
            (sha, if (codec == "none") buf.array()
              else graft.functions.Chunker.deflate(buf.array(), 0, len))
          }
          new Iterator[(Array[Byte], Array[Byte])] {
            def hasNext: Boolean = {
              val h = mapped.hasNext
              if (!h && ch != null) { ch.close(); ch = null }
              h
            }
            def next(): (Array[Byte], Array[Byte]) = mapped.next()
          }
        }
        .toDF("chunk_sha", "piece")
        .write.mode("overwrite").option("compression", "none").parquet(s"$out/pieces")
      lap("pieces_write")
      val wall = (System.nanoTime() - t0) / 1e9
      // accounting AFTER the clock stops (the reference also reports
      // its stats after Time Processing)
      val refs = spark.read.parquet(s"$out/refs")
      val pieces = spark.read.parquet(s"$out/pieces")
      val nChunks = refs.count().toDouble
      val nUnique = pieces.count().toDouble
      val outBytes = pieces.agg(sum(length(col("piece")))).collect().head.getLong(0).toDouble
      // input size from the driver-side listing — re-scanning 682 MB
      // of payload through the Hadoop reader just to sum lengths cost
      // 2–5 s of (untimed) wall per pass and perturbed the next pass
      val inBytes = graft.sources.BinaryFiles.listDir(inDir, glob)
        .map(p => java.nio.file.Files.size(java.nio.file.Paths.get(p))).sum.toDouble
      // checkpoint-backed frames are invisible to CacheManager —
      // free the pass's blocks through the RDD registry (the
      // clustersFromPairs pattern)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!persistedBefore.contains(id)) rdd.unpersist(blocking = false)
      }
      Map("wall_sec" -> wall, "in_mb" -> inBytes / 1048576,
        "out_mb" -> outBytes / 1048576, "n_chunks" -> nChunks,
        "n_unique" -> nUnique,
        "dup_pct" -> 100.0 * (nChunks - nUnique) / math.max(1.0, nChunks),
        "mb_per_sec" -> inBytes / 1048576 / wall)
    }

    // every measured pass carries the same contention telemetry as the
    // bench artifact (EnvTelemetry): load at start, CPU-seconds other
    // processes burned during the pass, hypervisor steal — so a
    // pass-to-pass spread self-adjudicates as environmental or real
    def measuredPass(tag: String): Map[String, Double] = {
      val (m, env) = EnvTelemetry.measured(onePass(tag))
      System.err.println(f"[$tag] env: load=${env.load}%.1f our_cpu=${env.ourCpuSec}%.1f other_cpu=${env.otherCpuSec}%.1f steal=${env.stealSec}%.1f")
      m ++ Map("env_load" -> env.load, "env_other_cpu" -> env.otherCpuSec,
        "env_steal" -> env.stealSec)
    }
    val cold = measuredPass("cold")
    // several warm passes, report the median — single-pass warm
    // numbers on a shared box swing ±50% (r9's contention dispute);
    // every pass overwrites the same archive dir, so the restore
    // check below always verifies the last one
    val nWarm = if (args.length > 4) args(4).toInt else 3
    val warms = (1 to nWarm).map(_ => measuredPass("warm"))
    val warm = warms.sortBy(_("wall_sec")).apply(nWarm / 2)

    // Restore verification (outside the timed region): the archive is
    // REAL — refs + inflated pieces reassemble every input file
    // byte-exactly, proven by digest compare against a fresh read.
    // (The reference's -u mode is the analogous decompress direction.)
    val nBad = {
      import spark.implicits._
      val refs = spark.read.parquet(s"$outDir/warm/refs")
      // per-file scope stores one piece per (file, sha); a sha's
      // bytes are identical wherever it occurs, so restore joins one
      // representative piece per sha — without this, the sha-only
      // join fans every ref out to every file's copy (~80× row blowup
      // with KB-sized binaries attached)
      val pieces = spark.read.parquet(s"$outDir/warm/pieces")
        .dropDuplicates("chunk_sha")
      val restored = refs.join(pieces, "chunk_sha")
        .groupBy("file")
        .agg(sort_array(collect_list(struct(col("chunk_idx"), col("piece")))).as("ps"))
        .select(col("file"), col("ps.piece").as("ps"))
        .as[(String, Seq[Array[Byte]])]
        .map { case (f, ps) =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          ps.foreach(p => md.update(
            if (codec == "none") p else graft.functions.Chunker.inflate(p)))
          (f, md.digest().map("%02x".format(_)).mkString)
        }
        .toDF("file", "sha_restored")
      val orig = graft.sources.BinaryFiles.readDirDirect(spark, inDir, glob)
        .select(col("file"), sha2(col("content"), 256).as("sha_orig"))
      orig.join(restored, "file")
        .filter(col("sha_orig") =!= col("sha_restored")).count() +
        orig.join(restored, Seq("file"), "left_anti").count()
    }
    def j(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
        .mkString("{", ",", "}")
    println(s"""{"harness":"ref_compare","in_dir":"$inDir","scope":"$scope","anchor":"$anchor","codec":"$codec","cores":${spark.sparkContext.defaultParallelism},"restore_mismatches":$nBad,"cold":${j(cold)},"warm":${j(warm)}}""")
    spark.stop()
  }
}
