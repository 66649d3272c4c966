package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.BinaryFiles

class ApiSpec extends SparkSpec {

  test("SQL surface: graft_* functions callable after register()") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).limit(20).createOrReplaceTempView("emb_sql")
    val rows = spark.sql("""
      SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c,
             graft_dot(a.embedding, b.embedding) AS d
      FROM emb_sql a JOIN emb_sql b ON a.vec_id < b.vec_id
    """).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("c")) <= 1.000001))
    val sh = spark.sql(
      "SELECT graft_simhash(array(cast(1 as bigint), cast(2 as bigint))) AS s").collect()
    assert(sh.length == 1)
    val mh = spark.sql(
      "SELECT graft_minhash_sig(array(cast(7 as bigint)), 16) AS sig").collect()
    assert(mh.head.getSeq[Long](0).length == 16)
    val jc = spark.sql(
      """SELECT graft_jaccard(array(cast(1 as bigint), cast(2 as bigint)),
        |array(cast(2 as bigint), cast(3 as bigint))) AS j""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(jc - 1.0 / 3.0) < 1e-12)
    val ch = spark.sql(
      "SELECT graft_chunk(repeat('spark native chunking ', 40))").collect()
    assert(ch.nonEmpty && ch.head.schema.fieldNames.contains("chunk_sha"))
    val emd = spark.sql(
      """SELECT graft_emd(array(array(0.0d, 0.0d), array(1.0d, 1.0d)),
        |array(array(1.0d, 1.0d), array(0.0d, 0.0d))) AS e""".stripMargin)
      .collect().head.getDouble(0)
    assert(emd == 0.0) // same set, permuted → matching finds identity
    val cl = spark.sql(
      "SELECT graft_compressed_len(cast(repeat('aa', 100) AS BINARY), 'deflate') AS n")
      .collect().head.getInt(0)
    assert(cl > 0 && cl < 200)
  }

  test("readDirDirect matches the binaryFile source row-for-row and honors the glob") {
    import org.apache.spark.sql.functions.{col, sha2}
    val tmp = java.nio.file.Files.createTempDirectory("graft_direct").toFile
    try {
      val rng = new scala.util.Random(7L)
      for (i <- 0 until 5) {
        val bytes = new Array[Byte](1000 + i * 333)
        rng.nextBytes(bytes)
        java.nio.file.Files.write(tmp.toPath.resolve(f"d$i%02d.bin"), bytes)
      }
      java.nio.file.Files.write(tmp.toPath.resolve("skip.txt"), Array[Byte](1, 2))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(col("file"), sha2(col("content"), 256).as("sha"),
            org.apache.spark.sql.functions.length(col("content")).as("n"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).sorted.toSeq
      val direct = canon(BinaryFiles.readDirDirect(spark, tmp.toString, "*.bin"))
      val hadoop = canon(BinaryFiles.readDir(spark, tmp.toString, "*.bin")
        .select(org.apache.spark.sql.functions
          .regexp_extract(col("path"), "([^/]+)$", 1).as("file"), col("content")))
      assert(direct == hadoop)
      assert(direct.map(_._1) == (0 until 5).map(i => f"d$i%02d.bin"))
      // a glob matching nothing fails fast with the pattern named,
      // not as a NULL-aggregate crash in the consumer
      val e = intercept[IllegalArgumentException] {
        BinaryFiles.readDirDirect(spark, tmp.toString, "'*.bin'")
      }
      assert(e.getMessage.contains("'*.bin'"), e.getMessage)
    } finally {
      graft.streaming.StreamingPipelines.deleteRecursively(tmp)
    }
  }

  test("chunkDirDirect equals per-file chunk+digest (reused buffer, mixed sizes)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fused").toFile
    try {
      val rng = new scala.util.Random(41L)
      // sorted listing order goes big → small → big, so a task's
      // reused buffer carries a stale tail into the smaller files —
      // the exact corruption mode the fused scan must not have
      val sizes = Seq("a.bin" -> 9000, "b.bin" -> 700, "c.bin" -> 64, "d.bin" -> 5000)
      val payloads = sizes.map { case (name, n) =>
        val bytes = new Array[Byte](n)
        rng.nextBytes(bytes)
        java.nio.file.Files.write(tmp.toPath.resolve(name), bytes)
        name -> bytes
      }
      val got = BinaryFiles
        .chunkDirDirect(spark, tmp.toString, "*.bin", 64, 512, 6, "buzhash")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getAs[Array[Byte]](4).map("%02x".format(_)).mkString))
        .sortBy(t => (t._1, t._2)).toSeq
      val want = payloads.flatMap { case (name, bytes) =>
        val cuts = graft.functions.Chunker.boundaries(bytes, 64, 512, 6, "buzhash")
        var start = 0
        cuts.zipWithIndex.map { case (end, idx) =>
          val sha = graft.functions.Chunker.digest(bytes, start, end - start, "SHA-1")
          val row = (name, idx, start, end - start,
            sha.map("%02x".format(_)).mkString)
          start = end
          row
        }
      }.sortBy(t => (t._1, t._2))
      assert(got == want)
      // rows tile each file exactly (offset/length bookkeeping across
      // the shared-buffer while loop)
      payloads.foreach { case (name, bytes) =>
        assert(got.filter(_._1 == name).map(_._4).sum == bytes.length)
      }
    } finally {
      graft.streaming.StreamingPipelines.deleteRecursively(tmp)
    }
  }

  test("binaryFile source: file_dedup accounts every test file") {
    val res = BinaryFiles.fileDedup(spark, sfDir).collect()
    assert(res.length == 10) // one row per table file
    res.foreach { r =>
      assert(r.getAs[Long]("n_chunks") >= r.getAs[Long]("n_unique_chunks"))
      assert(r.getAs[Long]("n_chunks") > 0)
    }
  }

  test("file_dedup chunks ONCE (single graft_chunk Generate in the plan)") {
    // r7 forked the chunk table into a refCounts groupBy + join-back,
    // so every file was Buzhash-chunked + SHA-256'd twice — 2× the
    // dominant map stage at any scale. The window formulation must
    // keep exactly one chunk Generator in the physical plan.
    val plan = BinaryFiles.fileDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("graft_chunk\\(".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  test("file_chunks chunk_hex_sha ≡ declarative sha2(hex(substr(content))) twin (differential)") {
    import org.apache.spark.sql.functions._
    // the generator computes the cross-engine digest inside the chunk
    // pass; this recomputes it declaratively by re-slicing the file
    // bytes at the emitted offsets — the slice-carrying formulation
    // fileChunks deliberately avoids at scale
    val got = BinaryFiles.fileChunks(spark, sfDir)
      .select("file", "chunk_idx", "offset", "chunk_len", "chunk_hex_sha")
    val files = BinaryFiles.readDir(spark, sfDir, "*.parquet")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file"), col("content"))
    val twin = got.select("file", "chunk_idx", "offset", "chunk_len")
      .join(files, "file")
      .select(col("file"), col("chunk_idx"), col("offset"), col("chunk_len"),
        sha2(hex(col("content").substr(col("offset") + 1, col("chunk_len"))), 256)
          .as("chunk_hex_sha"))
    assert(got.count() > 0)
    assert(got.exceptAll(twin).isEmpty && twin.exceptAll(got).isEmpty)
  }

  test("file_dedup window formulation ≡ the groupBy+join-back fork (differential)") {
    import org.apache.spark.sql.functions._
    val chunks = BinaryFiles.fileChunks(spark, sfDir)
    val refCounts = chunks.groupBy("chunk_sha").agg(count(lit(1)).as("refs"))
    val forked = chunks.join(refCounts, "chunk_sha")
      .groupBy("file")
      .agg(first(col("n_bytes")).as("n_bytes"),
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chunk_sha")).as("n_unique_chunks"),
        sum(when(col("refs") > 1, 1).otherwise(0)).as("n_shared_chunks"))
    val got = BinaryFiles.fileDedup(spark, sfDir)
    assert(got.exceptAll(forked).isEmpty && forked.exceptAll(got).isEmpty)
  }

  test("ferret_pipeline: top-k per query over the 10% query batch") {
    val res = Similarity.ferretPipeline(spark, sfDir).cache()
    val nq = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 === 0).count()
    val perQuery = res.groupBy("query_id").count()
    assert(perQuery.count() > 0 && perQuery.count() <= nq)
    assert(perQuery.filter(col("count") > Similarity.TopK).count() == 0)
    res.unpersist()
  }
}
